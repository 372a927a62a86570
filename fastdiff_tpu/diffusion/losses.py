"""Training losses for the epsilon-prediction diffusion vocoder.

Pure functions of (params, batch, rng) — no globals, no device placement
code. Semantics follow the reference's ``theta_timestep_loss``
(reference: modules/FastDiff/module/util.py:291-325): sample an integer
timestep per example, form x_t = alpha_t * x0 + sqrt(1-alpha_t^2) * z, and
regress the model's epsilon estimate onto z with MSE.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def theta_timestep_loss(denoise_fn: Callable, key: jax.Array,
                        mel: jnp.ndarray, audio: jnp.ndarray,
                        alpha: jnp.ndarray,
                        return_x0: bool = False):
    """Epsilon-MSE diffusion loss.

    Args:
      denoise_fn: ``(x_t, mel, t) -> eps_hat`` with t (B, 1) float.
      mel: (B, T', n_mels); audio: (B, T, 1); alpha: (T_diff,) training
        alpha table (sqrt cumulative).
    """
    b = audio.shape[0]
    t_total = alpha.shape[0]
    k_t, k_z = jax.random.split(key)
    ts = jax.random.randint(k_t, (b, 1, 1), 0, t_total)
    z = jax.random.normal(k_z, audio.shape, dtype=audio.dtype)
    alpha_t = alpha[ts]                                   # (B, 1, 1)
    delta = jnp.sqrt(1.0 - alpha_t ** 2)
    x_t = alpha_t * audio + delta * z
    eps = denoise_fn(x_t, mel, ts.reshape(b, 1).astype(jnp.float32))
    loss = jnp.mean((eps - z) ** 2)
    if return_x0:
        x0 = (x_t - delta * eps) / alpha_t
        return loss, x0
    return loss
