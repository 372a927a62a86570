"""BDDM noise predictor: learned noise-schedule search.

The reference ships the BDDM training/search *call sites* but no model —
``phi_loss`` and ``noise_scheduling`` invoke ``net.noise_pred``, which no
module in the tree defines (reference: modules/FastDiff/module/util.py:
284,356; SURVEY.md C3 marks them vestigial). Its derived N=8/6/4/3 schedules
were produced externally. This module supplies the missing piece as a
working TPU-native subsystem:

- ``NoisePredictor``: a small strided-conv network over x_t plus the scalar
  pair (beta_next, delta^2), emitting a ratio in (0, 1);
  ``beta_est = ratio * min(delta^2, beta_next)`` (BDDM parameterization,
  Lam et al. 2022).
- ``phi_loss``: the BDDM step-size ELBO the reference writes at
  util.py:328-362, as a pure function.
- ``search_noise_schedule``: the reverse search loop of util.py:237-288 —
  start from (alpha_N, beta_N), repeatedly denoise with the score net and
  query the predictor for the next beta, stop at ``rho`` or alpha > 1;
  returns the discovered schedule (ascending, ready for
  ``sampler_constants_for_schedule``).
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.diffusion.schedules import (DiffusionHyperparams,
                                              map_noise_scale_to_time_step)
from fastdiff_tpu.ops import nn as fnn


def init_noise_predictor(key, hidden: int = 32, n_convs: int = 5) -> dict:
    """Strided conv encoder (stride 4 each, k=5) + scalar-conditioned MLP."""
    keys = jax.random.split(key, n_convs + 3)
    params = {"convs": [], "hidden": jnp.zeros(())}  # hidden marker unused
    in_ch = 1
    for i in range(n_convs):
        params["convs"].append(fnn.conv1d_init(keys[i], in_ch, hidden, 5))
        in_ch = hidden
    params["fc1"] = fnn.dense_init(keys[-3], hidden + 2, hidden)
    params["fc2"] = fnn.dense_init(keys[-2], hidden, 1)
    del params["hidden"]
    return params


def noise_predictor_apply(params: dict, x_t: jnp.ndarray,
                          beta_next: jnp.ndarray,
                          delta_sq: jnp.ndarray) -> jnp.ndarray:
    """x_t (B, T, 1), beta_next (B, 1), delta_sq (B, 1) -> beta_est (B, 1)."""
    h = x_t
    for conv in params["convs"]:
        h = fnn.conv1d(conv, h, stride=4)
        h = fnn.leaky_relu(h, 0.2)
    pooled = h.mean(axis=1)                              # (B, hidden)
    feat = jnp.concatenate(
        [pooled, jnp.log(beta_next + 1e-12), jnp.log(delta_sq + 1e-12)],
        axis=-1)
    ratio = jax.nn.sigmoid(fnn.dense(
        params["fc2"], jnp.tanh(fnn.dense(params["fc1"], feat))))
    return ratio * jnp.minimum(delta_sq, beta_next)


def phi_loss(phi_params: dict, denoise_fn: Callable, key: jax.Array,
             mel: jnp.ndarray, audio: jnp.ndarray,
             hyperparams_alpha: jnp.ndarray, tau: int = 200) -> jnp.ndarray:
    """BDDM step-size ELBO (util.py:328-362 semantics, pure function).

    Samples t in [tau, T - tau); beta_next is the tau-step jump ratio.
    """
    b = audio.shape[0]
    t_total = hyperparams_alpha.shape[0]
    k_t, k_z = jax.random.split(key)
    ts = jax.random.randint(k_t, (b,), tau, t_total - tau)
    alpha_cur = hyperparams_alpha[ts][:, None, None]
    alpha_nxt = hyperparams_alpha[ts + tau][:, None, None]
    beta_nxt = 1.0 - (alpha_nxt / alpha_cur) ** 2
    delta = jnp.sqrt(1.0 - alpha_cur ** 2)
    z = jax.random.normal(k_z, audio.shape)
    x_t = alpha_cur * audio + delta * z
    eps = denoise_fn(x_t, mel, ts[:, None].astype(jnp.float32))

    beta_est = noise_predictor_apply(
        phi_params, x_t, beta_nxt[:, :, 0], (delta ** 2)[:, :, 0])
    beta_est = beta_est[:, :, None]                      # (B, 1, 1)

    delta_sq = delta ** 2
    term = (1.0 / (2.0 * (delta_sq - beta_est))
            * (delta * z - beta_est / delta * eps) ** 2)
    term = term + jnp.log(1e-8 + delta_sq / (beta_est + 1e-8)) / 4.0
    loss = (term.mean(axis=1, keepdims=True)
            + beta_est / delta_sq / 2.0).mean()
    return loss


def search_noise_schedule(phi_params: dict, denoise_fn: Callable,
                          key: jax.Array, mel: jnp.ndarray,
                          hyperparams: DiffusionHyperparams,
                          audio_length: int, max_steps: int = 8,
                          beta_start: float = 0.5, alpha_start: float = 0.3,
                          rho: float = 1e-9) -> np.ndarray:
    """Reverse schedule search (util.py:237-288 semantics).

    Returns an ascending beta schedule of length <= max_steps. The loop is
    host-driven (data-dependent termination) around jitted step functions.
    """
    alpha_table = hyperparams.alpha

    @jax.jit
    def reverse_step(x, beta_cur, alpha_cur, step, k):
        t_vec = jnp.full((x.shape[0], 1), step, dtype=jnp.float32)
        eps = denoise_fn(x, mel, t_vec)
        x = x - beta_cur / jnp.sqrt(1.0 - alpha_cur ** 2) * eps
        x = x / jnp.sqrt(1.0 - beta_cur)
        return x

    @jax.jit
    def predict_beta(x, beta_nxt, alpha_cur):
        delta_sq = jnp.maximum(1.0 - alpha_cur ** 2, 1e-12)
        return noise_predictor_apply(
            phi_params, x,
            jnp.full((x.shape[0], 1), beta_nxt, jnp.float32),
            jnp.full((x.shape[0], 1), delta_sq, jnp.float32))[0, 0]

    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, (mel.shape[0], audio_length, 1))
    beta_cur, alpha_cur = float(beta_start), float(alpha_start)
    betas: List[float] = []
    for _ in range(max_steps):
        step = map_noise_scale_to_time_step(alpha_cur, alpha_table)
        if step >= 0:
            betas.append(beta_cur)
        x = reverse_step(x, jnp.float32(beta_cur), jnp.float32(alpha_cur),
                         jnp.float32(max(step, 0.0)), key)
        alpha_nxt = alpha_cur / np.sqrt(max(1.0 - beta_cur, 1e-12))
        if alpha_nxt > 1.0:
            break
        alpha_cur = float(alpha_nxt)
        beta_cur = float(predict_beta(x, beta_cur, alpha_cur))
        if beta_cur < rho:
            break
    return np.asarray(betas[::-1], dtype=np.float32)
