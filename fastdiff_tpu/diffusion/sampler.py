"""Reverse-diffusion sampling as a single ``lax.scan`` on device.

The reference runs a Python loop issuing one forward per step with host
round-trips (reference: modules/FastDiff/module/util.py:211-229). Here the
whole reverse process is one compiled program: per-step constants
(beta, alpha, sigma, fractional step) are stacked and scanned over, noise is
drawn with ``jax.random`` inside the scan, and the denoiser call is traced
once. One compile per (N, audio-length) pair, then pure device execution —
this is where the vocoder's RTF comes from.

Update rule (ancestral / DDPM variant, util.py:226-229):

    x <- (x - beta_n / sqrt(1 - alpha_n^2) * eps_theta(x, mel, t_n))
         / sqrt(1 - beta_n)
    x <- x + sigma_n * z          (all but the final step)

DDIM variant (util.py:219-224) is also provided.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from fastdiff_tpu.diffusion.schedules import SamplerConstants


def inference_key(seed: int = 0) -> jax.Array:
    """RNG key for inference-path noise draws.

    On accelerator backends this returns an ``rbg`` typed key: the sampler's
    per-step draws then lower to the TPU hardware RngBitGenerator instead of
    the threefry2x32 kernel (r5h 16-rep interleaved A/B on the production
    b=1 sampler: -0.18 ms median, 11/16 reps faster — docs/PERF.md r5
    closes). Sampling noise needs no cross-backend bit-reproducibility; on
    CPU (tests) this stays threefry so golden outputs are unchanged. The
    impl travels with the key through ``jax.random.split``, so callers that
    pass their own ``PRNGKey`` keep fully reproducible threefry draws —
    this helper only changes the *default* keys on serving/CLI paths.
    """
    if jax.default_backend() == "cpu":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl="rbg")


def sampling_given_noise_schedule(
        denoise_fn: Callable,
        key: jax.Array,
        mel: jnp.ndarray,
        constants: SamplerConstants,
        audio_length: int,
        ddim: bool = False,
        return_sequence: bool = False,
        state_ncl: bool = False):
    """Generate waveforms: mel (B, T', n_mels) -> (B, audio_length, 1).

    ``denoise_fn(x, mel, t)`` is the epsilon model; ``constants`` come from
    ``sampler_constants_for_schedule`` (index 0 = most-noisy step first).

    ``state_ncl``: carry the scan state as (B, 1, L) instead of (B, L, 1).
    Bit-identical output (the RNG draw order and all update arithmetic are
    elementwise; the boundary reshapes are byte-exact at C == 1), but the
    per-step select/add/RNG math runs with time in the minor dim — the
    (B, L, 1) form left XLA with minor-dim-1 layouts costing ~0.55 ms of
    the 6.19 ms r4 sampler (docs/PERF.md trace table).
    """
    batch = mel.shape[0]
    n_steps = constants.n_steps
    beta = jnp.asarray(constants.beta)
    alpha = jnp.asarray(constants.alpha)
    sigma = jnp.asarray(constants.sigma)
    steps = jnp.asarray(constants.steps)
    # the final ancestral step adds no noise (util.py:228's i > 0 guard);
    # zeroing the last sigma lets the scan body drop the full-length
    # `where(is_last, ...)` select — 0.23 ms/sampler of (B, L) f32
    # broadcast_select in the r4 trace.  x + 0.0 * z == x elementwise.
    sigma_z = sigma.at[n_steps - 1].set(0.0)

    state_shape = ((batch, 1, audio_length) if state_ncl
                   else (batch, audio_length, 1))
    nlc = (batch, audio_length, 1)

    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, state_shape, dtype=jnp.float32)

    step_keys = jax.random.split(key, n_steps)

    def reverse_step(x, scan_in):
        i, k = scan_in
        b_n, a_n, s_n, t_n = beta[i], alpha[i], sigma_z[i], steps[i]
        t_vec = jnp.full((batch, 1), t_n, dtype=jnp.float32)
        eps = denoise_fn(x.reshape(nlc) if state_ncl else x, mel, t_vec)
        if state_ncl:
            eps = eps.reshape(state_shape)
        if ddim:
            a_next = a_n / jnp.sqrt(1.0 - b_n)
            c1 = a_next / a_n
            c2 = -jnp.sqrt(1.0 - a_n ** 2) * c1
            c3 = jnp.sqrt(1.0 - a_next ** 2)
            x = c1 * x + (c2 + c3) * eps
        else:
            x = x - b_n / jnp.sqrt(1.0 - a_n ** 2) * eps
            x = x / jnp.sqrt(1.0 - b_n)
            noise = jax.random.normal(k, x.shape, dtype=x.dtype)
            x = x + s_n * noise
        return x, x if return_sequence else None

    idx = jnp.arange(n_steps)
    x, seq = jax.lax.scan(reverse_step, x, (idx, step_keys))
    if return_sequence:
        return (seq.reshape((n_steps,) + nlc) if state_ncl else seq)
    return x.reshape(nlc) if state_ncl else x


@functools.partial(jax.jit, static_argnames=("denoise_fn", "audio_length",
                                             "n_steps", "ddim", "state_ncl"))
def _jitted_sample(denoise_fn, key, mel, beta, alpha, sigma, steps,
                   audio_length, n_steps, ddim, state_ncl=False):
    constants = SamplerConstants(beta=beta, alpha=alpha, sigma=sigma, steps=steps)
    return sampling_given_noise_schedule(
        denoise_fn, key, mel, constants, audio_length, ddim=ddim,
        state_ncl=state_ncl)


def make_sampler(denoise_fn: Callable, constants: SamplerConstants,
                 ddim: bool = False) -> Callable:
    """Return ``sample(key, mel, audio_length) -> wav`` with jit caching per
    (audio_length, batch) bucket.

    The params live inside the ``denoise_fn`` closure, which is a *static*
    jit key — fine for one-shot CLI inference, wrong for serving many
    states: prefer ``make_param_sampler`` there (params traced, one compile
    across checkpoints / EMA updates).
    """
    def sample(key, mel, audio_length: int):
        return _jitted_sample(
            denoise_fn, key, mel,
            jnp.asarray(constants.beta), jnp.asarray(constants.alpha),
            jnp.asarray(constants.sigma), jnp.asarray(constants.steps),
            audio_length, constants.n_steps, ddim)
    return sample


@functools.partial(jax.jit, static_argnames=("apply_fn", "audio_length",
                                             "n_steps", "ddim", "state_ncl"))
def _jitted_param_sample(apply_fn, params, key, mel, beta, alpha, sigma,
                         steps, audio_length, n_steps, ddim, state_ncl=False):
    constants = SamplerConstants(beta=beta, alpha=alpha, sigma=sigma, steps=steps)
    return sampling_given_noise_schedule(
        lambda x, m, t: apply_fn(params, x, m, t), key, mel, constants,
        audio_length, ddim=ddim, state_ncl=state_ncl)


def make_param_sampler(apply_fn: Callable, constants: SamplerConstants,
                       ddim: bool = False) -> Callable:
    """Return ``sample(params, key, mel, audio_length) -> wav`` where params
    are a *traced* pytree argument.

    The compile cache is keyed only on ``apply_fn`` identity + shapes, so two
    different states (a new checkpoint, an EMA snapshot) sample through the
    same compiled executable — the serving-shaped API the closure-based
    ``make_sampler`` can't provide. ``apply_fn(params, x, mel, t)`` must be
    an identity-stable callable (cache it on the caller, don't rebuild a
    lambda per call).
    """
    def sample(params, key, mel, audio_length: int):
        return _jitted_param_sample(
            apply_fn, params, key, mel,
            jnp.asarray(constants.beta), jnp.asarray(constants.alpha),
            jnp.asarray(constants.sigma), jnp.asarray(constants.steps),
            audio_length, constants.n_steps, ddim)
    return sample
