"""Mixture-density output heads: discretized mix-of-logistics + mix-of-Gaussians.

JAX re-implementation of the r9y9 WaveNet vocoder's output distributions
(reference: modules/wavenet_vocoder/mixture.py:26-270 — vendored, dead code
there; live here for the MoL WaveNet family, models/wavenet_mol.py).

Conventions: parameters are channel-LAST ``(..., 3*nr_mix)`` laid out as
[logit_probs | means | log_scales] and targets are ``(...,)`` scalars in
[-1, 1] (the reference's channel-first (B, C, T) is a torch layout choice,
not semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _log_sum_exp(x, axis=-1):
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.exp(x - m), axis=axis))


def _log_softmax(x, axis=-1):
    return x - jax.scipy.special.logsumexp(x, axis=axis, keepdims=True)


def _split_params(y_hat, log_scale_min, clamp=True):
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = y_hat[..., 2 * nr_mix:3 * nr_mix]
    if clamp:
        log_scales = jnp.maximum(log_scales, log_scale_min)
    return logit_probs, means, log_scales


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_classes: int = 256,
                                  log_scale_min: float = -7.0,
                                  reduce: bool = True) -> jnp.ndarray:
    """Discretized MoL negative log-likelihood (mixture.py:26-106).

    y_hat (..., 3*nr_mix); y (...,) in [-1, 1]. ``reduce`` sums over all
    elements (matching the reference's ``-sum(log_sum_exp(...))``).
    """
    assert y_hat.shape[-1] % 3 == 0
    logit_probs, means, log_scales = _split_params(y_hat, log_scale_min)

    y = y[..., None]
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)      # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0))
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + _log_softmax(logit_probs)
    nll = -_log_sum_exp(log_probs)
    return jnp.sum(nll) if reduce else nll


def sample_from_discretized_mix_logistic(key, y: jnp.ndarray,
                                         log_scale_min: float = -7.0,
                                         clamp_log_scale: bool = False
                                         ) -> jnp.ndarray:
    """Sample (mixture.py:119-157): Gumbel-max mixture pick, then a logistic
    draw via the inverse CDF, clipped to [-1, 1]. y (..., 3*nr_mix) -> (...,)."""
    assert y.shape[-1] % 3 == 0
    logit_probs, means_all, log_scales_all = _split_params(
        y, log_scale_min, clamp=clamp_log_scale)
    k1, k2 = jax.random.split(key)
    # uniform in (1e-5, 1-1e-5) as the reference; Gumbel-max trick
    u = jax.random.uniform(k1, logit_probs.shape, minval=1e-5,
                           maxval=1.0 - 1e-5)
    idx = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    one_hot = jax.nn.one_hot(idx, logit_probs.shape[-1], dtype=y.dtype)
    means = jnp.sum(means_all * one_hot, axis=-1)
    log_scales = jnp.sum(log_scales_all * one_hot, axis=-1)
    u2 = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u2) - jnp.log(1.0 - u2))
    return jnp.clip(x, -1.0, 1.0)


def mix_logistic_mode(y: jnp.ndarray,
                      log_scale_min: float = -7.0) -> jnp.ndarray:
    """Temperature -> 0 limit of ``sample_from_discretized_mix_logistic``:
    the argmax mixture component's mean, clipped to [-1, 1].  Deterministic —
    the correctness instrument for closed-loop AR consistency tests (the
    stochastic draw otherwise makes AR-vs-teacher-forced comparison
    impossible)."""
    assert y.shape[-1] % 3 == 0
    logit_probs, means_all, _ = _split_params(y, log_scale_min, clamp=False)
    idx = jnp.argmax(logit_probs, axis=-1)
    means = jnp.take_along_axis(means_all, idx[..., None], axis=-1)[..., 0]
    return jnp.clip(means, -1.0, 1.0)


def mix_gaussian_mode(y: jnp.ndarray,
                      log_scale_min: float = -7.0) -> jnp.ndarray:
    """Temperature -> 0 limit of ``sample_from_mix_gaussian``."""
    c = y.shape[-1]
    if c == 2:
        return jnp.clip(y[..., 0], -1.0, 1.0)
    return mix_logistic_mode(y, log_scale_min)


def mix_gaussian_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                      log_scale_min: float = -7.0,
                      reduce: bool = True) -> jnp.ndarray:
    """Continuous mixture-of-Gaussians NLL (mixture.py:162-220), including
    the reference's C==2 single-Gaussian special case."""
    c = y_hat.shape[-1]
    y = y[..., None]
    if c == 2:
        means = y_hat[..., 0:1]
        log_scales = jnp.maximum(y_hat[..., 1:2], log_scale_min)
        logit_probs = None
    else:
        assert c % 3 == 0
        logit_probs, means, log_scales = _split_params(y_hat, log_scale_min)
    centered = y - means
    # Normal(0, scale).log_prob(centered)
    log_probs = (-0.5 * (centered * jnp.exp(-log_scales)) ** 2
                 - log_scales - 0.5 * jnp.log(2.0 * jnp.pi))
    if logit_probs is not None:
        log_probs = log_probs + _log_softmax(logit_probs)
        nll = -_log_sum_exp(log_probs)
    else:
        nll = -log_probs[..., 0]
    return jnp.sum(nll) if reduce else nll


def sample_from_mix_gaussian(key, y: jnp.ndarray,
                             log_scale_min: float = -7.0) -> jnp.ndarray:
    """Sample (mixture.py:223-270). y (..., C) -> (...,) in [-1, 1]."""
    c = y.shape[-1]
    k1, k2 = jax.random.split(key)
    if c == 2:
        means, log_scales = y[..., 0], y[..., 1]
    else:
        assert c % 3 == 0
        logit_probs, means_all, log_scales_all = _split_params(
            y, log_scale_min, clamp=False)
        u = jax.random.uniform(k1, logit_probs.shape, minval=1e-5,
                               maxval=1.0 - 1e-5)
        idx = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
        one_hot = jax.nn.one_hot(idx, logit_probs.shape[-1], dtype=y.dtype)
        means = jnp.sum(means_all * one_hot, axis=-1)
        log_scales = jnp.sum(log_scales_all * one_hot, axis=-1)
    x = means + jnp.exp(log_scales) * jax.random.normal(k2, means.shape)
    return jnp.clip(x, -1.0, 1.0)


# ---------------------------------------------------------------------------
# mu-law companding (r9y9 WaveNet input encodings; the reference imports
# these from nnmnkwii.preprocessing — standard ITU G.711 math)
# ---------------------------------------------------------------------------

def mulaw(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """[-1, 1] -> [-1, 1] mu-law companded."""
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def inv_mulaw(y: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


def mulaw_quantize(x: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    """[-1, 1] -> integer class ids [0, mu].

    Truncates (no rounding) to match nnmnkwii's ``mulaw_quantize`` used by
    the reference pipeline (``((y+1)/2*mu).astype(int)``); this also makes
    ``mulaw_quantize(0) == 127``, the AR generator's one-hot seed id."""
    y = mulaw(x, mu)
    return jnp.clip(((y + 1.0) / 2.0 * mu).astype(jnp.int32), 0, mu)


def inv_mulaw_quantize(ids: jnp.ndarray, mu: int = 255) -> jnp.ndarray:
    y = 2.0 * ids.astype(jnp.float32) / mu - 1.0
    return inv_mulaw(y, mu)
