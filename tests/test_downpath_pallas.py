"""Fused down-path kernel (ops/downpath_pallas.py) vs the XLA composition.

Interpret mode on CPU; the reference is the exact model code path
(first_audio_conv + _dblock_apply chain, models/fastdiff.py:375-383).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.models.fastdiff import fuse_weight_norm, init_fastdiff
from fastdiff_tpu.ops.downpath_pallas import (_unfused_reference,
                                              downpath_fusable,
                                              downpath_fused, required_halo)


def _params(cfg, seed=0, fused_wn=True):
    p = init_fastdiff(jax.random.PRNGKey(seed), cfg)
    if fused_wn:
        p = fuse_weight_norm(p)
    return {"first_audio_conv": p["first_audio_conv"],
            "downsample": p["downsample"]}


def _audio(b, length, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, length, 1)), jnp.float32)


def test_required_halo_default():
    assert required_halo((4, 8, 8)) == 2048
    assert downpath_fusable(864 * 256, (4, 8, 8))
    assert not downpath_fusable(100 * 256, (4, 8, 8))   # not halo-aligned


@pytest.mark.parametrize("b,frames", [(1, 16), (2, 24)])
def test_fused_matches_unfused(b, frames):
    cfg = ModelConfig()
    factors = tuple(reversed(cfg.upsample_ratios))
    length = frames * cfg.total_hop
    assert downpath_fusable(length, factors)
    params = _params(cfg)
    audio = _audio(b, length)

    ref = _unfused_reference(params, audio, factors)
    out = downpath_fused(params, audio, factors, True)
    assert len(out) == len(ref) == len(factors) + 1
    for i, (o, r) in enumerate(zip(out, ref)):
        assert o.shape == r.shape, i
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=0, atol=2e-2, err_msg=f"output {i}")


def test_sequence_edges_are_zero_padded():
    """Edge tiles must reproduce zero-padding semantics, not circular."""
    cfg = ModelConfig()
    factors = tuple(reversed(cfg.upsample_ratios))
    length = 16 * cfg.total_hop
    params = _params(cfg)
    rng = np.random.default_rng(3)
    a = np.zeros((1, length, 1), np.float32)
    # energy concentrated at both sequence edges: circular wrap would leak
    a[:, :64] = rng.standard_normal((1, 64, 1))
    a[:, -64:] = rng.standard_normal((1, 64, 1))
    audio = jnp.asarray(a)

    ref = _unfused_reference(params, audio, factors)
    out = downpath_fused(params, audio, factors, True)
    for i, (o, r) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=0, atol=2e-2, err_msg=f"output {i}")


def test_model_integration_flag():
    """fastdiff_apply with use_pallas_down on == off (bf16 noise tolerance;
    the flag needs a halo-aligned length — 16 frames = 4096 samples)."""
    import dataclasses

    from fastdiff_tpu.models.fastdiff import fastdiff_apply

    cfg = ModelConfig()                       # bf16 (the kernel's dtype gate)
    cfg_fused = dataclasses.replace(cfg, use_pallas_down=True)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = 16
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, frames * cfg.total_hop, 1)),
                    jnp.float32)
    t = jnp.full((1, 1), 47.3, jnp.float32)
    ref = fastdiff_apply(params, x, mel, t, cfg)
    out = fastdiff_apply(params, x, mel, t, cfg_fused)
    rel = float(np.sqrt(((np.asarray(out) - np.asarray(ref)) ** 2).mean())
                / np.sqrt((np.asarray(ref) ** 2).mean() + 1e-12))
    assert rel < 2e-2, rel


def test_unfusable_length_falls_back():
    """Non-halo-aligned lengths silently take the XLA path."""
    import dataclasses

    from fastdiff_tpu.models.fastdiff import fastdiff_apply

    cfg = dataclasses.replace(ModelConfig(), use_pallas_down=True)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = 4                               # 1024 samples: not fusable
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, frames * cfg.total_hop, 1)),
                    jnp.float32)
    t = jnp.full((1, 1), 3.0, jnp.float32)
    out = fastdiff_apply(params, x, mel, t, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_custom_vjp_matches_unfused_grads():
    cfg = ModelConfig()
    factors = tuple(reversed(cfg.upsample_ratios))
    length = 16 * cfg.total_hop
    params = _params(cfg)
    audio = _audio(1, length)

    def loss_fused(p, a):
        outs = downpath_fused(p, a, factors, True)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    def loss_ref(p, a):
        outs = _unfused_reference(p, a, factors)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, audio)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, audio)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    # bf16 forward noise feeds the cotangent, so tiny-magnitude elements of
    # large-magnitude leaves see cancellation noise: compare leaf-normalized
    for a_, b_ in zip(flat_f, flat_r):
        a_ = np.asarray(a_, np.float32)
        b_ = np.asarray(b_, np.float32)
        scale = max(1.0, float(np.abs(b_).max()))
        np.testing.assert_allclose(a_ / scale, b_ / scale, rtol=0, atol=5e-2)
