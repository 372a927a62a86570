"""Whole-LVC-block megakernel: parity, edges, gradients, model integration.

Runs the Pallas kernel in interpret mode on the CPU test platform; the same
code path compiles under Mosaic on TPU (where use_pallas_block routes to it,
models/fastdiff.py:_lvc_block_apply).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdiff_tpu.ops.lvc_block_pallas import (_unfused_reference, fusable,
                                               lvc_block_fused)

LAYERS = 4


def _case(b, f, hop, c=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    L = f * hop
    return dict(
        x=jnp.asarray(rng.normal(size=(b, L, c)), dtype),
        skip=jnp.asarray(rng.normal(size=(b, L, c)), dtype),
        kernels=jnp.asarray(
            rng.normal(size=(b, f, LAYERS, 3, c, 2 * c)) * 0.1, dtype),
        biases=jnp.asarray(rng.normal(size=(b, f, LAYERS, 2 * c)) * 0.1,
                           jnp.float32),
        conv_ws=jnp.asarray(rng.normal(size=(LAYERS, 3, c, c)) * 0.1, dtype),
        conv_bs=jnp.asarray(rng.normal(size=(LAYERS, c)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("b,f,hop", [
    (1, 64, 64),     # multi-tile at hop 64: halo + roll-wrap masking
    (2, 8, 256),     # hop 256, batch dim in the grid
    (1, 100, 256),   # the training crop shape (non-power-of-two tiling)
])
def test_fused_matches_unfused(b, f, hop):
    kw = _case(b, f, hop)
    ref = _unfused_reference(kw["x"], kw["skip"], kw["kernels"], kw["biases"],
                             kw["conv_ws"], kw["conv_bs"], hop)
    out = lvc_block_fused(kw["x"], kw["skip"], kw["kernels"], kw["biases"],
                          kw["conv_ws"], kw["conv_bs"], hop, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sequence_edges_match():
    """Zero-padding semantics at the true sequence boundary: the first and
    last receptive fields are where halo garbage would leak without the
    per-layer validity mask."""
    kw = _case(1, 16, 64, seed=3)
    ref = _unfused_reference(kw["x"], kw["skip"], kw["kernels"], kw["biases"],
                             kw["conv_ws"], kw["conv_bs"], 64)
    out = lvc_block_fused(kw["x"], kw["skip"], kw["kernels"], kw["biases"],
                          kw["conv_ws"], kw["conv_bs"], 64, True)
    edge = 64
    np.testing.assert_allclose(np.asarray(out)[:, :edge],
                               np.asarray(ref)[:, :edge], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[:, -edge:],
                               np.asarray(ref)[:, -edge:], rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_unfused_grads():
    kw = _case(1, 4, 64, c=8, seed=1)

    def loss_fused(x, kernels):
        out = lvc_block_fused(x, kw["skip"], kernels, kw["biases"],
                              kw["conv_ws"], kw["conv_bs"], 64, True)
        return jnp.sum(out ** 2)

    def loss_ref(x, kernels):
        out = _unfused_reference(x, kw["skip"], kernels, kw["biases"],
                                 kw["conv_ws"], kw["conv_bs"], 64)
        return jnp.sum(out ** 2)

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(kw["x"], kw["kernels"])
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(kw["x"], kw["kernels"])
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_fusable_gating():
    assert not fusable(8, 100)     # the T/32-rate block stays on XLA
    assert fusable(64, 100)
    assert fusable(256, 128)
    assert not fusable(256, 1)


def test_model_integration_flag():
    """fastdiff_apply with use_pallas_block on == off (hop-64/256 blocks ride
    the megakernel, the hop-8 block falls back)."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    cfg = ModelConfig(compute_dtype="float32")
    cfg_fused = dataclasses.replace(cfg, use_pallas_block=True)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = 4
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, frames * 256, 1)), jnp.float32)
    t = jnp.full((1, 1), 47.3, jnp.float32)
    ref = fastdiff_apply(params, x, mel, t, cfg)
    out = fastdiff_apply(params, x, mel, t, cfg_fused)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
