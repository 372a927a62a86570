"""NCL (time-in-lanes) whole-LVC-block kernel: parity, edges, gradients.

Interpret mode on the CPU test platform; on TPU the same code path compiles
under Mosaic (policy: config.resolve_pallas_block -> 'ncl' routes
models/fastdiff.py:_lvc_block_apply here).  Hardware-trace A/B at the bench
shapes (docs/PERF.md round 3): block2 1.62 -> 0.32 ms, block1 0.52 ->
0.12 ms vs the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdiff_tpu.ops.lvc_block_pallas import (_unfused_reference,
                                               augment_lvc_kernels,
                                               stack_conv_weights)
from fastdiff_tpu.ops.lvc_block_ncl import (fusable, lvc_block_ncl,
                                            lvc_block_ncl_from_nwc)

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


def _ref(kw, hop):
    return _unfused_reference(kw["x"], kw["skip"], kw["kernels"],
                              kw["biases"], kw["conv_ws"], kw["conv_bs"], hop)


def _run(kw, hop):
    return lvc_block_ncl(kw["x"], kw["skip"], kw["kernels"], kw["biases"],
                         kw["conv_ws"], kw["conv_bs"], hop, True)


@pytest.mark.parametrize("b,f,hop", [
    (1, 64, 64),     # multi-tile at hop 64 (128-sample halo = 2 frames)
    (2, 8, 256),     # hop 256, batch dim in the grid
    (1, 100, 256),   # training crop shape (non-power-of-two tiling)
    (1, 64, 8),      # r4: hop-8 fused (16-frame halo units, micro-dots)
    (2, 32, 8),      # hop-8 with batch dim
])
def test_ncl_matches_unfused(b, f, hop):
    kw = _case(b, f, hop)
    np.testing.assert_allclose(np.asarray(_run(kw, hop)),
                               np.asarray(_ref(kw, hop)),
                               rtol=2e-5, atol=2e-5)


def test_sequence_edges_match():
    kw = _case(1, 16, 64, seed=3)
    ref = _ref(kw, 64)
    out = _run(kw, 64)
    edge = 64
    np.testing.assert_allclose(np.asarray(out)[:, :edge],
                               np.asarray(ref)[:, :edge], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[:, -edge:],
                               np.asarray(ref)[:, -edge:], rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused():
    kw = _case(1, 8, 64, seed=1)

    def loss_fused(x, kernels):
        out = lvc_block_ncl(x, kw["skip"], kernels, kw["biases"],
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


def test_final_conv_epilogue():
    """lvc_block_ncl_aug(final_wb=...) fuses the model's k=7 C->1 output
    conv; the second output must match conv1d(block_out)."""
    from fastdiff_tpu.ops.lvc_block_ncl import (kern_taug_from_aug,
                                                lvc_block_ncl_aug,
                                                wstack_t_from)
    from fastdiff_tpu.ops import nn as fnn

    kw = _case(1, 16, 64, seed=5)
    c = 32
    rng = np.random.default_rng(7)
    fw = jnp.asarray(rng.normal(size=(7, c, 1)) * 0.1, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    kern_aug = augment_lvc_kernels(kw["kernels"], kw["biases"].astype(
        kw["x"].dtype))
    wstack = stack_conv_weights([w for w in kw["conv_ws"]],
                                [b for b in kw["conv_bs"]],
                                dtype=kw["x"].dtype)
    xt = jnp.swapaxes(kw["x"], 1, 2)
    st = jnp.swapaxes(kw["skip"], 1, 2)
    final_wb = jnp.concatenate([fw[:, :, 0], jnp.full((1, c), fb[0])], axis=0)
    out, fin = lvc_block_ncl_aug(xt, st, kern_taug_from_aug(kern_aug),
                                 wstack_t_from(wstack), 64, interpret=True,
                                 final_wb=final_wb)
    ref = fnn.conv1d_ncl({"w": fw, "b": fb}, out)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_from_nwc_adapter():
    kw = _case(1, 8, 256, seed=2)
    kern_aug = augment_lvc_kernels(kw["kernels"], kw["biases"].astype(
        kw["x"].dtype))
    wstack = stack_conv_weights([w for w in kw["conv_ws"]],
                                [b for b in kw["conv_bs"]],
                                dtype=kw["x"].dtype)
    out = lvc_block_ncl_from_nwc(kw["x"], kw["skip"], kern_aug, wstack, 256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(kw, 256)),
                               rtol=2e-5, atol=2e-5)


def test_fusable_gating():
    assert fusable(256, 864) and fusable(64, 16)
    # r4: hop-8 is fused too (frames must tile into 16-frame halo units)
    assert fusable(8, 864)
    assert not fusable(8, 24)        # 24 % 16 != 0 -> XLA fallback
    assert not fusable(256, 1)


def test_model_integration_ncl():
    """use_pallas_block='ncl' routes the up path through the kernel and
    matches the XLA path at model level."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    cfg = ModelConfig(inner_channels=32, cond_channels=80,
                      upsample_ratios=(8, 8, 4), compute_dtype="float32")
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = 8
    audio = jnp.asarray(rng.normal(size=(1, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    t = jnp.full((1, 1), 37.4, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t, cfg)
    cfg_ncl = ModelConfig(inner_channels=32, cond_channels=80,
                          upsample_ratios=(8, 8, 4), compute_dtype="float32",
                          use_pallas_block="ncl")
    out = fastdiff_apply(params, audio, mel, t, cfg_ncl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_model_integration_ncl_b1_fh_gate():
    """ADVICE r4: exercise the FH_MAX_HOP/FH_MAX_B hop-8 fused-head gate in
    _lvc_block_apply_ncl under the plain 'ncl' policy at b=1 with
    frames % 16 == 0.  Production FH_MAX_B is 0 (the r5c/r5g settle) so the
    knob is pinned to 1 here to keep the gated path covered — output must
    match the NWC reference path either way."""
    import fastdiff_tpu.models.fastdiff as M
    import fastdiff_tpu.ops.lvc_block_ncl as NCL
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff
    from fastdiff_tpu.ops.lvc_block_ncl import FH_MAX_HOP, fusable

    kw = dict(inner_channels=32, cond_channels=80, upsample_ratios=(8, 8, 4),
              compute_dtype="float32")
    cfg = ModelConfig(**kw)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    frames = 32                      # hop-8 block fusable: frames % 16 == 0
    assert fusable(FH_MAX_HOP, frames)   # the gate actually fires here
    audio = jnp.asarray(rng.normal(size=(1, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    t = jnp.full((1, 1), 37.4, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t, cfg)
    old = NCL.FH_MAX_B
    try:
        NCL.FH_MAX_B = 1
        M._APPLY_FNS.clear()         # gate is read at trace time
        out = fastdiff_apply(params, audio, mel, t,
                             ModelConfig(use_pallas_block="ncl", **kw))
    finally:
        NCL.FH_MAX_B = old
        M._APPLY_FNS.clear()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_model_integration_ncl_fused_head():
    """use_pallas_block='ncl_fh' (predictor-head matmul fused INTO the
    megakernel — the kern_taug operand never exists in HBM) must be
    BIT-exact against the two-kernel 'ncl' path: same f32-accumulate +
    bias + bf16-cast math, just computed per grid cell."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    kw = dict(inner_channels=32, cond_channels=80, upsample_ratios=(8, 8, 4))
    params = init_fastdiff(jax.random.PRNGKey(0), ModelConfig(**kw))
    rng = np.random.default_rng(2)
    frames = 32                      # hop-8 block fusable: frames % 16 == 0
    audio = jnp.asarray(rng.normal(size=(2, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(2, frames, 80)), jnp.float32)
    t = jnp.full((2, 1), 37.4, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t,
                         ModelConfig(use_pallas_block="ncl", **kw))
    out = fastdiff_apply(params, audio, mel, t,
                         ModelConfig(use_pallas_block="ncl_fh", **kw))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_model_integration_ncl_vjp_trainable():
    """use_pallas_block='ncl_vjp' (the trainable NCL route: megakernel
    forward, unfused-recompute backward) matches the XLA forward and
    produces gradients matching the XLA path."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    kw = dict(inner_channels=32, cond_channels=80, upsample_ratios=(8, 8, 4),
              compute_dtype="float32")
    cfg = ModelConfig(**kw)
    cfg_v = ModelConfig(use_pallas_block="ncl_vjp", **kw)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    frames = 8
    audio = jnp.asarray(rng.normal(size=(1, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    t = jnp.full((1, 1), 12.0, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t, cfg)
    out = fastdiff_apply(params, audio, mel, t, cfg_v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)

    def loss(p, c):
        return jnp.mean(fastdiff_apply(p, audio, mel, t, c) ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)
    g_v = jax.grad(lambda p: loss(p, cfg_v))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_sr_forward_and_gradients_match_unfused():
    """lvc_block_ncl_taug_sr (saved-residual training entry): forward must
    match the unfused reference, and the MANUAL backward (_sr_backward, no
    forward recompute) must match autodiff of the unfused reference for all
    four differentiable operands."""
    from fastdiff_tpu.ops.lvc_block_ncl import (aug_rows, kern_taug_from_aug,
                                                lvc_block_ncl_taug_sr,
                                                wstack_t_from)

    b, f, hop, c = 2, 8, 64, 8
    kw = _case(b, f, hop, c=c, seed=5)
    L = f * hop
    rows = aug_rows(c)
    kflat = kw["kernels"].reshape(b, f, LAYERS, 3 * c, 2 * c)
    kern_aug = jnp.concatenate([kflat, kw["biases"][..., None, :]], axis=3)
    kern_taug = kern_taug_from_aug(kern_aug)
    ws = jnp.stack([w.reshape(-1, w.shape[-1]) for w in kw["conv_ws"]])
    wstack_t = wstack_t_from(
        jnp.concatenate([ws, kw["conv_bs"][:, None, :]], axis=1))
    x_ncl = jnp.swapaxes(kw["x"], 1, 2)
    s_ncl = jnp.swapaxes(kw["skip"], 1, 2)

    out = lvc_block_ncl_taug_sr(x_ncl, s_ncl, kern_taug, wstack_t, 64, True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(out, 1, 2)),
                               np.asarray(_ref(kw, 64)),
                               rtol=2e-5, atol=2e-5)

    w_rand = jnp.asarray(np.random.default_rng(6).normal(size=(b, c, L)),
                         jnp.float32)

    def loss_sr(x_ncl, s_ncl, kt, wt):
        o = lvc_block_ncl_taug_sr(x_ncl, s_ncl, kt, wt, 64, True)
        return jnp.sum(o * w_rand)

    def loss_ref(x_ncl, s_ncl, kt, wt):
        ka = jnp.swapaxes(kt[..., :rows], -1, -2)
        kk = ka[..., : 3 * c, :].reshape(b, f, LAYERS, 3, c, 2 * c)
        bb = ka[..., 3 * c, :]
        cw = jnp.swapaxes(wt, 1, 2)[:, : 3 * c].reshape(LAYERS, 3, c, c)
        cb = jnp.swapaxes(wt, 1, 2)[:, 3 * c]
        o = _unfused_reference(jnp.swapaxes(x_ncl, 1, 2),
                               jnp.swapaxes(s_ncl, 1, 2), kk, bb, cw, cb, 64)
        return jnp.sum(jnp.swapaxes(o, 1, 2) * w_rand)

    args = (x_ncl, s_ncl, kern_taug, wstack_t)
    g_sr = jax.grad(loss_sr, argnums=(0, 1, 2, 3))(*args)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, r in zip(g_sr, g_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_model_integration_ncl_sr_trainable():
    """use_pallas_block='ncl_sr' (full-NCL training forward + saved-residual
    VJP megakernel) matches the XLA forward and produces full-model
    gradients matching the XLA path."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    kw = dict(inner_channels=32, cond_channels=80, upsample_ratios=(8, 8, 4),
              compute_dtype="float32")
    cfg = ModelConfig(**kw)
    cfg_v = ModelConfig(use_pallas_block="ncl_sr", **kw)
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    frames = 8
    audio = jnp.asarray(rng.normal(size=(1, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(1, frames, 80)), jnp.float32)
    t = jnp.full((1, 1), 12.0, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t, cfg)
    out = fastdiff_apply(params, audio, mel, t, cfg_v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)

    def loss(p, c):
        return jnp.mean(fastdiff_apply(p, audio, mel, t, c) ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)
    g_v = jax.grad(lambda p: loss(p, cfg_v))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_model_integration_ncl_batched():
    """The full-NCL forward (B, C, L end to end) matches the NWC path at
    batch > 1 and bf16 compute (the production inference configuration)."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fastdiff_apply, init_fastdiff

    cfg = ModelConfig(inner_channels=32, cond_channels=80,
                      upsample_ratios=(8, 8, 4), compute_dtype="bfloat16")
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    frames = 8
    audio = jnp.asarray(rng.normal(size=(3, frames * 256, 1)), jnp.float32)
    mel = jnp.asarray(rng.normal(size=(3, frames, 80)), jnp.float32)
    t = jnp.full((3, 1), 512.0, jnp.float32)
    ref = fastdiff_apply(params, audio, mel, t, cfg)
    cfg_ncl = ModelConfig(inner_channels=32, cond_channels=80,
                          upsample_ratios=(8, 8, 4),
                          compute_dtype="bfloat16", use_pallas_block="ncl")
    out = fastdiff_apply(params, audio, mel, t, cfg_ncl)
    # bf16 paths accumulate rounding differently; agreement to bf16 eps
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)
