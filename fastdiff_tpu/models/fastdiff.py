"""FastDiff denoiser: the time-aware LVC epsilon-prediction network.

Functional re-design of the reference architecture
(reference: modules/FastDiff/module/FastDiff_model.py:10-102,
modules/FastDiff/module/modules.py:116-343):

    input conv (k=7, 1->32)
      -> 3 DiffusionDBlocks (downsample x4, x8, x8; T -> T/256), skips saved
      -> 3 TimeAware LVC blocks (upsample x8, x8, x4; back to T),
         each conditioned on (mel + per-block projection of the diffusion-step
         embedding) through a KernelPredictor that emits per-frame LVC kernels
      -> output conv (k=7, 32->1)

Diffusion-step embedding: 128-d sinusoid of the (possibly fractional) step t,
through two swish MLP layers to 512-d (FastDiff_model.py:84-87; fractional t
comes from the alpha->t interpolation at util.py:394-404).

All activations are NWC (B, T, C); parameters are plain pytrees created by
``init_fastdiff`` and consumed by the pure ``fastdiff_apply``. Under
``cfg.compute_dtype == 'bfloat16'`` convolutions/matmuls run in bf16 with f32
accumulation; diffusion arithmetic around the network stays f32.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.ops.lvc import lvc_gated_residual


_APPLY_FNS: dict = {}


def get_apply_fn(cfg: ModelConfig):
    """Identity-stable ``apply(params, x, mel, t)`` for a given config.

    Cached per (hashable, frozen) ModelConfig so it can serve as a *static*
    jit key: every sampler/vocoder instance built for the same config shares
    one compiled executable, with params passed as a traced pytree
    (fastdiff_tpu.diffusion.sampler.make_param_sampler).
    """
    fn = _APPLY_FNS.get(cfg)
    if fn is None:
        def fn(params, x, mel, t):
            return fastdiff_apply(params, x, mel, t, cfg)
        _APPLY_FNS[cfg] = fn
    return fn

# ---------------------------------------------------------------------------
# Diffusion step embedding
# ---------------------------------------------------------------------------

def diffusion_step_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding of (fractional) diffusion steps t: (B, 1) -> (B, dim).

    [sin(t * 10^(-4i/(half-1))), ..., cos(...)] exactly as util.py:407-432;
    t is float — inference uses fractional steps.
    """
    half = dim // 2
    freqs = jnp.exp(np.log(10000.0) / (half - 1) * -jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _init_kernel_predictor(key, cfg: ModelConfig) -> dict:
    """KernelPredictor params (reference: modules.py:257-318).

    A small conv net over the conditioning mel that predicts, per mel frame,
    the LVC kernels (layers * Cin * 2Cin * K channels) and biases
    (layers * 2Cin channels).
    """
    cin = cfg.inner_channels
    cout = 2 * cfg.inner_channels
    layers = cfg.lvc_layers_each_block
    k = cfg.lvc_kernel_size
    hidden = cfg.kpnet_hidden_channels
    ksz = cfg.kpnet_conv_size
    l_w = cin * cout * k * layers
    l_b = cout * layers
    keys = jax.random.split(key, 9)
    wn = cfg.use_weight_norm
    return {
        "input_conv": fnn.conv1d_init(keys[0], cfg.cond_channels, hidden, 5, wn),
        "residual_convs": [
            fnn.conv1d_init(keys[1 + i], hidden, hidden, ksz, wn)
            for i in range(6)
        ],
        "kernel_conv": fnn.conv1d_init(keys[7], hidden, l_w, ksz, wn),
        "bias_conv": fnn.conv1d_init(keys[8], hidden, l_b, ksz, wn),
    }


def _init_lvc_block(key, cfg: ModelConfig, ratio: int) -> dict:
    """TimeAware LVC block params (reference: modules.py:141-187)."""
    c = cfg.inner_channels
    keys = jax.random.split(key, 4 + cfg.lvc_layers_each_block)
    wn = cfg.use_weight_norm
    return {
        "upsample": fnn.conv_transpose1d_init(keys[0], c, c, ratio * 2, wn),
        "fc_t": fnn.dense_init(keys[1], cfg.diffusion_step_embed_dim_out,
                               cfg.cond_channels),
        "kernel_predictor": _init_kernel_predictor(keys[2], cfg),
        "convs": [
            fnn.conv1d_init(keys[4 + i], c, c, cfg.lvc_kernel_size, wn)
            for i in range(cfg.lvc_layers_each_block)
        ],
    }


def _init_dblock(key, cfg: ModelConfig) -> dict:
    """DiffusionDBlock params (reference: modules.py:116-125)."""
    c = cfg.inner_channels
    keys = jax.random.split(key, 4)
    wn = cfg.use_weight_norm
    return {
        "residual_dense": fnn.conv1d_init(keys[0], c, c, 1, wn),
        "convs": [fnn.conv1d_init(keys[1 + i], c, c, 3, wn) for i in range(3)],
    }


def init_fastdiff(key, cfg: ModelConfig) -> dict:
    """Build the full FastDiff parameter pytree."""
    n_blocks = len(cfg.upsample_ratios)
    keys = jax.random.split(key, 4 + 2 * n_blocks)
    params = {
        "first_audio_conv": fnn.conv1d_init(
            keys[0], cfg.audio_channels, cfg.inner_channels, 7, cfg.use_weight_norm),
        "final_conv": fnn.conv1d_init(
            keys[1], cfg.inner_channels, cfg.audio_channels, 7, cfg.use_weight_norm),
        "fc_t1": fnn.dense_init(keys[2], cfg.diffusion_step_embed_dim_in,
                                cfg.diffusion_step_embed_dim_mid),
        "fc_t2": fnn.dense_init(keys[3], cfg.diffusion_step_embed_dim_mid,
                                cfg.diffusion_step_embed_dim_out),
        "lvc_blocks": [
            _init_lvc_block(keys[4 + i], cfg, cfg.upsample_ratios[i])
            for i in range(n_blocks)
        ],
        # downsample[n] uses the *reversed* ratio order (FastDiff_model.py:63)
        "downsample": [
            _init_dblock(keys[4 + n_blocks + i], cfg)
            for i in range(n_blocks)
        ],
    }
    return params


def num_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def fuse_weight_norm(params):
    """Collapse every (g, v) weight-norm pair into a plain 'w' kernel.

    For inference: the parametrization only matters for training dynamics
    (reference trains with weight norm, FastDiff_model.py:115-122, and calls
    remove_weight_norm for deployment, :104-113). Fusing once removes the
    per-call norm computation from the sampled graph.

    Conv pairs norm over (K, I) per output channel; transposed-conv pairs
    over (K, O) per input channel — distinguished by g's length matching
    v.shape[2] (O) vs v.shape[1] (I); square upsamplers (I == O) are
    transposed convs in this model, handled by key name.
    """
    def fuse(tree, is_transpose=False):
        if isinstance(tree, dict):
            if "g" in tree and "v" in tree:
                v, g = tree["v"], tree["g"]
                if is_transpose:
                    norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 2), keepdims=True) + 1e-12)
                    w = g[None, :, None] * v / norm
                else:
                    axes = (0, 1) if v.ndim == 3 else tuple(range(v.ndim - 1))
                    norm = jnp.sqrt(jnp.sum(v ** 2, axis=axes, keepdims=True) + 1e-12)
                    w = g * v / norm if v.ndim != 3 else g[None, None, :] * v / norm
                out = {"w": w}
                if "b" in tree:
                    out["b"] = tree["b"]
                return out
            return {k: fuse(val, is_transpose=(k == "upsample"))
                    for k, val in tree.items()}
        if isinstance(tree, list):
            return [fuse(item, is_transpose) for item in tree]
        return tree

    return fuse(params)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _kp_trunk(p: dict, cond: jnp.ndarray, cfg: ModelConfig, dtype):
    """Shared kernel-predictor trunk: input conv + residual stack."""
    c = fnn.conv1d(p["input_conv"], cond, compute_dtype=dtype, impl=cfg.conv_impl)
    c = fnn.leaky_relu(c, 0.1)
    r = c
    for conv in p["residual_convs"]:
        r = fnn.conv1d(conv, r, compute_dtype=dtype, impl=cfg.conv_impl)
        r = fnn.leaky_relu(r, 0.1)
    return c + r


def _kernel_predictor_apply(p: dict, cond: jnp.ndarray, cfg: ModelConfig,
                            dtype) -> tuple:
    """cond (B, T', cond_ch) -> kernels (B, layers, T', K, Cin, 2Cin),
    biases (B, layers, T', 2Cin).

    The big kernel_conv is a (T' x 3*hidden) @ (3*hidden x l_w) matmul — the
    single largest MXU op in the model.
    """
    cin = cfg.inner_channels
    cout = 2 * cfg.inner_channels
    layers = cfg.lvc_layers_each_block
    k = cfg.lvc_kernel_size

    c = _kp_trunk(p, cond, cfg, dtype)
    kw = fnn.conv1d(p["kernel_conv"], c, compute_dtype=dtype, impl=cfg.conv_impl)
    kb = fnn.conv1d(p["bias_conv"], c, compute_dtype=dtype, impl=cfg.conv_impl)

    b, frames, _ = kw.shape
    # kernel_conv output channels are stored in (layers, K, Cin, Cout) order
    # — our init is permutation-invariant and the torch importer permutes
    # from the reference's (layers, Cin, Cout, K) C-order (modules.py:333-338)
    # at load time — so this reshape is layout-free: no transpose of the
    # model's largest activation tensor.
    kernels = kw.reshape(b, frames, layers, k, cin, cout)
    biases = kb.reshape(b, frames, layers, cout)
    return kernels, biases


def _kernel_predictor_apply_aug(p: dict, cond: jnp.ndarray, cfg: ModelConfig,
                                dtype) -> jnp.ndarray:
    """cond (B, T', cond_ch) -> augmented LVC operand
    (B, T', layers, K*Cin+1, 2Cin) for the whole-block Pallas megakernel.

    The kernel_conv and bias_conv heads are merged at trace time into one
    conv whose output channels are ordered (layers, K*Cin rows + bias row,
    2Cin) — the reshape to the megakernel operand is then layout-free, so
    the model's largest activation tensor is produced DIRECTLY in the
    layout the kernel consumes (no augmentation or relayout copies in HBM;
    those cost more than the kernel itself — docs/PERF.md)."""
    cin = cfg.inner_channels
    cout = 2 * cfg.inner_channels
    layers = cfg.lvc_layers_each_block
    k = cfg.lvc_kernel_size
    rows = k * cin + 1

    kw = fnn.conv_weight(p["kernel_conv"])       # (ksz, hid, layers*K*Cin*2Cin)
    bw = fnn.conv_weight(p["bias_conv"])         # (ksz, hid, layers*2Cin)
    ksz, hid, _ = kw.shape
    aug_w = jnp.concatenate(
        [kw.reshape(ksz, hid, layers, k * cin, cout),
         bw.reshape(ksz, hid, layers, 1, cout)], axis=3
    ).reshape(ksz, hid, layers * rows * cout)
    aug_b = jnp.concatenate(
        [p["kernel_conv"]["b"].reshape(layers, k * cin, cout),
         p["bias_conv"]["b"].reshape(layers, 1, cout)], axis=1).reshape(-1)

    c = _kp_trunk(p, cond, cfg, dtype)
    b, frames, _ = c.shape
    backend = jax.default_backend()
    if backend == "gpu":
        ka = fnn.conv1d({"w": aug_w, "b": aug_b}, c, compute_dtype=dtype,
                        impl=cfg.conv_impl)
    else:
        # the head as an explicit row-major pallas matmul: XLA's dot picks an
        # M-minor layout here and relayouts the model's largest activation
        # (see aug_head_matmul); taps built as shifted views of the trunk
        from fastdiff_tpu.ops.lvc_block_pallas import aug_head_matmul
        pad = (ksz - 1) // 2
        cp = jnp.pad(c.astype(dtype), ((0, 0), (pad, pad), (0, 0)))
        taps = [jax.lax.slice_in_dim(cp, t, t + frames, axis=1)
                for t in range(ksz)]
        tap_c = jnp.concatenate(taps, axis=-1).reshape(b * frames, ksz * hid)
        ka = aug_head_matmul(tap_c, aug_w.reshape(ksz * hid, -1).astype(dtype),
                             aug_b, interpret=(backend == "cpu"))
    return ka.reshape(b, frames, layers, rows, cout)


def _taug_head_operands(p: dict, cond: jnp.ndarray, cfg: ModelConfig, dtype):
    """Shared construction for the transposed-augmented predictor head:
    trunk taps (B, F, ksz*hid) + merged head weights (ksz*hid,
    layers*2Cin*rows_p) bf16 + bias (1, layers*2Cin*rows_p) f32, with the
    rows dimension zero-padded to the 128 lane tile (see
    _kernel_predictor_apply_taug for why the padding matters)."""
    cin = cfg.inner_channels
    cout = 2 * cfg.inner_channels
    layers = cfg.lvc_layers_each_block
    k = cfg.lvc_kernel_size
    rows = k * cin + 1
    rows_p = ((rows + 127) // 128) * 128

    kw = fnn.conv_weight(p["kernel_conv"])       # (ksz, hid, layers*K*Cin*2Cin)
    bw = fnn.conv_weight(p["bias_conv"])         # (ksz, hid, layers*2Cin)
    ksz, hid, _ = kw.shape
    aw = jnp.concatenate(
        [kw.reshape(ksz, hid, layers, k * cin, cout),
         bw.reshape(ksz, hid, layers, 1, cout)], axis=3)
    aw = jnp.swapaxes(aw, 3, 4)                  # (ksz, hid, layers, cout, rows)
    aw = jnp.pad(aw, ((0, 0),) * 4 + ((0, rows_p - rows),))
    w_head = aw.reshape(ksz * hid, layers * cout * rows_p).astype(dtype)
    ab = jnp.concatenate(
        [p["kernel_conv"]["b"].reshape(layers, k * cin, cout),
         p["bias_conv"]["b"].reshape(layers, 1, cout)], axis=1)
    ab = jnp.swapaxes(ab, 1, 2)                  # (layers, cout, rows)
    b_head = jnp.pad(ab, ((0, 0), (0, 0), (0, rows_p - rows))).reshape(
        1, -1).astype(jnp.float32)

    c = _kp_trunk(p, cond, cfg, dtype)
    b, frames, _ = c.shape
    pad = (ksz - 1) // 2
    cp = jnp.pad(c.astype(dtype), ((0, 0), (pad, pad), (0, 0)))
    taps = [jax.lax.slice_in_dim(cp, t, t + frames, axis=1)
            for t in range(ksz)]
    tap_c = jnp.concatenate(taps, axis=-1)       # (B, F, ksz*hid)
    return tap_c, w_head, b_head, rows_p


def _kernel_predictor_apply_taug(p: dict, cond: jnp.ndarray, cfg: ModelConfig,
                                 dtype) -> jnp.ndarray:
    """cond (B, T', cond_ch) -> TRANSPOSED augmented LVC operand
    (B, T', layers, 2Cin, K*Cin+1) for the NCL time-in-lanes megakernel.

    Same trace-time head merge as _kernel_predictor_apply_aug, but the
    merged conv's output channels are ordered (layers, 2Cin, rows) with the
    rows dimension ZERO-PADDED to a lane-tile multiple (97 -> 128 at the
    production width).  The padding is what makes the reshape to the NCL
    kernel's 5D ``kern_taug`` operand an actual bitcast: with minor dim 97
    the target tiled layout lane-pads 97->128, so XLA materializes a
    relayout of the model's largest activation (2.36 ms/sampler,
    reshape.2508/2512 in the r4 device trace); with minor dim 128 the
    head+reshape slope-times 0.546 -> 0.144 ms per block call.  The NCL
    megakernel consumes the padded operand natively (lvc_block_ncl_aug
    slices the zero tail back off in registers)."""
    cout = 2 * cfg.inner_channels
    layers = cfg.lvc_layers_each_block

    tap_c, w_head, b_head, rows_p = _taug_head_operands(p, cond, cfg, dtype)
    b, frames, khead = tap_c.shape
    backend = jax.default_backend()
    if backend == "gpu":
        ksz = cfg.kpnet_conv_size
        ka = fnn.conv1d({"w": w_head.reshape(ksz, khead // ksz, -1),
                         "b": b_head.reshape(-1)},
                        _kp_trunk(p, cond, cfg, dtype), compute_dtype=dtype,
                        impl=cfg.conv_impl)
        return ka.reshape(b, frames, layers, cout, rows_p)
    from fastdiff_tpu.ops.lvc_block_pallas import (aug_head_matmul,
                                                   taug_head_matmul_5d)
    tap_2d = tap_c.reshape(b * frames, khead)
    if cout % 8 == 0:
        # canonical-layout emission: the megakernel's 5D operand comes out
        # of the head already tiled (cout, rows)-minor, so no relayout copy
        # ever materializes between head and megakernel
        ka = taug_head_matmul_5d(
            tap_2d, w_head, b_head.reshape(-1),
            layers, cout, rows_p, interpret=(backend == "cpu"))
        return ka.reshape(b, frames, layers, cout, rows_p)
    ka = aug_head_matmul(tap_2d, w_head, b_head.reshape(-1),
                         interpret=(backend == "cpu"))
    return ka.reshape(b, frames, layers, cout, rows_p)


def _dblock_apply(p: dict, x: jnp.ndarray, factor: int, dtype, impl="lax") -> jnp.ndarray:
    """DiffusionDBlock: nearest-downsample + 3 dilated convs + 1x1 residual
    (reference: modules.py:127-138)."""
    residual = fnn.conv1d(p["residual_dense"], x, compute_dtype=dtype, impl=impl)
    residual = fnn.nearest_downsample(residual, factor)
    x = fnn.nearest_downsample(x, factor)
    for i, conv in enumerate(p["convs"]):
        x = fnn.leaky_relu(x, 0.2)
        x = fnn.conv1d(conv, x, dilation=2 ** i, compute_dtype=dtype, impl=impl)
    return x + residual


def _lvc_block_apply(p: dict, x: jnp.ndarray, skip: jnp.ndarray,
                     mel: jnp.ndarray, t_emb: jnp.ndarray, ratio: int,
                     hop: int, cfg: ModelConfig, dtype) -> jnp.ndarray:
    """TimeAware LVC block (reference: modules.py:190-218).

    x (B, T/r, C) -> upsample x ratio -> 4 x [skip-add, dilated conv (3^i),
    LVC with per-frame kernels, gated residual] -> (B, T, C).
    """
    noise = fnn.dense(p["fc_t"], t_emb, compute_dtype=dtype)     # (B, cond_ch)
    cond = mel + noise[:, None, :].astype(mel.dtype)

    use_fused = False
    use_ncl_vjp = False
    if cfg.use_pallas_block == "ncl_vjp":
        # trainable NCL route: megakernel forward, unfused-recompute
        # backward (lvc_block_ncl's custom VJP) — differentiable end to
        # end because the kernel predictor stays on the unfused head
        from fastdiff_tpu.ops import lvc_block_ncl as _ncl
        use_ncl_vjp = _ncl.fusable(hop, mel.shape[1])
    elif cfg.use_pallas_block:
        # "ncl" never reaches here: fastdiff_apply routes it to the full
        # NCL forward (_fastdiff_apply_ncl) before block dispatch
        from fastdiff_tpu.ops.lvc_block_pallas import (fusable,
                                                       lvc_block_fused_aug,
                                                       stack_conv_weights)
        use_fused = fusable(hop, mel.shape[1])
    if use_fused:
        # zero-prep megakernel path: the predictor emits the augmented
        # operand directly (no kernels/biases intermediates)
        kern_aug = _kernel_predictor_apply_aug(
            p["kernel_predictor"], cond, cfg, dtype)
    else:
        kernels, biases = _kernel_predictor_apply(
            p["kernel_predictor"], cond, cfg, dtype)

    x = fnn.leaky_relu(x, 0.2)
    upsample_fn = (fnn.conv_transpose1d_dot if cfg.conv_impl == "dot"
                   else fnn.conv_transpose1d)
    x = upsample_fn(
        p["upsample"], x, stride=ratio,
        torch_padding=ratio // 2 + ratio % 2, output_padding=ratio % 2,
        compute_dtype=dtype)

    if use_ncl_vjp:
        from fastdiff_tpu.ops.lvc_block_ncl import lvc_block_ncl
        conv_ws = jnp.stack([fnn.conv_weight(cv) for cv in p["convs"]])
        conv_bs = jnp.stack([cv["b"] for cv in p["convs"]])
        return lvc_block_ncl(x, skip, kernels.astype(dtype),
                             biases.astype(jnp.float32),
                             conv_ws.astype(dtype),
                             conv_bs.astype(jnp.float32), hop,
                             jax.default_backend() == "cpu")

    if use_fused:
        wstack = stack_conv_weights(
            [fnn.conv_weight(cv) for cv in p["convs"]],
            [cv["b"] for cv in p["convs"]], dtype=dtype)
        # interpret mode keeps the integration path testable on CPU
        interp = jax.default_backend() == "cpu"
        return lvc_block_fused_aug(x, skip, kern_aug, wstack, hop, interp)

    for i in range(cfg.lvc_layers_each_block):
        x = x + skip
        y = fnn.leaky_relu(x, 0.2)
        y = fnn.conv1d(p["convs"][i], y, dilation=3 ** i, compute_dtype=dtype,
                       impl=cfg.conv_impl)
        y = fnn.leaky_relu(y, 0.2)
        x = lvc_gated_residual(x, y, kernels[:, :, i].astype(dtype),
                               biases[:, :, i].astype(jnp.float32), hop)
    return x


def _dblock_apply_ncl(p: dict, x: jnp.ndarray, factor: int, dtype,
                      pre_downsampled: bool = False) -> jnp.ndarray:
    """``_dblock_apply`` twin for NCL (B, C, L) activations.

    The 1x1 residual conv is commuted past the downsample (pointwise in
    time, so bit-exact): one lane-strided downsample per block instead of
    two, and the residual dot runs at 1/factor the rate.
    ``pre_downsampled``: the caller already produced x at the block's
    output rate (the first block fuses the downsample into the strided
    audio conv)."""
    if not pre_downsampled:
        x = fnn.nearest_downsample_ncl(x, factor)
    residual = fnn.conv1d_ncl(p["residual_dense"], x, compute_dtype=dtype)
    for i, conv in enumerate(p["convs"]):
        x = fnn.leaky_relu(x, 0.2)
        x = fnn.conv1d_ncl(conv, x, dilation=2 ** i, compute_dtype=dtype)
    return x + residual


def _lvc_block_apply_ncl(p: dict, x: jnp.ndarray, skip: jnp.ndarray,
                         mel: jnp.ndarray, t_emb: jnp.ndarray, ratio: int,
                         hop: int, cfg: ModelConfig, dtype,
                         final_wb=None, fused_head: bool = False,
                         train_sr: bool = False):
    """``_lvc_block_apply`` twin for NCL activations: x (B, C, L/ratio),
    skip (B, C, L) -> (B, C, L).  Fusable blocks call the NCL megakernel
    directly (no NWC<->NCL boundary transposes at all); the non-fusable
    hop-8 block bridges to the NWC XLA inner loop at its small rate.

    ``final_wb`` (8, C): when given and the block is fused, the model's
    final k=7 C->1 conv runs as an in-kernel epilogue and the return is
    (block_out, final_out (B, 1, L) f32).

    ``fused_head``: run the predictor-head matmul INSIDE the megakernel
    (lvc_block_ncl_fh) so the 5D kern_taug operand never exists in HBM.

    ``train_sr``: trainable saved-residual route — the fused kernel emits
    per-layer intermediates and the VJP is manual NCL math with no forward
    recompute (ops/lvc_block_ncl.lvc_block_ncl_taug_sr)."""
    noise = fnn.dense(p["fc_t"], t_emb, compute_dtype=dtype)     # (B, cond_ch)
    cond = mel + noise[:, None, :].astype(mel.dtype)

    from fastdiff_tpu.ops.lvc_block_ncl import (FH_MAX_B, FH_MAX_HOP,
                                                fusable, lvc_block_ncl_aug,
                                                lvc_block_ncl_fh,
                                                lvc_block_ncl_taug_sr,
                                                wstack_t_from)
    use_fused = fusable(hop, mel.shape[1])
    # Under the plain "ncl" policy the separate taug head beats the
    # in-kernel one at every batch (FH_MAX_B = 0 — see the r5c/r5g settle
    # in ops/lvc_block_ncl.py); the knob and the fh kernel stay for the
    # explicit "ncl_fh" policy and for re-measurement on future hardware.
    fused_head = fused_head or (hop <= FH_MAX_HOP
                                and x.shape[0] <= FH_MAX_B)

    x = fnn.leaky_relu(x, 0.2)
    x = fnn.conv_transpose1d_ncl(
        p["upsample"], x, stride=ratio,
        torch_padding=ratio // 2 + ratio % 2, output_padding=ratio % 2,
        compute_dtype=dtype)

    if use_fused:
        from fastdiff_tpu.ops.lvc_block_pallas import stack_conv_weights
        wstack = stack_conv_weights(
            [fnn.conv_weight(cv) for cv in p["convs"]],
            [cv["b"] for cv in p["convs"]], dtype=dtype)
        interp = jax.default_backend() == "cpu"
        if train_sr:
            kern_taug = _kernel_predictor_apply_taug(
                p["kernel_predictor"], cond, cfg, dtype)
            return lvc_block_ncl_taug_sr(
                x.astype(dtype), skip.astype(dtype), kern_taug.astype(dtype),
                wstack_t_from(wstack).astype(dtype), hop, interp)
        if fused_head and 2 * cfg.inner_channels % 8 == 0:
            tap_c, w_head, b_head, _ = _taug_head_operands(
                p["kernel_predictor"], cond, cfg, dtype)
            return lvc_block_ncl_fh(x.astype(dtype), skip.astype(dtype),
                                    tap_c.astype(dtype), w_head, b_head,
                                    wstack_t_from(wstack).astype(dtype), hop,
                                    interpret=interp, final_wb=final_wb)
        kern_taug = _kernel_predictor_apply_taug(
            p["kernel_predictor"], cond, cfg, dtype)
        return lvc_block_ncl_aug(x.astype(dtype), skip.astype(dtype),
                                 kern_taug.astype(dtype),
                                 wstack_t_from(wstack).astype(dtype), hop,
                                 interpret=interp, final_wb=final_wb)

    kernels, biases = _kernel_predictor_apply(
        p["kernel_predictor"], cond, cfg, dtype)
    xw = jnp.swapaxes(x, 1, 2)
    sw = jnp.swapaxes(skip, 1, 2)
    for i in range(cfg.lvc_layers_each_block):
        xw = xw + sw
        y = fnn.leaky_relu(xw, 0.2)
        y = fnn.conv1d(p["convs"][i], y, dilation=3 ** i, compute_dtype=dtype,
                       impl=cfg.conv_impl)
        y = fnn.leaky_relu(y, 0.2)
        xw = lvc_gated_residual(xw, y, kernels[:, :, i].astype(dtype),
                                biases[:, :, i].astype(jnp.float32), hop)
    return jnp.swapaxes(xw, 1, 2)


def _fastdiff_apply_ncl(params: dict, audio: jnp.ndarray, mel: jnp.ndarray,
                        t: jnp.ndarray, cfg: ModelConfig, dtype,
                        fused_head: bool = False,
                        train_sr: bool = False) -> jnp.ndarray:
    """Full NCL (time-in-lanes) inference forward.

    Same math as ``fastdiff_apply``'s NWC path, but every activation is
    (B, C, L): elementwise ops run at full 128 lanes, conv taps are
    minor-dim shifts, and the NCL megakernel consumes its operands with
    zero boundary transposes — the (B, L, 32)<->(B, 32, L) transposes at
    full rate cost ~1.2 ms each in the device trace (docs/PERF.md).  The
    only remaining NWC bridge is the non-fusable hop-8 block at T/32.
    Audio in/out stay (B, T, 1): the (B, T, 1)<->(B, 1, T) reshapes are
    byte-identical (C == 1), so the sampler is layout-agnostic.
    Inference-only by default: the megakernel is called without a VJP
    wrapper (training runs the NWC path — config.resolve_pallas_block).
    With ``train_sr`` the fusable blocks run the saved-residual custom-VJP
    kernel instead (the trainable "ncl_sr" route), the final conv stays a
    standalone differentiable op, and everything else is native autodiff."""
    emb = diffusion_step_embedding(t, cfg.diffusion_step_embed_dim_in)
    emb = fnn.swish(fnn.dense(params["fc_t1"], emb))
    emb = fnn.swish(fnn.dense(params["fc_t2"], emb))      # (B, 512) f32

    n_blocks = len(cfg.upsample_ratios)
    factors = tuple(cfg.upsample_ratios[::-1])
    b, length, _ = audio.shape
    a_ncl = jnp.reshape(audio.astype(dtype), (b, 1, length))
    x = fnn.conv1d_ncl(params["first_audio_conv"], a_ncl, compute_dtype=dtype)
    skips = []
    for n, dblock in enumerate(params["downsample"]):
        skips.append(x)
        # (a strided-conv-from-audio variant of the first downsample —
        # exact, 2.4x cheaper in isolation — measured 0.2 ms/fwd SLOWER in
        # context; the lane-strided slice stays)
        x = _dblock_apply_ncl(dblock, x, factors[n], dtype)

    hops = cfg.cond_hop_lengths
    fw = fnn.conv_weight(params["final_conv"])
    use_epilogue = fw.shape[0] == 7 and fw.shape[2] == 1 and not train_sr
    final_wb = None
    if use_epilogue:
        # (8, C): 7 final-conv taps + a bias row, consumed by the last
        # megakernel call's epilogue (the standalone C->1 conv costs
        # 0.56 ms/sampler at b=1 in 1D layouts — see conv1d_ncl)
        final_wb = jnp.concatenate(
            [fw[:, :, 0], jnp.full((1, fw.shape[1]),
                                   params["final_conv"]["b"][0])],
            axis=0).astype(dtype)
    for n, lvcb in enumerate(params["lvc_blocks"]):
        skip = skips[n_blocks - 1 - n]
        last = n == n_blocks - 1
        out = _lvc_block_apply_ncl(
            lvcb, x, skip, mel.astype(dtype), emb,
            cfg.upsample_ratios[n], hops[n], cfg, dtype,
            final_wb=final_wb if last else None, fused_head=fused_head,
            train_sr=train_sr)
        if last and isinstance(out, (tuple, list)):
            return jnp.reshape(out[1], (b, length, 1))
        x = out

    out = fnn.conv1d_ncl(params["final_conv"], x, compute_dtype=dtype)
    return jnp.reshape(out, (b, length, 1)).astype(jnp.float32)


def fastdiff_apply(params: dict, audio: jnp.ndarray, mel: jnp.ndarray,
                   t: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Epsilon prediction: audio (B, T, 1), mel (B, T', n_mels), t (B, 1) float.

    Returns (B, T, 1). Requires T == T' * prod(upsample_ratios).
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.use_pallas_block in ("ncl", "ncl_fh", "ncl_sr"):
        return _fastdiff_apply_ncl(
            params, audio, mel, t, cfg, dtype,
            fused_head=cfg.use_pallas_block == "ncl_fh",
            train_sr=cfg.use_pallas_block == "ncl_sr")

    emb = diffusion_step_embedding(t, cfg.diffusion_step_embed_dim_in)
    emb = fnn.swish(fnn.dense(params["fc_t1"], emb))
    emb = fnn.swish(fnn.dense(params["fc_t2"], emb))      # (B, 512) f32

    n_blocks = len(cfg.upsample_ratios)
    # downsample[n] shrinks by upsample_ratios[n_blocks-1-n] (FastDiff_model.py:63)
    factors = tuple(cfg.upsample_ratios[::-1])
    use_down_kernel = False
    if cfg.use_pallas_down and n_blocks == 3 and dtype == jnp.bfloat16:
        from fastdiff_tpu.ops.downpath_pallas import (downpath_fusable,
                                                      downpath_fused)
        use_down_kernel = downpath_fusable(audio.shape[1], factors)
    if use_down_kernel:
        # fused first-conv + DBlock chain: one VMEM-resident Pallas pass
        # (interpret mode keeps the integration path testable on CPU)
        *skips, x = downpath_fused(
            {"first_audio_conv": params["first_audio_conv"],
             "downsample": params["downsample"]},
            audio.astype(jnp.float32), factors,
            jax.default_backend() == "cpu")
    else:
        x = fnn.conv1d(params["first_audio_conv"], audio.astype(dtype),
                       compute_dtype=dtype, impl=cfg.conv_impl)
        skips = []
        for n, dblock in enumerate(params["downsample"]):
            skips.append(x)
            factor = cfg.upsample_ratios[n_blocks - 1 - n]
            x = _dblock_apply(dblock, x, factor, dtype, impl=cfg.conv_impl)

    hops = cfg.cond_hop_lengths
    for n, lvcb in enumerate(params["lvc_blocks"]):
        skip = skips[n_blocks - 1 - n]
        x = _lvc_block_apply(lvcb, x, skip, mel.astype(dtype), emb,
                             cfg.upsample_ratios[n], hops[n], cfg, dtype)

    out = fnn.conv1d(params["final_conv"], x, compute_dtype=dtype,
                     impl=cfg.conv_impl)
    return out.astype(jnp.float32)


def describe_params(params, name: str = "model") -> str:
    """Human-readable parameter summary (the reference prints arch + count
    via utils/__init__.py:267-277 print_arch/num_params)."""
    lines = [f"| {name}: {num_params(params) / 1e6:.3f}M params"]

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for key, val in tree.items():
                walk(val, f"{prefix}.{key}" if prefix else key)
        elif isinstance(tree, list):
            lines.append(f"|   {prefix}[0..{len(tree) - 1}]: "
                         f"{num_params(tree) / 1e6:.3f}M")
        else:
            pass
    walk(params, "")
    return "\n".join(lines)
