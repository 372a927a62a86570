"""Parallel WaveGAN generator — the reference's default analysis vocoder.

Functional JAX re-design of the vendored PWG generator the reference uses to
synthesize from mels when ``vocoder: pwg``
(reference: modules/parallel_wavegan/models/parallel_wavegan.py:234-427,
modules/parallel_wavegan/layers/residual_block.py:39-130,
modules/parallel_wavegan/layers/upsample.py:16-160):

    noise (B, T, 1) -> 1x1 conv -> 30 gated residual blocks (dilations
    2^(l % 10)), each conditioned on the upsampled mel via a bias-free 1x1
    conv; skip-sum / sqrt(30) -> relu-1x1-relu-1x1 -> waveform.

    mel upsampling (ConvInUpsampleNetwork): context conv1d (k = 2*window+1,
    bias-free) then per-scale [nearest time-stretch xS, shared bias-free
    (1, 2S+1) smoothing filter] for scales [4, 4, 4, 4].

Inference-only module (the reference never trains it either — it loads
released checkpoints, vocoders/pwg.py:26-50); weight-normed parameters are
imported fused. Layout NWC, bf16 compute with f32 accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.ops import nn as fnn


@dataclasses.dataclass(frozen=True)
class PWGConfig:
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    compute_dtype: str = "bfloat16"

    @property
    def layers_per_stack(self) -> int:
        return self.layers // self.stacks

    @classmethod
    def from_hparams(cls, hp: dict) -> "PWGConfig":
        """Build from the flat hparams dict (the ``denoiser: pwg`` family)."""
        return cls(
            kernel_size=int(hp.get("pwg_kernel_size", 3)),
            layers=int(hp.get("pwg_layers", 30)),
            stacks=int(hp.get("pwg_stacks", 3)),
            residual_channels=int(hp.get("pwg_residual_channels", 64)),
            gate_channels=int(hp.get("pwg_gate_channels", 128)),
            skip_channels=int(hp.get("pwg_skip_channels", 64)),
            aux_channels=int(hp.get("audio_num_mel_bins", 80)),
            aux_context_window=int(hp.get("pwg_aux_context_window", 2)),
            upsample_scales=tuple(hp.get("pwg_upsample_scales", (4, 4, 4, 4))),
            compute_dtype=str(hp.get("compute_dtype", "bfloat16")),
        )


_PWG_APPLY_FNS: dict = {}


def get_apply_fn(cfg: PWGConfig):
    """Identity-stable diffusion-PWG ``apply(params, x, mel, t)`` per frozen
    config — the static jit key for the param-traced sampler (same contract
    as models.fastdiff.get_apply_fn)."""
    fn = _PWG_APPLY_FNS.get(cfg)
    if fn is None:
        def fn(params, x, mel, t):
            return pwg_diffusion_apply(params, x, mel, t, cfg)
        _PWG_APPLY_FNS[cfg] = fn
    return fn


def init_pwg(key, cfg: PWGConfig) -> dict:
    """Random init (torch-default uniform); real use imports checkpoints."""
    keys = jax.random.split(key, 5 + cfg.layers + len(cfg.upsample_scales))
    params = {
        "first_conv": fnn.conv1d_init(keys[0], cfg.in_channels,
                                      cfg.residual_channels, 1),
        "conv_in": _no_bias(fnn.conv1d_init(
            keys[1], cfg.aux_channels, cfg.aux_channels,
            2 * cfg.aux_context_window + 1)),
        "up_convs": [
            {"w": jnp.full((1, 2 * s + 1, 1, 1), 1.0 / (2 * s + 1))}
            for s in cfg.upsample_scales
        ],
        "last_conv1": fnn.conv1d_init(keys[2], cfg.skip_channels,
                                      cfg.skip_channels, 1),
        "last_conv2": fnn.conv1d_init(keys[3], cfg.skip_channels,
                                      cfg.out_channels, 1),
        "blocks": [],
    }
    for layer in range(cfg.layers):
        bk = jax.random.split(keys[5 + layer], 4)
        params["blocks"].append({
            "conv": fnn.conv1d_init(bk[0], cfg.residual_channels,
                                    cfg.gate_channels, cfg.kernel_size),
            "aux_conv": _no_bias(fnn.conv1d_init(
                bk[1], cfg.aux_channels, cfg.gate_channels, 1)),
            "out_conv": fnn.conv1d_init(bk[2], cfg.gate_channels // 2,
                                        cfg.residual_channels, 1),
            "skip_conv": fnn.conv1d_init(bk[3], cfg.gate_channels // 2,
                                         cfg.skip_channels, 1),
        })
    return params


def _no_bias(p: dict) -> dict:
    return {k: v for k, v in p.items() if k != "b"}


def _conv_nobias(p: dict, x, dilation=1, dtype=None, valid=False):
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    k = w.shape[0]
    pad = 0 if valid else dilation * ((k - 1) // 2)
    # no preferred_element_type here: with bf16 operands an f32-output conv
    # breaks under value_and_grad (the VJP convolves the f32 cotangent with
    # the bf16 weights -> dtype-mismatch TypeError; hit by bf16 training of
    # the diffusion-PWG denoiser, r4).  The MXU still accumulates in f32
    # internally; only the stored output is rounded to the compute dtype,
    # matching every other conv in this model (fnn.conv1d compute_dtype).
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def upsample_mel(params: dict, mel: jnp.ndarray, cfg: PWGConfig,
                 dtype) -> jnp.ndarray:
    """ConvInUpsampleNetwork: (B, T', aux) -> (B, T' * prod(scales), aux).

    The reference edge-pads the mel by the context window on the host and
    runs conv_in without padding (vocoders/pwg.py:88-95, upsample.py:157);
    the edge-pad happens here instead, so callers pass the raw T' mel.
    """
    w = params["conv_in"]["w"].shape[0] // 2
    mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
    c = _conv_nobias(params["conv_in"], mel.astype(dtype), dtype=dtype,
                     valid=True)
    c = c.astype(dtype)
    for up, s in zip(params["up_convs"], cfg.upsample_scales):
        b, t, ch = c.shape
        c = jnp.repeat(c, s, axis=1)                       # nearest stretch
        # shared single filter across channels: NHWC with H=ch, W=time, C=1
        x = c.swapaxes(1, 2)[..., None]                    # (B, ch, T, 1)
        w = up["w"].astype(dtype)                          # (1, 2s+1, 1, 1)
        # no preferred_element_type: f32-output convs on bf16 operands
        # break under value_and_grad (see _conv_nobias)
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (1, 1), [(0, 0), (s, s)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = x[..., 0].swapaxes(1, 2).astype(dtype)
    return c


def pwg_apply(params: dict, noise: jnp.ndarray, mel: jnp.ndarray,
              cfg: PWGConfig) -> jnp.ndarray:
    """noise (B, T, 1), mel (B, T', aux) -> waveform (B, T, 1); requires
    T == T' * prod(upsample_scales)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    g2 = cfg.gate_channels // 2

    c = upsample_mel(params, mel, cfg, dtype)
    assert c.shape[1] == noise.shape[1], (c.shape, noise.shape)

    x = fnn.conv1d(params["first_conv"], noise.astype(dtype),
                   compute_dtype=dtype)
    skips = jnp.zeros((noise.shape[0], noise.shape[1], cfg.skip_channels),
                      jnp.float32)
    for layer, blk in enumerate(params["blocks"]):
        dilation = 2 ** (layer % cfg.layers_per_stack)
        h = fnn.conv1d(blk["conv"], x, dilation=dilation, compute_dtype=dtype)
        h = h + _conv_nobias(blk["aux_conv"], c, dtype=dtype).astype(h.dtype)
        gated = jnp.tanh(h[..., :g2]) * jax.nn.sigmoid(h[..., g2:])
        gated = gated.astype(dtype)
        skips = skips + fnn.conv1d(blk["skip_conv"], gated, compute_dtype=dtype)
        x = ((fnn.conv1d(blk["out_conv"], gated, compute_dtype=dtype)
              .astype(x.dtype) + x) * np.float32(math.sqrt(0.5))).astype(dtype)

    s = skips * np.float32(math.sqrt(1.0 / cfg.layers))
    s = jax.nn.relu(s).astype(dtype)
    s = jax.nn.relu(fnn.conv1d(params["last_conv1"], s, compute_dtype=dtype))
    out = fnn.conv1d(params["last_conv2"], s.astype(dtype), compute_dtype=dtype)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Diffusion-conditioned variant (completes the reference's generator zoo)
# ---------------------------------------------------------------------------

def init_pwg_diffusion(key, cfg: PWGConfig, embed_in: int = 128,
                       embed_mid: int = 512, embed_out: int = 512) -> dict:
    """ParallelWaveGANGenerator_Diffusion parameters.

    The diffusion variant (reference: modules/parallel_wavegan/models/
    parallel_wavegan.py:23-231, layers/residual_block.py:132-227 — vendored
    but never instantiated by any in-repo task) is the base PWG generator
    plus a FastDiff-style diffusion-step embedding: a shared 128->512->512
    swish MLP and a per-block Linear(512 -> residual_channels) whose output
    is added to x before each residual block.
    """
    keys = jax.random.split(key, 3 + cfg.layers)
    params = init_pwg(keys[0], cfg)
    params["fc_t1"] = fnn.dense_init(keys[1], embed_in, embed_mid)
    params["fc_t2"] = fnn.dense_init(keys[2], embed_mid, embed_out)
    for layer in range(cfg.layers):
        params["blocks"][layer]["fc_t"] = fnn.dense_init(
            keys[3 + layer], embed_out, cfg.residual_channels)
    return params


def pwg_diffusion_apply(params: dict, x_t: jnp.ndarray, mel: jnp.ndarray,
                        t: jnp.ndarray, cfg: PWGConfig,
                        embed_in: int = 128) -> jnp.ndarray:
    """Diffusion eps-prediction forward: x_t (B, T, 1), mel (B, T', aux),
    t (B, 1) float (fractional steps supported) -> (B, T, 1).

    Reference forward: parallel_wavegan.py:155-199 + residual_block.py:
    188-227 (x += fc_t(embed) BEFORE the residual branch point).
    """
    from fastdiff_tpu.models.fastdiff import diffusion_step_embedding

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    g2 = cfg.gate_channels // 2

    emb = diffusion_step_embedding(t, embed_in)
    emb = fnn.swish(fnn.dense(params["fc_t1"], emb))
    emb = fnn.swish(fnn.dense(params["fc_t2"], emb))          # (B, 512) f32

    c = upsample_mel(params, mel, cfg, dtype)
    assert c.shape[1] == x_t.shape[1], (c.shape, x_t.shape)

    x = fnn.conv1d(params["first_conv"], x_t.astype(dtype), compute_dtype=dtype)
    skips = jnp.zeros((x_t.shape[0], x_t.shape[1], cfg.skip_channels),
                      jnp.float32)
    for layer, blk in enumerate(params["blocks"]):
        dilation = 2 ** (layer % cfg.layers_per_stack)
        noise = fnn.dense(blk["fc_t"], emb, compute_dtype=dtype)
        x = x + noise[:, None, :].astype(x.dtype)             # pre-residual
        h = fnn.conv1d(blk["conv"], x, dilation=dilation, compute_dtype=dtype)
        h = h + _conv_nobias(blk["aux_conv"], c, dtype=dtype).astype(h.dtype)
        gated = jnp.tanh(h[..., :g2]) * jax.nn.sigmoid(h[..., g2:])
        gated = gated.astype(dtype)
        skips = skips + fnn.conv1d(blk["skip_conv"], gated, compute_dtype=dtype)
        x = ((fnn.conv1d(blk["out_conv"], gated, compute_dtype=dtype)
              .astype(x.dtype) + x) * np.float32(math.sqrt(0.5))).astype(dtype)

    s = skips * np.float32(math.sqrt(1.0 / cfg.layers))
    s = jax.nn.relu(s).astype(dtype)
    s = jax.nn.relu(fnn.conv1d(params["last_conv1"], s, compute_dtype=dtype))
    out = fnn.conv1d(params["last_conv2"], s.astype(dtype), compute_dtype=dtype)
    return out.astype(jnp.float32)


def convert_pwg_diffusion_state_dict(sd: dict, cfg: PWGConfig) -> dict:
    """Torch ParallelWaveGANGenerator_Diffusion state_dict -> pytree."""
    from fastdiff_tpu.utils.ckpt_import import _dense_from_torch

    params = convert_pwg_state_dict(sd, cfg)
    params["fc_t1"] = _dense_from_torch(sd, "fc_t1")
    params["fc_t2"] = _dense_from_torch(sd, "fc_t2")
    for layer in range(cfg.layers):
        params["blocks"][layer]["fc_t"] = _dense_from_torch(
            sd, f"conv_layers.{layer}.fc_t")
    return params


# ---------------------------------------------------------------------------
# Torch checkpoint import (released PWG checkpoints)
# ---------------------------------------------------------------------------

def convert_pwg_state_dict(sd: dict, cfg: PWGConfig) -> dict:
    """Released PWG generator state_dict -> our pytree (weight norm fused).

    Handles both ``model.generator.*``-nested and flat layouts
    (reference: vocoders/pwg.py:26-50 loads ``ckpt['state_dict']['model']``).
    """
    from fastdiff_tpu.utils.ckpt_import import _conv_from_torch, _np

    def conv(prefix, bias=True):
        p = _conv_from_torch(sd, prefix, fuse=True) if f"{prefix}.bias" in sd \
            else None
        if p is None:  # bias-free conv
            if f"{prefix}.weight_v" in sd:
                v = _np(sd[f"{prefix}.weight_v"]).astype(np.float32)
                g = _np(sd[f"{prefix}.weight_g"]).astype(np.float32).reshape(-1)
                v = v.transpose(2, 1, 0)
                norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
                return {"w": (g[None, None, :] * v / norm).astype(np.float32)}
            return {"w": _np(sd[f"{prefix}.weight"]).astype(np.float32)
                    .transpose(2, 1, 0)}
        return p

    def conv2d_up(prefix):
        if f"{prefix}.weight_v" in sd:                # weight-normed Conv2d
            v = _np(sd[f"{prefix}.weight_v"]).astype(np.float32)  # (O,I,KH,KW)
            g = _np(sd[f"{prefix}.weight_g"]).astype(np.float32).reshape(-1)
            norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
            w = g[:, None, None, None] * v / norm
        else:
            w = _np(sd[f"{prefix}.weight"]).astype(np.float32)
        return {"w": w.transpose(2, 3, 1, 0)}         # (KH, KW, I, O)

    params = {
        "first_conv": conv("first_conv"),
        "conv_in": conv("upsample_net.conv_in"),
        "up_convs": [conv2d_up(f"upsample_net.upsample.up_layers.{2 * i + 1}")
                     for i in range(len(cfg.upsample_scales))],
        "last_conv1": conv("last_conv_layers.1"),
        "last_conv2": conv("last_conv_layers.3"),
        "blocks": [],
    }
    for layer in range(cfg.layers):
        p = f"conv_layers.{layer}"
        params["blocks"].append({
            "conv": conv(f"{p}.conv"),
            "aux_conv": conv(f"{p}.conv1x1_aux"),
            "out_conv": conv(f"{p}.conv1x1_out"),
            "skip_conv": conv(f"{p}.conv1x1_skip"),
        })
    return params
