"""DiffWave-style WaveNet denoiser — the reference's alternative epsilon net.

Functional re-design of the reference WaveNet vocoder
(reference: modules/FastDiff/module/WaveNet.py:42-188): an initial 1x1 conv,
N residual blocks with cycled dilations 2^(n % cycle), gated tanh/sigmoid
units, per-block mel conditioning, and a skip-sum head:

    block n: h = x + fc_t(t_emb);  h = dilated_conv(h) (-> 2C)
             h += mel_conv(upsample(mel));  out = tanh(h_a)*sigmoid(h_b)
             x <- (x + res_conv(out)) * sqrt(0.5);  skip += skip_conv(out)
    head:    relu(conv1x1(skip_sum / sqrt(N))) -> zero-init 1x1 conv

The reference upsamples the mel inside *every* block with that block's own
pair of ConvTranspose2d(1, 1, (3, 2s), stride=(1, s)) filters
(WaveNet.py:55-64, s=8 multiband / s=16 fullband); semantics (and per-block
weights) are preserved here, expressed as an input-dilated 2-D convolution
in NHWC. Like the FastDiff denoiser, everything is parameter pytrees + a
pure apply in NWC layout. Not referenced by any task in the reference
(SURVEY.md C5) but part of the public model surface.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.models.fastdiff import diffusion_step_embedding
from fastdiff_tpu.ops import nn as fnn


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    in_channels: int = 1
    res_channels: int = 64
    skip_channels: int = 64
    out_channels: int = 1
    num_res_layers: int = 30
    dilation_cycle: int = 10
    noise_scale_embed_dim_in: int = 128
    noise_scale_embed_dim_mid: int = 512
    noise_scale_embed_dim_out: int = 512
    multiband: bool = True
    cond_channels: int = 80
    compute_dtype: str = "bfloat16"

    @property
    def upsample_strides(self) -> Tuple[int, int]:
        s = 8 if self.multiband else 16
        return (s, s)

    @classmethod
    def from_hparams(cls, hp: dict) -> "WaveNetConfig":
        return cls(
            in_channels=int(hp.get("audio_channels", 1)),
            res_channels=int(hp.get("res_channels", 64)),
            skip_channels=int(hp.get("skip_channels", 64)),
            out_channels=int(hp.get("audio_channels", 1)),
            num_res_layers=int(hp.get("num_res_layers", 30)),
            dilation_cycle=int(hp.get("dilation_cycle", 10)),
            noise_scale_embed_dim_in=int(hp.get("diffusion_step_embed_dim_in", 128)),
            noise_scale_embed_dim_mid=int(hp.get("diffusion_step_embed_dim_mid", 512)),
            noise_scale_embed_dim_out=int(hp.get("diffusion_step_embed_dim_out", 512)),
            multiband=bool(hp.get("multiband", True)),
            cond_channels=int(hp.get("cond_channels", 80)),
            compute_dtype=str(hp.get("compute_dtype", "bfloat16")),
        )


def _kaiming_conv_init(key, in_ch, out_ch, k, weight_norm=True):
    """Weight-normed conv with kaiming-normal v (WaveNet.py:13-19 style)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k
    std = math.sqrt(2.0 / fan_in)
    v = jax.random.normal(kw, (k, in_ch, out_ch)) * std
    b = jax.random.uniform(kb, (out_ch,), minval=-1 / math.sqrt(fan_in),
                           maxval=1 / math.sqrt(fan_in))
    if weight_norm:
        return {"v": v, "g": jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1))), "b": b}
    return {"w": v, "b": b}


def _upsampler_init(key, stride: int):
    """One ConvTranspose2d(1, 1, (3, 2*stride)) with weight norm
    (WaveNet.py:60-64); stored flipped as (KH, KW, 1, 1)."""
    k = jax.random.normal(key, (3, 2 * stride, 1, 1)) * math.sqrt(2.0 / (3 * 2 * stride))
    g = jnp.sqrt(jnp.sum(k ** 2))
    return {"v": k, "g": g, "b": jnp.zeros((1,))}


def init_wavenet(key, cfg: WaveNetConfig) -> dict:
    keys = jax.random.split(key, 4 + cfg.num_res_layers)
    params = {
        "init_conv": _kaiming_conv_init(keys[0], cfg.in_channels,
                                        cfg.res_channels, 1),
        "fc_t1": fnn.dense_init(keys[1], cfg.noise_scale_embed_dim_in,
                                cfg.noise_scale_embed_dim_mid),
        "fc_t2": fnn.dense_init(keys[2], cfg.noise_scale_embed_dim_mid,
                                cfg.noise_scale_embed_dim_out),
        "final_conv": _kaiming_conv_init(keys[3], cfg.skip_channels,
                                         cfg.skip_channels, 1),
        # zero-init output projection (WaveNet.py:28-37)
        "out_conv": {"w": jnp.zeros((1, cfg.skip_channels, cfg.out_channels)),
                     "b": jnp.zeros((cfg.out_channels,))},
        "blocks": [],
    }
    for n in range(cfg.num_res_layers):
        bk = jax.random.split(keys[4 + n], 7)
        params["blocks"].append({
            "fc_t": fnn.dense_init(bk[0], cfg.noise_scale_embed_dim_out,
                                   cfg.res_channels),
            "dilated_conv": _kaiming_conv_init(bk[1], cfg.res_channels,
                                               2 * cfg.res_channels, 3),
            "upsamplers": [_upsampler_init(bk[2 + i], s)
                           for i, s in enumerate(cfg.upsample_strides)],
            "mel_conv": _kaiming_conv_init(bk[4], cfg.cond_channels,
                                           2 * cfg.res_channels, 1),
            "res_conv": _kaiming_conv_init(bk[5], cfg.res_channels,
                                           cfg.res_channels, 1),
            "skip_conv": _kaiming_conv_init(bk[6], cfg.res_channels,
                                            cfg.skip_channels, 1),
        })
    return params


def _upsample_mel(upsamplers, mel: jnp.ndarray, strides, length: int,
                  dtype) -> jnp.ndarray:
    """mel (B, T', n_mels) -> (B, length, n_mels) via two input-dilated 2-D
    convs with leaky-relu(0.4) (WaveNet.py:94-102)."""
    # NHWC: (B, n_mels, T', 1)
    x = mel.swapaxes(1, 2)[..., None].astype(dtype)
    for up, s in zip(upsamplers, strides):
        v = up["v"]
        norm = jnp.sqrt(jnp.sum(v ** 2) + 1e-12)
        w = (up["g"] * v / norm).astype(dtype)
        # torch ConvTranspose2d k=(3, 2s), stride=(1, s), pad=(1, s//2):
        # as lhs-dilated conv, edge pad (k-1-p) per dim.
        # no preferred_element_type: f32-output convs on bf16 operands break
        # under value_and_grad (VJP convolves the f32 cotangent with bf16
        # weights; see models/pwg.py:_conv_nobias)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=[(1, 1), (2 * s - 1 - s // 2, 2 * s - 1 - s // 2)],
            lhs_dilation=(1, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + up["b"].astype(x.dtype)
        x = fnn.leaky_relu(x, 0.4).astype(dtype)
    x = x[..., 0].swapaxes(1, 2)          # (B, T, n_mels)
    return x[:, :length, :]


_APPLY_FNS: dict = {}


def get_apply_fn(cfg: "WaveNetConfig"):
    """Identity-stable ``apply(params, x, mel, t)`` per frozen config (same
    contract as models.fastdiff.get_apply_fn: a stable static jit key so the
    param-traced sampler shares compiles across states/instances)."""
    fn = _APPLY_FNS.get(cfg)
    if fn is None:
        def fn(params, x, mel, t):
            return wavenet_apply(params, x, mel, t, cfg)
        _APPLY_FNS[cfg] = fn
    return fn


def wavenet_apply(params: dict, audio: jnp.ndarray, mel: jnp.ndarray,
                  t: jnp.ndarray, cfg: WaveNetConfig) -> jnp.ndarray:
    """Epsilon prediction: audio (B, T, C_in), mel (B, T', n_mels),
    t (B, 1) -> (B, T, C_out)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    c = cfg.res_channels
    length = audio.shape[1]

    emb = diffusion_step_embedding(t, cfg.noise_scale_embed_dim_in)
    emb = fnn.swish(fnn.dense(params["fc_t1"], emb))
    emb = fnn.swish(fnn.dense(params["fc_t2"], emb))

    x = fnn.conv1d(params["init_conv"], audio.astype(dtype), compute_dtype=dtype)
    x = jax.nn.relu(x)

    skip_sum = jnp.zeros((audio.shape[0], length, cfg.skip_channels), jnp.float32)
    for n, blk in enumerate(params["blocks"]):
        dilation = 2 ** (n % cfg.dilation_cycle)
        part_t = fnn.dense(blk["fc_t"], emb, compute_dtype=dtype)
        h = x + part_t[:, None, :].astype(x.dtype)
        h = fnn.conv1d(blk["dilated_conv"], h, dilation=dilation,
                       compute_dtype=dtype)
        cond = _upsample_mel(blk["upsamplers"], mel, cfg.upsample_strides,
                             length, dtype)
        h = h + fnn.conv1d(blk["mel_conv"], cond, compute_dtype=dtype)
        out = jnp.tanh(h[..., :c]) * jax.nn.sigmoid(h[..., c:])
        res = fnn.conv1d(blk["res_conv"], out, compute_dtype=dtype)
        x = (x + res) * np.float32(math.sqrt(0.5))
        skip_sum = skip_sum + fnn.conv1d(blk["skip_conv"], out,
                                         compute_dtype=dtype)

    skip = skip_sum * np.float32(math.sqrt(1.0 / cfg.num_res_layers))
    skip = jax.nn.relu(fnn.conv1d(params["final_conv"], skip.astype(dtype),
                                  compute_dtype=dtype))
    out = fnn.conv1d(params["out_conv"], skip, compute_dtype=dtype)
    return out.astype(jnp.float32)
