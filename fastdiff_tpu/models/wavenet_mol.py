"""r9y9-style autoregressive WaveNet vocoder with mixture-density output.

Completes the reference's generator zoo (C21): the vendored
`modules/wavenet_vocoder/**` (wavenet.py:64-485, modules.py:52-169,
upsample.py:29-85 — ~1.1k LoC of dead code there, never imported by any
task) rebuilt as a working TPU-native family:

- channel-last functional pytrees; teacher-forced forward as causal
  shifted convs (one jit, parallel over time) for likelihood/training;
- autoregressive synthesis as ONE ``lax.scan`` over time with O(1)
  per-layer ring buffers (the torch version's `incremental_forward`
  Python loop + linearized-conv buffers, reference wavenet.py:236-340,
  re-designed for XLA: static shapes, mod-indexed circular writes);
- the fold/unfold batched-generation trick (wavenet.py:361-470): chunk
  the conditioning into overlapping folds, synthesize all folds as a
  BATCH inside the scan (turning the tiny per-step matmuls into
  batch-fat MXU work — the TPU answer to AR generation), then
  equal-power crossfade;
- MoL / MoG / categorical (mulaw-quantize one-hot) output heads
  (ops/mixture.py).

Conditioning: local (mel) plus optional global/speaker conditioning
(reference wavenet.py:88-150: speaker-id embedding or raw (B, gin)
features, one bias-free 1x1 per residual block added to the full gate
pre-activation). Global features are time-constant, so both the parallel
forward and the AR scan precompute the per-block gate contributions once
and broadcast — the scan body never re-runs the g matmuls.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.ops import mixture


@dataclasses.dataclass(frozen=True)
class MoLWaveNetConfig:
    out_channels: int = 30            # 10 logistics x (pi, mu, log_s)
    layers: int = 24
    stacks: int = 4
    residual_channels: int = 128
    gate_channels: int = 256
    skip_channels: int = 128
    kernel_size: int = 3
    cin_channels: int = 80
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    scalar_input: bool = True         # False -> one-hot (mulaw-quantize)
    output_distribution: str = "Logistic"   # "Logistic" | "Normal"
    log_scale_min: float = -16.0
    compute_dtype: str = "float32"    # AR scan state is f32 by default
    gin_channels: int = 0             # 0 -> no global conditioning
    n_speakers: int = 0               # >0 -> id-embedding table (std 0.1)

    @property
    def layers_per_stack(self) -> int:
        return self.layers // self.stacks

    @property
    def in_channels(self) -> int:
        return 1 if self.scalar_input else self.out_channels

    @property
    def hop(self) -> int:
        h = 1
        for s in self.upsample_scales:
            h *= s
        return h

    def dilation(self, layer: int) -> int:
        return 2 ** (layer % self.layers_per_stack)

    @property
    def receptive_field(self) -> int:
        return (self.kernel_size - 1) * sum(
            self.dilation(i) for i in range(self.layers)) + 1

    @classmethod
    def from_hparams(cls, hp: dict) -> "MoLWaveNetConfig":
        """Build from the flat hparams dict (the AR-vocoder task family)."""
        return cls(
            out_channels=int(hp.get("wn_out_channels", 30)),
            layers=int(hp.get("wn_layers", 24)),
            stacks=int(hp.get("wn_stacks", 4)),
            residual_channels=int(hp.get("wn_residual_channels", 128)),
            gate_channels=int(hp.get("wn_gate_channels", 256)),
            skip_channels=int(hp.get("wn_skip_channels", 128)),
            kernel_size=int(hp.get("wn_kernel_size", 3)),
            cin_channels=int(hp.get("audio_num_mel_bins", 80)),
            upsample_scales=tuple(hp.get("wn_upsample_scales", (4, 4, 4, 4))),
            scalar_input=bool(hp.get("wn_scalar_input", True)),
            output_distribution=str(hp.get("wn_output_distribution",
                                           "Logistic")),
            compute_dtype=str(hp.get("wn_compute_dtype", "float32")),
            gin_channels=int(hp.get("wn_gin_channels", 0)),
            n_speakers=int(hp.get("wn_n_speakers", 0)),
        )


def init_wavenet_mol(key, cfg: MoLWaveNetConfig) -> dict:
    keys = jax.random.split(key, 5 + cfg.layers)
    params = {
        "first_conv": fnn.conv1d_init(keys[0], cfg.in_channels,
                                      cfg.residual_channels, 1),
        "conv_in": {"w": jnp.eye(cfg.cin_channels)[None]},   # k=1, cin_pad=0
        "up_convs": [
            {"w": jnp.full((1, 2 * s + 1, 1, 1), 1.0 / (2 * s + 1))}
            for s in cfg.upsample_scales],
        "last_conv1": fnn.conv1d_init(keys[1], cfg.skip_channels,
                                      cfg.skip_channels, 1),
        "last_conv2": fnn.conv1d_init(keys[2], cfg.skip_channels,
                                      cfg.out_channels, 1),
        "blocks": [],
    }
    if cfg.gin_channels > 0 and cfg.n_speakers > 0:
        params["embed_speakers"] = {
            "w": 0.1 * jax.random.normal(
                keys[3], (cfg.n_speakers, cfg.gin_channels), jnp.float32)}
    for layer in range(cfg.layers):
        bk = jax.random.split(keys[5 + layer], 5)
        blk = {
            "conv": fnn.conv1d_init(bk[0], cfg.residual_channels,
                                    cfg.gate_channels, cfg.kernel_size),
            "aux_conv": {"w": fnn.conv1d_init(
                bk[1], cfg.cin_channels, cfg.gate_channels, 1)["w"]},
            "out_conv": fnn.conv1d_init(bk[2], cfg.gate_channels // 2,
                                        cfg.residual_channels, 1),
            "skip_conv": fnn.conv1d_init(bk[3], cfg.gate_channels // 2,
                                         cfg.skip_channels, 1),
        }
        if cfg.gin_channels > 0:
            blk["g_conv"] = {"w": fnn.conv1d_init(
                bk[4], cfg.gin_channels, cfg.gate_channels, 1)["w"]}
        params["blocks"].append(blk)
    return params


def _conv1x1(p, x, dtype):
    w = p["w"][0].astype(dtype)                      # (I, O)
    y = jnp.einsum("...i,io->...o", x.astype(dtype), w,
                   preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(dtype)


def upsample_cond(params: dict, mel: jnp.ndarray, cfg: MoLWaveNetConfig,
                  dtype=jnp.float32) -> jnp.ndarray:
    """ConvInUpsampleNetwork (reference upsample.py:29-85, cin_pad=0,
    freq_axis_kernel_size=1): per scale, nearest time-stretch xS then a
    shared (1, 2S+1) smoothing filter. (B, T', cin) -> (B, T'*hop, cin)."""
    c = _conv1x1(params["conv_in"], mel, dtype)
    for up, s in zip(params["up_convs"], cfg.upsample_scales):
        c = jnp.repeat(c, s, axis=1)
        x = c.swapaxes(1, 2)[..., None]              # (B, cin, T, 1)
        w = up["w"].astype(dtype)                    # (1, 2s+1, 1, 1)
        # no preferred_element_type (bf16-training VJP dtype bug; see
        # models/pwg.py:_conv_nobias)
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (1, 1), [(0, 0), (s, s)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = x[..., 0].swapaxes(1, 2).astype(dtype)
    return c


def _g_gate_contribs(params: dict, g, cfg: MoLWaveNetConfig, dtype):
    """Per-block gate contributions of the global conditioning: g is
    speaker ids (B,)/(B, 1) int or features (B, gin) -> list of (B, gate)
    per layer, or None. Time-constant, so computed once outside any scan
    (reference expands g over T and re-convolves every step —
    wavenet.py:200, modules.py:148-152)."""
    if g is None:
        return None
    if cfg.gin_channels <= 0:
        raise ValueError("g passed but gin_channels == 0")
    g = jnp.asarray(g)
    if jnp.issubdtype(g.dtype, jnp.integer):
        g_emb = params["embed_speakers"]["w"][g.reshape(g.shape[0])]
    else:
        g_emb = g
    return [_conv1x1(blk["g_conv"], g_emb, dtype)
            for blk in params["blocks"]]


def _causal_conv(p, x, dilation, dtype):
    """Causal dilated conv: left-pad (k-1)*d then valid correlation
    (the reference pads both sides and truncates the right tail)."""
    w = fnn.conv_weight(p).astype(dtype)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), ((k - 1) * dilation, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), w, (1,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(dtype)


def wavenet_mol_apply(params: dict, x: jnp.ndarray, mel: jnp.ndarray,
                      cfg: MoLWaveNetConfig, g=None) -> jnp.ndarray:
    """Teacher-forced forward (reference wavenet.py:171-223): x (B, T,
    in_ch) [scalar in [-1,1] or one-hot], mel (B, T', cin) -> logits /
    mixture params (B, T, out_channels). T == T' * hop. Optional g:
    speaker ids (B,) int or global features (B, gin_channels)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    g2 = cfg.gate_channels // 2

    c = upsample_cond(params, mel, cfg, dtype)
    assert c.shape[1] == x.shape[1], (c.shape, x.shape)
    g_gate = _g_gate_contribs(params, g, cfg, dtype)

    h = _conv1x1(params["first_conv"], x, dtype)
    skips = jnp.zeros((x.shape[0], x.shape[1], cfg.skip_channels),
                      jnp.float32)
    for layer, blk in enumerate(params["blocks"]):
        residual = h
        z = _causal_conv(blk["conv"], h, cfg.dilation(layer), dtype)
        z = z + _conv1x1(blk["aux_conv"], c, dtype)
        if g_gate is not None:
            z = z + g_gate[layer][:, None, :].astype(dtype)
        gated = (jnp.tanh(z[..., :g2])
                 * jax.nn.sigmoid(z[..., g2:])).astype(dtype)
        skips = skips + _conv1x1(blk["skip_conv"], gated, dtype)
        h = ((_conv1x1(blk["out_conv"], gated, dtype) + residual)
             * np.float32(math.sqrt(0.5))).astype(dtype)

    s = (skips * np.float32(math.sqrt(1.0 / cfg.layers))).astype(dtype)
    s = jax.nn.relu(s)
    s = jax.nn.relu(_conv1x1(params["last_conv1"], s, dtype))
    out = _conv1x1(params["last_conv2"], s, dtype)
    return out.astype(jnp.float32)


def wavenet_mol_loss(params: dict, wav: jnp.ndarray, mel: jnp.ndarray,
                     cfg: MoLWaveNetConfig, g=None) -> jnp.ndarray:
    """Mean per-sample NLL with one-step teacher forcing (predict wav[t]
    from wav[<t]): the standard r9y9 training objective."""
    x_in = jnp.pad(wav[:, :-1], ((0, 0), (1, 0), (0, 0)))
    y_hat = wavenet_mol_apply(params, x_in, mel, cfg, g=g)
    n = wav.shape[0] * wav.shape[1]
    if not cfg.scalar_input:
        ids = jnp.argmax(wav, axis=-1)
        logp = jax.nn.log_softmax(y_hat, axis=-1)
        return -jnp.sum(jnp.take_along_axis(
            logp, ids[..., None], axis=-1)) / n
    if cfg.output_distribution == "Normal":
        return mixture.mix_gaussian_loss(
            y_hat, wav[..., 0], log_scale_min=cfg.log_scale_min) / n
    return mixture.discretized_mix_logistic_loss(
        y_hat, wav[..., 0], log_scale_min=cfg.log_scale_min) / n


# ---------------------------------------------------------------------------
# Autoregressive synthesis: one lax.scan with ring-buffer conv state
# ---------------------------------------------------------------------------

def _init_state(b: int, cfg: MoLWaveNetConfig, dtype) -> dict:
    return {
        "t": jnp.zeros((), jnp.int32),
        "bufs": [jnp.zeros((b, (cfg.kernel_size - 1) * cfg.dilation(i),
                            cfg.residual_channels), dtype)
                 for i in range(cfg.layers)],
    }


def _step_logits(params: dict, cfg: MoLWaveNetConfig, state: dict,
                 x_in: jnp.ndarray, c_t: jnp.ndarray, dtype, g_gate=None):
    """One AR step: x_in (B, in_ch), c_t (B, cin) -> (new_state, logits).

    Ring buffers hold each block's last (k-1)*d inputs; slot t mod len is
    read (it contains x[t - (k-1)d]) and then overwritten with x[t] — the
    same linearized-conv queue as the reference's incremental_forward,
    with static shapes for the scan. ``g_gate`` (from
    ``_g_gate_contribs``) carries the time-constant global-conditioning
    gate biases.
    """
    g2 = cfg.gate_channels // 2
    t = state["t"]
    new_bufs = []
    h = _conv1x1(params["first_conv"], x_in, dtype)
    skips = jnp.zeros((x_in.shape[0], cfg.skip_channels), jnp.float32)
    for layer, blk in enumerate(params["blocks"]):
        d = cfg.dilation(layer)
        k = cfg.kernel_size
        buf = state["bufs"][layer]
        blen = buf.shape[1]
        residual = h
        w = fnn.conv_weight(blk["conv"]).astype(dtype)   # (K, C, gate)
        # taps: w[K-1] * x[t], w[K-1-j] * x[t - j*d]
        z = jnp.einsum("bc,cg->bg", h.astype(dtype), w[k - 1],
                       preferred_element_type=jnp.float32)
        for j in range(1, k):
            slot = (t - j * d) % blen
            past = jax.lax.dynamic_index_in_dim(buf, slot, axis=1,
                                                keepdims=False)
            z = z + jnp.einsum("bc,cg->bg", past.astype(dtype), w[k - 1 - j],
                               preferred_element_type=jnp.float32)
        z = (z + blk["conv"]["b"]).astype(dtype)
        z = z + _conv1x1(blk["aux_conv"], c_t, dtype)
        if g_gate is not None:
            z = z + g_gate[layer].astype(dtype)
        gated = (jnp.tanh(z[..., :g2])
                 * jax.nn.sigmoid(z[..., g2:])).astype(dtype)
        skips = skips + _conv1x1(blk["skip_conv"], gated, dtype)
        new_bufs.append(jax.lax.dynamic_update_index_in_dim(
            buf, h.astype(buf.dtype), t % blen, axis=1))
        h = ((_conv1x1(blk["out_conv"], gated, dtype) + residual)
             * np.float32(math.sqrt(0.5))).astype(dtype)

    s = (skips * np.float32(math.sqrt(1.0 / cfg.layers))).astype(dtype)
    s = jax.nn.relu(s)
    s = jax.nn.relu(_conv1x1(params["last_conv1"], s, dtype))
    logits = _conv1x1(params["last_conv2"], s, dtype).astype(jnp.float32)
    return {"t": t + 1, "bufs": new_bufs}, logits


def wavenet_incremental_logits(params: dict, x_seq: jnp.ndarray,
                               mel: jnp.ndarray, cfg: MoLWaveNetConfig,
                               g=None) -> jnp.ndarray:
    """Teacher-forced logits THROUGH the incremental scan (B, T, in_ch) ->
    (B, T, out_ch). Must equal ``wavenet_mol_apply`` exactly — the
    correctness instrument for the ring-buffer state machine."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    c = upsample_cond(params, mel, cfg, dtype)
    g_gate = _g_gate_contribs(params, g, cfg, dtype)

    def step(state, xc):
        x_t, c_t = xc
        return _step_logits(params, cfg, state, x_t, c_t, dtype,
                            g_gate=g_gate)

    state0 = _init_state(x_seq.shape[0], cfg, dtype)
    _, logits = jax.lax.scan(
        step, state0, (x_seq.swapaxes(0, 1), c.swapaxes(0, 1)))
    return logits.swapaxes(0, 1)


def _sample_output(key, logits, cfg: MoLWaveNetConfig,
                   deterministic: bool = False):
    if not cfg.scalar_input:
        idx = (jnp.argmax(logits, axis=-1) if deterministic
               else jax.random.categorical(key, logits, axis=-1))
        return jax.nn.one_hot(idx, cfg.out_channels, dtype=jnp.float32)
    if deterministic:
        # temperature -> 0: argmax-component mean (closed-loop AR
        # consistency instrument — see tests/test_wavenet_mol.py)
        fn = (mixture.mix_gaussian_mode
              if cfg.output_distribution == "Normal"
              else mixture.mix_logistic_mode)
        return fn(logits, log_scale_min=cfg.log_scale_min)[..., None]
    if cfg.output_distribution == "Normal":
        x = mixture.sample_from_mix_gaussian(
            key, logits, log_scale_min=cfg.log_scale_min)
    else:
        x = mixture.sample_from_discretized_mix_logistic(
            key, logits, log_scale_min=cfg.log_scale_min)
    return x[..., None]


def wavenet_generate_batched(params: dict, cond: jnp.ndarray,
                             cfg: MoLWaveNetConfig, key, g=None,
                             deterministic: bool = False
                             ) -> jnp.ndarray:
    """AR synthesis for pre-upsampled conditioning (B, T, cin) -> (B, T).

    One compiled lax.scan; per-step work is batch-fat (all folds advance
    together). Sampling follows the reference generate(): softmax/
    categorical for one-hot, MoL/MoG for scalar (wavenet.py:225-340)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    b = cond.shape[0]
    g_gate = _g_gate_contribs(params, g, cfg, dtype)
    if cfg.scalar_input:
        x0 = jnp.zeros((b, 1), jnp.float32)
    else:
        x0 = jax.nn.one_hot(jnp.full((b,), 127), cfg.out_channels,
                            dtype=jnp.float32)

    def step(carry, c_t):
        state, x_prev, k = carry
        k, sub = jax.random.split(k)
        state, logits = _step_logits(params, cfg, state, x_prev, c_t, dtype,
                                     g_gate=g_gate)
        x = _sample_output(sub, logits, cfg, deterministic=deterministic)
        out = x[..., 0] if cfg.scalar_input else \
            mixture.inv_mulaw_quantize(jnp.argmax(x, axis=-1),
                                       cfg.out_channels - 1)
        return (state, x, k), out

    carry0 = (_init_state(b, cfg, dtype), x0, key)
    _, wav = jax.lax.scan(step, carry0, cond.swapaxes(0, 1))
    return wav.swapaxes(0, 1)                       # (B, T)


def fold_with_overlap(c: jnp.ndarray, target: int, overlap: int):
    """(1, T, F) -> (folds, target + 2*overlap, F) (wavenet.py:361-408)."""
    _, total, feats = c.shape
    num_folds = (total - overlap) // (target + overlap)
    extended = num_folds * (overlap + target) + overlap
    remaining = total - extended
    if remaining != 0:
        num_folds += 1
        c = jnp.pad(c, ((0, 0), (0, target + 2 * overlap - remaining),
                        (0, 0)))
    rows = [c[0, i * (target + overlap): i * (target + overlap)
              + target + 2 * overlap] for i in range(num_folds)]
    return jnp.stack(rows)


def xfade_and_unfold(y: np.ndarray, overlap: int) -> np.ndarray:
    """(folds, target + 2*overlap) -> (total,) with equal-power crossfade
    (wavenet.py:410-470; half the overlap is silence for AR warmup)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total = num_folds * (target + overlap) + overlap
    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1.0, 1.0, fade_len)
    fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.ones(silence_len), np.sqrt(0.5 * (1 - t))])
    y = np.array(y, np.float64)
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out
    out = np.zeros(total)
    for i in range(num_folds):
        start = i * (target + overlap)
        out[start: start + length] += y[i]
    return out


def wavenet_generate(params: dict, mel: jnp.ndarray, cfg: MoLWaveNetConfig,
                     key, target: int = 12800, overlap: int = 512, g=None
                     ) -> np.ndarray:
    """Full batched-fold synthesis: mel (1, T', cin) -> wav (T,) float.
    ``g``: one utterance's speaker id/feature row, tiled over the folds."""
    c = upsample_cond(params, mel, cfg)
    total = c.shape[1]
    folded = fold_with_overlap(c, target, overlap)
    if g is not None:
        g = jnp.asarray(g)
        g = g.reshape(1, -1) if g.ndim <= 1 else g
        g = jnp.tile(g, (folded.shape[0], 1))
        if jnp.issubdtype(g.dtype, jnp.integer):
            g = g[:, 0]
    wav = np.asarray(wavenet_generate_batched(params, folded, cfg, key, g=g),
                     np.float64)
    return xfade_and_unfold(wav, overlap)[:total]


# ---------------------------------------------------------------------------
# Torch checkpoint import (r9y9 WaveNet state_dicts)
# ---------------------------------------------------------------------------

def convert_wavenet_state_dict(sd: dict, cfg: MoLWaveNetConfig) -> dict:
    """Torch `modules.wavenet_vocoder.wavenet.WaveNet` state_dict -> pytree
    (weight norm fused; layouts to channel-last (K, I, O))."""
    from fastdiff_tpu.utils.ckpt_import import _np

    def conv(prefix, bias=True):
        if f"{prefix}.weight_v" in sd:
            v = _np(sd[f"{prefix}.weight_v"]).astype(np.float32)  # (O, I, K)
            g = _np(sd[f"{prefix}.weight_g"]).astype(np.float32).reshape(-1)
            v = v.transpose(2, 1, 0)                              # (K, I, O)
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            w = g[None, None, :] * v / norm
        else:
            w = _np(sd[f"{prefix}.weight"]).astype(np.float32).transpose(2, 1, 0)
        p = {"w": w}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
        return p

    def conv2d_up(prefix):
        if f"{prefix}.weight_v" in sd:
            v = _np(sd[f"{prefix}.weight_v"]).astype(np.float32)  # (O,I,KH,KW)
            g = _np(sd[f"{prefix}.weight_g"]).astype(np.float32).reshape(-1)
            norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
            w = g[:, None, None, None] * v / norm
        else:
            w = _np(sd[f"{prefix}.weight"]).astype(np.float32)
        return {"w": w.transpose(2, 3, 1, 0)}                     # (KH,KW,I,O)

    params = {
        "first_conv": conv("first_conv"),
        "conv_in": {"w": conv("upsample_net.conv_in", bias=False)["w"]},
        "up_convs": [conv2d_up(f"upsample_net.upsample.up_layers.{2 * i + 1}")
                     for i in range(len(cfg.upsample_scales))],
        "last_conv1": conv("last_conv_layers.1"),
        "last_conv2": conv("last_conv_layers.3"),
        "blocks": [],
    }
    if "embed_speakers.weight" in sd:
        params["embed_speakers"] = {
            "w": _np(sd["embed_speakers.weight"]).astype(np.float32)}
    for layer in range(cfg.layers):
        p = f"conv_layers.{layer}"
        blk = {
            "conv": conv(f"{p}.conv"),
            "aux_conv": {"w": conv(f"{p}.conv1x1c", bias=False)["w"]},
            "out_conv": conv(f"{p}.conv1x1_out"),
            "skip_conv": conv(f"{p}.conv1x1_skip"),
        }
        if (f"{p}.conv1x1g.weight_v" in sd or f"{p}.conv1x1g.weight" in sd):
            blk["g_conv"] = {"w": conv(f"{p}.conv1x1g", bias=False)["w"]}
        params["blocks"].append(blk)
    return params
