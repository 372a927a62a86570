"""FastSpeech 2 (text -> mel) acoustic model, TPU-native.

A *working* re-design of the capability the reference carries as broken
vestigial code (reference: tasks/tts/fs2.py, tasks/tts/tts_base.py — their
imports reference a module that does not exist in the tree; SURVEY.md C19).
Architecture follows the FastSpeech 2 recipe the reference's configs and
losses imply:

    phone ids -> embedding + sinusoidal positions -> encoder stack
      -> duration predictor (log-domain MSE; teacher durations from MFA)
      -> length regulation via mel2ph gather (training uses ground-truth
         mel2ph; inference builds mel2ph from predicted durations)
      -> [optional] pitch predictor + coarse-pitch embedding
      -> decoder stack -> linear projection to n_mels

The length regulator is the mel2ph *gather* formulation (the reference's
expand via ``mel2ph`` indices, fs2.py/tts tasks): decoder input
``enc_out[mel2ph - 1]`` with 0 mapping to a zeros row — static shapes,
no ragged ops, jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.models import transformer as tr
from fastdiff_tpu.ops import nn as fnn


@dataclasses.dataclass(frozen=True)
class FS2Config:
    vocab_size: int = 100
    hidden: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    num_heads: int = 2
    ffn_hidden: int = 1024
    ffn_kernel: int = 9
    n_mels: int = 80
    max_len: int = 3000
    predictor_hidden: int = 256
    predictor_kernel: int = 3
    use_pitch: bool = True
    pitch_bins: int = 300
    num_spk: int = 1
    use_spk_embed: bool = False     # external 256-d d-vector conditioning
    spk_embed_dim: int = 256

    @classmethod
    def from_hparams(cls, hp: dict) -> "FS2Config":
        return cls(
            vocab_size=int(hp.get("vocab_size", 100)),
            hidden=int(hp.get("hidden_size", 256)),
            enc_layers=int(hp.get("enc_layers", 4)),
            dec_layers=int(hp.get("dec_layers", 4)),
            num_heads=int(hp.get("num_heads", 2)),
            ffn_hidden=int(hp.get("ffn_hidden", 1024)),
            ffn_kernel=int(hp.get("enc_ffn_kernel_size", 9)),
            n_mels=int(hp.get("audio_num_mel_bins", 80)),
            max_len=int(hp.get("max_frames", 3000)),
            use_pitch=bool(hp.get("use_pitch_embed", True)),
            num_spk=int(hp.get("num_spk", 1)),
            use_spk_embed=bool(hp.get("use_spk_embed", False)),
        )


def _predictor_init(key, cfg: FS2Config, out_dim: int = 1) -> dict:
    """Variance predictor: 2 x (conv k3 + relu + LN) -> linear."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": fnn.conv1d_init(k1, cfg.hidden, cfg.predictor_hidden,
                                 cfg.predictor_kernel),
        "ln1": tr.layer_norm_init(cfg.predictor_hidden),
        "conv2": fnn.conv1d_init(k2, cfg.predictor_hidden,
                                 cfg.predictor_hidden, cfg.predictor_kernel),
        "ln2": tr.layer_norm_init(cfg.predictor_hidden),
        "out": fnn.dense_init(k3, cfg.predictor_hidden, out_dim),
    }


def init_fastspeech2(key, cfg: FS2Config) -> dict:
    keys = jax.random.split(key, 8 + cfg.enc_layers + cfg.dec_layers)
    params = {
        "tok_embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.hidden))
        * (cfg.hidden ** -0.5),
        "encoder": [
            tr.encoder_layer_init(keys[1 + i], cfg.hidden,
                                  cfg.ffn_hidden, cfg.ffn_kernel)
            for i in range(cfg.enc_layers)
        ],
        "decoder": [
            tr.encoder_layer_init(keys[1 + cfg.enc_layers + i], cfg.hidden,
                                  cfg.ffn_hidden, cfg.ffn_kernel)
            for i in range(cfg.dec_layers)
        ],
        "enc_ln": tr.layer_norm_init(cfg.hidden),
        "dec_ln": tr.layer_norm_init(cfg.hidden),
        "dur_predictor": _predictor_init(keys[-4], cfg),
        "mel_out": fnn.dense_init(keys[-3], cfg.hidden, cfg.n_mels),
    }
    if cfg.use_pitch:
        params["pitch_predictor"] = _predictor_init(keys[-2], cfg)
        params["pitch_embed"] = jax.random.normal(
            keys[-1], (cfg.pitch_bins, cfg.hidden)) * 0.02
    if cfg.num_spk > 1:
        params["spk_embed"] = jax.random.normal(
            jax.random.fold_in(keys[-1], 1), (cfg.num_spk, cfg.hidden)) * 0.02
    if cfg.use_spk_embed:
        # external d-vector conditioning (reference spk_embed path,
        # base_binarizer.py:156-168 + fs2 spk_embed_proj role)
        params["spk_embed_proj"] = fnn.dense_init(
            jax.random.fold_in(keys[-1], 2), cfg.spk_embed_dim, cfg.hidden)
    return params


def _predictor_apply(p: dict, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(fnn.conv1d(p["conv1"], x))
    h = tr.layer_norm(p["ln1"], h)
    h = jax.nn.relu(fnn.conv1d(p["conv2"], h))
    h = tr.layer_norm(p["ln2"], h)
    out = fnn.dense(p["out"], h)[..., 0]
    return out * mask


def mel2ph_to_dur(mel2ph: jnp.ndarray, n_phones: int) -> jnp.ndarray:
    """(B, T_mel) 1-based frame->phone map -> (B, n_phones) durations."""
    one_hot = jax.nn.one_hot(mel2ph, n_phones + 1, dtype=jnp.float32)
    return one_hot.sum(axis=1)[:, 1:]


def dur_to_mel2ph(durations: jnp.ndarray, t_mel: int) -> jnp.ndarray:
    """(B, n_phones) durations -> (B, t_mel) 1-based mel2ph (0 past end).

    mel2ph[t] = 1 + #boundaries <= t, computed with searchsorted-style
    comparisons — static shapes, no ragged concat.
    """
    ends = jnp.cumsum(durations, axis=1)                  # (B, P)
    frames = jnp.arange(t_mel)[None, :, None]             # (1, T, 1)
    mel2ph = 1 + (frames >= ends[:, None, :]).sum(-1)     # (B, T)
    total = ends[:, -1:]
    return jnp.where(jnp.arange(t_mel)[None, :] < total, mel2ph, 0)


def fastspeech2_apply(params: dict, tokens: jnp.ndarray, cfg: FS2Config,
                      mel2ph: Optional[jnp.ndarray] = None,
                      pitch: Optional[jnp.ndarray] = None,
                      spk_id: Optional[jnp.ndarray] = None,
                      spk_embed: Optional[jnp.ndarray] = None,
                      t_mel: Optional[int] = None) -> dict:
    """tokens (B, T_ph) int (0 = pad).

    Training: pass ground-truth ``mel2ph`` (B, T_mel) and coarse ``pitch``.
    Inference: leave them None; durations/pitch come from the predictors
    (``t_mel`` caps the generated length; default cfg.max_len).
    Returns {mel (B, T_mel, n_mels), dur_pred (log domain), mel2ph,
    pitch_pred}.
    """
    src_mask = (tokens > 0).astype(jnp.float32)
    x = params["tok_embed"][tokens] * src_mask[..., None]
    pos = jnp.asarray(tr.sinusoidal_positions(tokens.shape[1], cfg.hidden))
    x = x + pos[None, : tokens.shape[1]]
    if spk_id is not None and "spk_embed" in params:
        x = x + params["spk_embed"][spk_id][:, None, :]
    if spk_embed is not None and "spk_embed_proj" in params:
        x = x + fnn.dense(params["spk_embed_proj"], spk_embed)[:, None, :]
    x = tr.transformer_stack(params["encoder"], x, src_mask, cfg.num_heads)
    x = tr.layer_norm(params["enc_ln"], x) * src_mask[..., None]

    dur_pred = _predictor_apply(params["dur_predictor"], x, src_mask)

    if mel2ph is None:
        # each valid token gets at least one frame at inference
        durations = jnp.clip(jnp.round(jnp.exp(dur_pred) - 1.0), 1, None)
        durations = durations * src_mask
        t_mel = t_mel or cfg.max_len
        mel2ph = dur_to_mel2ph(durations, t_mel)
    else:
        t_mel = mel2ph.shape[1]

    mel_mask = (mel2ph > 0).astype(jnp.float32)
    # length regulation: gather encoder states by phone index (0 -> zeros)
    padded = jnp.concatenate([jnp.zeros_like(x[:, :1]), x], axis=1)
    y = jnp.take_along_axis(padded, mel2ph[..., None], axis=1)

    pitch_pred = None
    if cfg.use_pitch and "pitch_predictor" in params:
        pitch_pred = _predictor_apply(params["pitch_predictor"], y, mel_mask)
        if pitch is None:
            from fastdiff_tpu.ops.pitch import F0_BIN
            coarse = jnp.clip(jnp.round(pitch_pred), 1, F0_BIN - 1)
            coarse = jnp.where(mel_mask > 0, coarse, 1).astype(jnp.int32)
        else:
            coarse = pitch.astype(jnp.int32)
        y = y + params["pitch_embed"][coarse]

    pos_d = jnp.asarray(tr.sinusoidal_positions(t_mel, cfg.hidden))
    y = y + pos_d[None, :t_mel]
    y = tr.transformer_stack(params["decoder"], y, mel_mask, cfg.num_heads)
    y = tr.layer_norm(params["dec_ln"], y) * mel_mask[..., None]
    mel = fnn.dense(params["mel_out"], y) * mel_mask[..., None]

    return {"mel": mel, "dur_pred": dur_pred, "mel2ph": mel2ph,
            "pitch_pred": pitch_pred, "mel_mask": mel_mask}


# ---------------------------------------------------------------------------
# losses (tasks/tts/fs2.py:118-172 semantics)
# ---------------------------------------------------------------------------

def fastspeech2_loss(out: dict, mel_gt: jnp.ndarray, dur_gt: jnp.ndarray,
                     src_mask: jnp.ndarray,
                     pitch_gt: Optional[jnp.ndarray] = None) -> dict:
    mel_mask = out["mel_mask"][..., None]
    denom = jnp.maximum(mel_mask.sum(), 1.0)
    l1 = (jnp.abs(out["mel"] - mel_gt) * mel_mask).sum() / (
        denom * mel_gt.shape[-1])
    dur_target = jnp.log(dur_gt.astype(jnp.float32) + 1.0)
    ddenom = jnp.maximum(src_mask.sum(), 1.0)
    dur_loss = (((out["dur_pred"] - dur_target) ** 2) * src_mask).sum() / ddenom
    losses = {"mel": l1, "dur": dur_loss}
    if out.get("pitch_pred") is not None and pitch_gt is not None:
        pdenom = jnp.maximum(out["mel_mask"].sum(), 1.0)
        # normalize to [0, 1] bin units so the pitch term doesn't dominate
        from fastdiff_tpu.ops.pitch import F0_BIN
        diff = (out["pitch_pred"] - pitch_gt.astype(jnp.float32)) / F0_BIN
        losses["pitch"] = ((diff ** 2) * out["mel_mask"]).sum() / pdenom
    losses["total"] = sum(losses.values())
    return losses
