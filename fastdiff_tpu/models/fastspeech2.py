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
      -> variance adaptor: pitch (frame/cwt/coarse modes) + energy
      -> decoder stack -> linear projection to n_mels

Variance adaptor (reference: tasks/tts/fs2.py:100-172 semantics):

- ``pitch_type='frame'``: the pitch predictor emits (f0_norm, uv_logits)
  per mel frame; the pitch embedding is looked up at
  ``f0_to_coarse(denorm_f0(f0, uv))`` where training uses ground-truth
  (interpolated, normalized) f0/uv and inference the predictions
  (fs2.py add_f0_loss + utils/pitch_utils.py norm/denorm).
- ``pitch_type='cwt'``: the predictor emits the 10-component wavelet
  decomposition of the normalized log-f0 contour (+1 uv channel) and a
  pooled stats head predicts per-utterance (mean, std); f0 is
  reconstructed with ``ops/cwt.py`` and embedded as above (the reference's
  cwt pitch mode: tasks/tts/dataset_utils.py:116-148 supplies cwt_spec/
  mean/std; the model side lives in its NATSpeech ancestry).
- ``pitch_type='coarse'``: legacy mode of this repo's round-1 build — the
  predictor regresses the coarse bin id directly.
- ``use_energy``: an energy predictor regresses per-frame energy
  (sqrt of summed squared linear-spectrogram magnitudes,
  dataset_utils.py:127) and an energy embedding is added (quantized to
  ``energy_bins`` uniform bins over [0, 4]).

The length regulator is the mel2ph *gather* formulation (the reference's
expand via ``mel2ph`` indices, fs2.py/tts tasks): decoder input
``enc_out[mel2ph - 1]`` with 0 mapping to a zeros row — static shapes,
no ragged ops, jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.models import transformer as tr
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.ops.cwt import N_SCALES, cwt_to_f0_jnp
from fastdiff_tpu.ops.pitch import (F0_BIN, denorm_f0_jnp, f0_to_coarse_jnp)

ENERGY_MAX = 4.0     # quantization range for the energy embedding


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
    pitch_type: str = "frame"       # frame | cwt | coarse
    use_uv: bool = True
    pitch_norm: str = "log"
    pitch_bins: int = 300
    use_energy: bool = False
    energy_bins: int = 256
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
            pitch_type=str(hp.get("pitch_type", "frame")),
            use_uv=bool(hp.get("use_uv", True)),
            pitch_norm=str(hp.get("pitch_norm", "log")),
            use_energy=bool(hp.get("use_energy_embed", False)),
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


def _pitch_out_dim(cfg: FS2Config) -> int:
    if cfg.pitch_type == "cwt":
        return N_SCALES + (1 if cfg.use_uv else 0)
    if cfg.pitch_type == "frame":
        return 2 if cfg.use_uv else 1
    return 1                                     # coarse legacy


def init_fastspeech2(key, cfg: FS2Config) -> dict:
    keys = jax.random.split(key, 10 + cfg.enc_layers + cfg.dec_layers)
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
        "dur_predictor": _predictor_init(keys[-6], cfg),
        "mel_out": fnn.dense_init(keys[-5], cfg.hidden, cfg.n_mels),
    }
    if cfg.use_pitch:
        params["pitch_predictor"] = _predictor_init(
            keys[-4], cfg, _pitch_out_dim(cfg))
        params["pitch_embed"] = jax.random.normal(
            keys[-3], (cfg.pitch_bins, cfg.hidden)) * 0.02
        if cfg.pitch_type == "cwt":
            # per-utterance (logf0 mean, std) from mean-pooled encoder state
            params["cwt_stats"] = fnn.dense_init(
                jax.random.fold_in(keys[-3], 7), cfg.hidden, 2)
    if cfg.use_energy:
        params["energy_predictor"] = _predictor_init(keys[-2], cfg)
        params["energy_embed"] = jax.random.normal(
            jax.random.fold_in(keys[-2], 1), (cfg.energy_bins, cfg.hidden)) * 0.02
    if cfg.num_spk > 1:
        params["spk_embed"] = jax.random.normal(
            jax.random.fold_in(keys[-1], 1), (cfg.num_spk, cfg.hidden)) * 0.02
    if cfg.use_spk_embed:
        # external d-vector conditioning (reference spk_embed path,
        # base_binarizer.py:156-168 + fs2 spk_embed_proj role)
        params["spk_embed_proj"] = fnn.dense_init(
            jax.random.fold_in(keys[-1], 2), cfg.spk_embed_dim, cfg.hidden)
    return params


def _predictor_apply(p: dict, x: jnp.ndarray, mask: jnp.ndarray,
                     channels: int = 1) -> jnp.ndarray:
    h = jax.nn.relu(fnn.conv1d(p["conv1"], x))
    h = tr.layer_norm(p["ln1"], h)
    h = jax.nn.relu(fnn.conv1d(p["conv2"], h))
    h = tr.layer_norm(p["ln2"], h)
    out = fnn.dense(p["out"], h)
    if channels == 1:
        return out[..., 0] * mask
    return out * mask[..., None]


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


def energy_to_coarse(energy: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Frame energy -> 1..bins-1 uniform bins over [0, ENERGY_MAX]
    (0 reserved for padding)."""
    scaled = energy * (bins - 1) / ENERGY_MAX
    return jnp.clip(jnp.round(scaled), 1, bins - 1).astype(jnp.int32)


def _pitch_branch(params: dict, y: jnp.ndarray, enc_pooled: jnp.ndarray,
                  mel_mask: jnp.ndarray, cfg: FS2Config,
                  f0: Optional[jnp.ndarray], uv: Optional[jnp.ndarray],
                  pitch: Optional[jnp.ndarray]) -> tuple:
    """Predict pitch, embed it (gt when given, else predictions).

    Returns (pitch_embedding (B,T,H), out-dict extras)."""
    extras: dict = {}
    if cfg.pitch_type == "coarse":
        pred = _predictor_apply(params["pitch_predictor"], y, mel_mask)
        extras["pitch_pred"] = pred
        if pitch is None:
            coarse = jnp.clip(jnp.round(pred), 1, F0_BIN - 1)
            coarse = jnp.where(mel_mask > 0, coarse, 1).astype(jnp.int32)
        else:
            coarse = pitch.astype(jnp.int32)
        return params["pitch_embed"][coarse], extras

    if cfg.pitch_type == "cwt":
        out_dim = _pitch_out_dim(cfg)
        pred = _predictor_apply(params["pitch_predictor"], y, mel_mask,
                                channels=out_dim)
        cwt_pred = pred[..., :N_SCALES]
        stats = fnn.dense(params["cwt_stats"], enc_pooled)     # (B, 2)
        mean_pred, std_pred = stats[:, 0], stats[:, 1]
        extras.update(cwt_pred=cwt_pred, cwt_mean_pred=mean_pred,
                      cwt_std_pred=std_pred)
        if cfg.use_uv:
            extras["uv_pred"] = pred[..., N_SCALES]
        if f0 is None:
            # inference: reconstruct f0 from the predicted decomposition
            f0_denorm = cwt_to_f0_jnp(cwt_pred, mean_pred,
                                      jnp.abs(std_pred) + 1e-4)
            if cfg.use_uv:
                f0_denorm = jnp.where(extras["uv_pred"] > 0, 0.0, f0_denorm)
            f0_denorm = f0_denorm * mel_mask
        else:
            f0_denorm = denorm_f0_jnp(f0, uv if cfg.use_uv else None,
                                      cfg.pitch_norm) * mel_mask
        extras["f0_denorm"] = f0_denorm
        coarse = f0_to_coarse_jnp(f0_denorm)
        return params["pitch_embed"][coarse], extras

    # frame mode (reference default): (f0_norm, uv_logits) channels
    out_dim = _pitch_out_dim(cfg)
    pred = _predictor_apply(params["pitch_predictor"], y, mel_mask,
                            channels=out_dim)
    f0_pred = pred[..., 0]
    extras["pitch_pred"] = pred
    extras["f0_pred"] = f0_pred
    if cfg.use_uv:
        extras["uv_pred"] = pred[..., 1]
    if f0 is None:
        uv_hat = (extras["uv_pred"] > 0) if cfg.use_uv else None
        f0_denorm = denorm_f0_jnp(f0_pred, uv_hat, cfg.pitch_norm) * mel_mask
    else:
        f0_denorm = denorm_f0_jnp(f0, uv if cfg.use_uv else None,
                                  cfg.pitch_norm) * mel_mask
    extras["f0_denorm"] = f0_denorm
    coarse = f0_to_coarse_jnp(f0_denorm)
    return params["pitch_embed"][coarse], extras


def fastspeech2_apply(params: dict, tokens: jnp.ndarray, cfg: FS2Config,
                      mel2ph: Optional[jnp.ndarray] = None,
                      f0: Optional[jnp.ndarray] = None,
                      uv: Optional[jnp.ndarray] = None,
                      pitch: Optional[jnp.ndarray] = None,
                      energy: Optional[jnp.ndarray] = None,
                      spk_id: Optional[jnp.ndarray] = None,
                      spk_embed: Optional[jnp.ndarray] = None,
                      t_mel: Optional[int] = None) -> dict:
    """tokens (B, T_ph) int (0 = pad).

    Training: pass ground-truth ``mel2ph`` (B, T_mel) plus, per config,
    ``f0``/``uv`` (frame/cwt pitch), ``pitch`` (coarse mode) and ``energy``.
    Inference: leave them None; every variance comes from its predictor
    (``t_mel`` caps the generated length; default cfg.max_len).
    Returns {mel (B, T_mel, n_mels), dur_pred (log domain), mel2ph,
    mel_mask, energy_pred, pitch extras per mode}.
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

    out = {"dur_pred": dur_pred, "mel2ph": mel2ph, "mel_mask": mel_mask,
           "pitch_pred": None, "energy_pred": None}

    if cfg.use_pitch and "pitch_predictor" in params:
        denom = jnp.maximum(src_mask.sum(-1, keepdims=True), 1.0)
        enc_pooled = (x * src_mask[..., None]).sum(1) / denom    # (B, H)
        pitch_embed, extras = _pitch_branch(
            params, y, enc_pooled, mel_mask, cfg, f0, uv, pitch)
        out.update(extras)
        y = y + pitch_embed * mel_mask[..., None]

    if cfg.use_energy and "energy_predictor" in params:
        energy_pred = _predictor_apply(params["energy_predictor"], y, mel_mask)
        out["energy_pred"] = energy_pred
        e_src = energy if energy is not None else energy_pred
        coarse_e = jnp.where(mel_mask > 0,
                             energy_to_coarse(e_src, cfg.energy_bins), 0)
        y = y + params["energy_embed"][coarse_e] * mel_mask[..., None]

    pos_d = jnp.asarray(tr.sinusoidal_positions(t_mel, cfg.hidden))
    y = y + pos_d[None, :t_mel]
    y = tr.transformer_stack(params["decoder"], y, mel_mask, cfg.num_heads)
    y = tr.layer_norm(params["dec_ln"], y) * mel_mask[..., None]
    mel = fnn.dense(params["mel_out"], y) * mel_mask[..., None]

    out["mel"] = mel
    return out


# ---------------------------------------------------------------------------
# losses (tasks/tts/fs2.py:118-172 + tts_base.py:182-223 semantics)
# ---------------------------------------------------------------------------

DEFAULT_LAMBDAS = {
    "lambda_ph_dur": 1.0, "lambda_word_dur": 0.0, "lambda_sent_dur": 0.0,
    "lambda_f0": 1.0, "lambda_uv": 1.0, "lambda_energy": 0.1,
    "lambda_cwt": 1.0, "lambda_cwt_stats": 0.1,
}


def duration_losses(dur_pred: jnp.ndarray, dur_gt: jnp.ndarray,
                    src_mask: jnp.ndarray, lambdas: dict,
                    is_sil: Optional[jnp.ndarray] = None) -> dict:
    """Phone-level log-MSE + optional word/sentence linear-domain terms
    (reference: fs2.py add_dur_loss:118-153).

    ``is_sil`` (B, T_ph) marks silence phones, used as word boundaries for
    the word-duration term (word_id = cumsum(is_sil) on non-sil tokens).
    """
    losses = {}
    dur_target = jnp.log(dur_gt.astype(jnp.float32) + 1.0)
    denom = jnp.maximum(src_mask.sum(), 1.0)
    pdur = (((dur_pred - dur_target) ** 2) * src_mask).sum() / denom
    losses["pdur"] = pdur * lambdas["lambda_ph_dur"]

    dur_pred_lin = jnp.clip(jnp.exp(dur_pred) - 1.0, 0.0, None) * src_mask
    if lambdas.get("lambda_word_dur", 0.0) > 0 and is_sil is not None:
        word_id = (jnp.cumsum(is_sil, axis=-1) * (1 - is_sil)).astype(jnp.int32)
        n_words = src_mask.shape[1] + 1
        oh = jax.nn.one_hot(word_id, n_words, dtype=jnp.float32)
        wdur_p = jnp.einsum("bt,btw->bw", dur_pred_lin, oh)[:, 1:]
        wdur_g = jnp.einsum("bt,btw->bw",
                            dur_gt.astype(jnp.float32) * src_mask, oh)[:, 1:]
        wmask = (wdur_g > 0).astype(jnp.float32)
        wdur = ((jnp.log(wdur_p + 1.0) - jnp.log(wdur_g + 1.0)) ** 2 * wmask
                ).sum() / jnp.maximum(wmask.sum(), 1.0)
        losses["wdur"] = wdur * lambdas["lambda_word_dur"]
    if lambdas.get("lambda_sent_dur", 0.0) > 0:
        sdur_p = dur_pred_lin.sum(-1)
        sdur_g = (dur_gt.astype(jnp.float32) * src_mask).sum(-1)
        sdur = jnp.mean((jnp.log(sdur_p + 1.0) - jnp.log(sdur_g + 1.0)) ** 2)
        losses["sdur"] = sdur * lambdas["lambda_sent_dur"]
    return losses


def pitch_losses(out: dict, batch: dict, cfg: FS2Config,
                 lambdas: dict, pitch_loss: str = "l1") -> dict:
    """Per pitch_type (reference: fs2.py add_pitch_loss/add_f0_loss)."""
    losses = {}
    mel_mask = out["mel_mask"]
    if cfg.pitch_type == "coarse":
        if out.get("pitch_pred") is None or batch.get("pitch") is None:
            return losses
        denom = jnp.maximum(mel_mask.sum(), 1.0)
        diff = (out["pitch_pred"] - batch["pitch"].astype(jnp.float32)) / F0_BIN
        losses["pitch"] = ((diff ** 2) * mel_mask).sum() / denom
        return losses

    if cfg.pitch_type == "cwt":
        cwt_gt = batch["cwt_spec"]                     # (B, T, 10)
        denom = jnp.maximum(mel_mask.sum() * N_SCALES, 1.0)
        cwt_l = (jnp.abs(out["cwt_pred"] - cwt_gt)
                 * mel_mask[..., None]).sum() / denom
        losses["cwt"] = cwt_l * lambdas["lambda_cwt"]
        stats = ((out["cwt_mean_pred"] - batch["cwt_mean"]) ** 2
                 + (out["cwt_std_pred"] - batch["cwt_std"]) ** 2).mean()
        losses["cwt_stats"] = stats * lambdas["lambda_cwt_stats"]
        if cfg.use_uv and "uv" in batch:
            uv = batch["uv"]
            bce = optax_sigmoid_bce(out["uv_pred"], uv)
            losses["uv"] = (bce * mel_mask).sum() / jnp.maximum(
                mel_mask.sum(), 1.0) * lambdas["lambda_uv"]
        return losses

    # frame mode
    f0_gt, uv_gt = batch["f0"], batch.get("uv")
    nonpadding = mel_mask
    if cfg.use_uv and uv_gt is not None:
        bce = optax_sigmoid_bce(out["uv_pred"], uv_gt)
        losses["uv"] = (bce * nonpadding).sum() / jnp.maximum(
            nonpadding.sum(), 1.0) * lambdas["lambda_uv"]
        nonpadding = nonpadding * (uv_gt == 0).astype(jnp.float32)
    diff = out["f0_pred"] - f0_gt
    err = jnp.abs(diff) if pitch_loss == "l1" else diff ** 2
    losses["f0"] = (err * nonpadding).sum() / jnp.maximum(
        nonpadding.sum(), 1.0) * lambdas["lambda_f0"]
    return losses


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def fastspeech2_loss(out: dict, batch: dict, cfg: FS2Config,
                     mel_loss_and_lambda: Optional[dict] = None,
                     lambdas: Optional[dict] = None,
                     pitch_loss: str = "l1") -> dict:
    """Full training loss dict. ``batch`` carries (per config):
    mels (B,T,M), dur (B,T_ph), tokens (B,T_ph), f0/uv (B,T), pitch (B,T),
    energy (B,T), cwt_spec/cwt_mean/cwt_std, is_sil (B,T_ph)."""
    from fastdiff_tpu.ops.mel_losses import mel_loss as mel_loss_fns
    lambdas = {**DEFAULT_LAMBDAS, **(lambdas or {})}
    mel_cfg = mel_loss_and_lambda or {"l1": 1.0}
    src_mask = (batch["tokens"] > 0).astype(jnp.float32)

    mel_gt = batch["mels"] * out["mel_mask"][..., None]
    mel_components = mel_loss_fns(out["mel"], mel_gt, mel_cfg)
    losses = dict(mel_components)
    losses.update(duration_losses(out["dur_pred"], batch["dur"], src_mask,
                                  lambdas, is_sil=batch.get("is_sil")))
    if cfg.use_pitch:
        losses.update(pitch_losses(out, batch, cfg, lambdas, pitch_loss))
    if cfg.use_energy and out.get("energy_pred") is not None \
            and batch.get("energy") is not None:
        mel_mask = out["mel_mask"]
        denom = jnp.maximum(mel_mask.sum(), 1.0)
        e = ((out["energy_pred"] - batch["energy"]) ** 2 * mel_mask).sum() / denom
        losses["energy"] = e * lambdas["lambda_energy"]
    losses["total"] = sum(losses.values())
    # observability alias: the combined mel term under one name
    losses["mel"] = sum(mel_components.values())
    return losses


def mel_energy(mel: jnp.ndarray, log_base: str = "10") -> jnp.ndarray:
    """Frame energy from a log mel, compressed into [0, ~ENERGY_MAX].

    The reference computes raw ``sqrt(sum(exp(mel)^2))`` on its ln mels
    (tasks/tts/dataset_utils.py:127). This repo's front-end is log10 with
    much larger linear amplitudes, so the energy is log10(1+.)-compressed
    to keep the ``energy_bins`` quantization range covered; predictor
    target and embedding input use the same compressed quantity, which is
    all the adaptor requires."""
    lin = jnp.power(10.0, mel) if log_base == "10" else jnp.exp(mel)
    return jnp.log10(1.0 + jnp.sqrt((lin ** 2).sum(-1)))
