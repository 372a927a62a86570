"""FastSpeech 2 training task: text -> mel on the TPU mesh.

The working counterpart of the reference's vestigial TTS task layer
(reference: tasks/tts/tts_base.py, tasks/tts/fs2.py — unrunnable there due
to missing imports; SURVEY.md C19): phone-sequence batching with padding,
mel L1 + log-duration + pitch losses, validation, and ``after-infer``
rendering through the vocoder registry.

TPU shape discipline: batches are padded to bucketed lengths (multiples of
8 tokens / 32 frames) so XLA compiles a handful of shapes rather than one
per utterance; masks carry the true lengths.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import AudioConfig, MeshConfig, TrainConfig
from fastdiff_tpu.data.dataset import VocoderDataset, endless_index_stream
from fastdiff_tpu.models.fastspeech2 import (FS2Config, fastspeech2_apply,
                                             fastspeech2_loss,
                                             init_fastspeech2)
from fastdiff_tpu.parallel import mesh as meshlib
from fastdiff_tpu.training.optim import make_optimizer
from fastdiff_tpu.utils import audio_io


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _np_mel_energy(mel: np.ndarray) -> np.ndarray:
    """Host mirror of models.fastspeech2.mel_energy (log10 front-end)."""
    lin = np.power(10.0, mel)
    return np.log10(1.0 + np.sqrt((lin ** 2).sum(-1))).astype(np.float32)


def _is_sil_phone(p: str) -> bool:
    """Silence/punctuation phones = non-alphabetic tokens (the reference's
    TokenTextEncoder.sil_phonemes convention)."""
    return not any(ch.isalpha() for ch in p)


def collate_tts(items, token_pad: int, frame_pad: int, n_mels: int,
                pitch_type: str = "frame",
                pitch_norm: str = "log") -> Dict:
    """Pad a list of TTS records to bucketed fixed shapes.

    Emits, beyond tokens/mels/mel2ph/dur: coarse ``pitch`` (legacy mode),
    normalized+interpolated ``f0`` with ``uv`` (frame/cwt pitch —
    reference: tasks/tts/dataset_utils.py:142-143 norm_interp_f0),
    per-frame ``energy`` from the mel (dataset_utils.py:127), ``is_sil``
    word-boundary marks, and cwt fields when ``pitch_type='cwt'``.
    """
    from fastdiff_tpu.ops.pitch import norm_interp_f0
    batch = len(items)
    tokens = np.zeros((batch, token_pad), np.int32)
    mels = np.zeros((batch, frame_pad, n_mels), np.float32)
    mel2ph = np.zeros((batch, frame_pad), np.int32)
    pitch = np.ones((batch, frame_pad), np.int32)
    f0 = np.zeros((batch, frame_pad), np.float32)
    uv = np.zeros((batch, frame_pad), np.float32)
    energy = np.zeros((batch, frame_pad), np.float32)
    dur = np.zeros((batch, token_pad), np.float32)
    is_sil = np.zeros((batch, token_pad), np.float32)
    want_cwt = pitch_type == "cwt"
    cwt_spec = np.zeros((batch, frame_pad, 10), np.float32) if want_cwt else None
    cwt_mean = np.zeros((batch,), np.float32) if want_cwt else None
    cwt_std = np.ones((batch,), np.float32) if want_cwt else None
    for b, item in enumerate(items):
        tok = np.asarray(item["phone"], np.int32)
        mel = np.asarray(item["mel"], np.float32)
        t_ph, t_mel = len(tok), mel.shape[0]
        tokens[b, :t_ph] = tok
        mels[b, :t_mel] = mel
        energy[b, :t_mel] = _np_mel_energy(mel)
        if "ph" in item:
            for i, p in enumerate(str(item["ph"]).split()[:t_ph]):
                is_sil[b, i] = float(_is_sil_phone(p))
        if "mel2ph" in item:
            mel2ph[b, :t_mel] = np.asarray(item["mel2ph"], np.int32)
        else:
            # uniform fallback alignment when MFA durations are absent
            bounds = np.linspace(0, t_mel, t_ph + 1).astype(np.int64)
            m2p = np.zeros(t_mel, np.int32)
            for p in range(t_ph):
                m2p[bounds[p]: bounds[p + 1]] = p + 1
            mel2ph[b, :t_mel] = m2p
        if "pitch" in item:
            pitch[b, :t_mel] = np.asarray(item["pitch"], np.int32)[:t_mel]
        if "f0" in item:
            f0_raw = np.asarray(item["f0"], np.float32)[:t_mel]
            f0n, uvb = norm_interp_f0(f0_raw, pitch_norm)
            f0[b, :len(f0n)] = f0n
            uv[b, :len(uvb)] = uvb
            uv[b, len(uvb):t_mel] = 1.0
            if want_cwt:
                if "cwt_spec" in item:
                    spec = np.asarray(item["cwt_spec"], np.float32)[:t_mel]
                    mean = float(item.get("cwt_mean", 0.0))
                    std = float(item.get("cwt_std", 1.0))
                else:
                    from fastdiff_tpu.ops.cwt import f0_to_cwt
                    spec, mean, std = f0_to_cwt(f0_raw)
                    spec = spec[:t_mel]
                cwt_spec[b, :len(spec)] = spec
                cwt_mean[b] = mean
                cwt_std[b] = std
        dur[b] = np.bincount(mel2ph[b], minlength=token_pad + 1)[1: token_pad + 1]
    out = {"tokens": tokens, "mels": mels, "mel2ph": mel2ph,
           "pitch": pitch, "f0": f0, "uv": uv, "energy": energy,
           "dur": dur, "is_sil": is_sil}
    if want_cwt:
        out.update(cwt_spec=cwt_spec, cwt_mean=cwt_mean, cwt_std=cwt_std)
    if all("spk_embed" in item for item in items):
        out["spk_embed"] = np.stack(
            [np.asarray(item["spk_embed"], np.float32) for item in items])
    return out


class FastSpeech2Task:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.train_cfg = TrainConfig.from_hparams(hparams)
        self.audio_cfg = AudioConfig.from_hparams(hparams)
        self.mesh = meshlib.make_mesh(MeshConfig.from_hparams(hparams))
        vocab_size = int(hparams.get("vocab_size", 0)) or \
            self._vocab_size_from_phone_set(hparams)
        self.model_cfg = FS2Config.from_hparams(
            {**hparams, "vocab_size": vocab_size})
        self.optimizer = make_optimizer(
            self.train_cfg,
            warmup_updates=int(hparams.get("warmup_updates", 8000)),
            hidden_size=self.model_cfg.hidden)
        self._step_fns = {}

    @staticmethod
    def _vocab_size_from_phone_set(hparams: dict) -> int:
        import json
        fn = os.path.join(hparams.get("binary_data_dir", ""), "phone_set.json")
        if os.path.exists(fn):
            return len(json.load(open(fn))) + 3   # + reserved ids
        return 100

    # -- state -------------------------------------------------------------
    def build_state(self, seed: int = None) -> Dict:
        seed = self.train_cfg.seed if seed is None else seed
        params = init_fastspeech2(jax.random.PRNGKey(seed), self.model_cfg)
        opt_state = self.optimizer.init(params)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.zeros((), jnp.int32)}
        return meshlib.replicate(state, self.mesh)

    # -- steps -------------------------------------------------------------
    def _apply_train(self, params, batch):
        cfg = self.model_cfg
        kwargs = dict(mel2ph=batch["mel2ph"],
                      spk_embed=batch.get("spk_embed"))
        if cfg.use_pitch:
            if cfg.pitch_type == "coarse":
                kwargs["pitch"] = batch["pitch"]
            else:
                kwargs["f0"] = batch["f0"]
                kwargs["uv"] = batch["uv"]
        if cfg.use_energy:
            kwargs["energy"] = batch["energy"]
        return fastspeech2_apply(params, batch["tokens"], cfg, **kwargs)

    def _loss(self, params, batch):
        out = self._apply_train(params, batch)
        hp = self.hparams
        from fastdiff_tpu.ops.mel_losses import parse_mel_losses
        mel_cfg = parse_mel_losses(hp.get("mel_loss", "l1"))
        lambdas = {k: float(hp[k]) for k in (
            "lambda_ph_dur", "lambda_word_dur", "lambda_sent_dur",
            "lambda_f0", "lambda_uv", "lambda_energy", "lambda_cwt",
            "lambda_cwt_stats") if k in hp}
        losses = fastspeech2_loss(
            out, batch, self.model_cfg, mel_loss_and_lambda=mel_cfg,
            lambdas=lambdas, pitch_loss=str(hp.get("pitch_loss", "l1")))
        losses["loss"] = losses["total"]   # trainer-facing alias
        return losses["total"], losses

    def _get_step_fn(self, shapes):
        if shapes not in self._step_fns:
            optimizer = self.optimizer

            def step_fn(state, batch):
                import optax
                (loss, losses), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(state["params"], batch)
                updates, new_opt = optimizer.update(
                    grads, state["opt_state"], state["params"])
                new_params = optax.apply_updates(state["params"], updates)
                return ({"params": new_params, "opt_state": new_opt,
                         "step": state["step"] + 1}, losses)

            repl = meshlib.replicated(self.mesh)
            self._step_fns[shapes] = jax.jit(
                step_fn, out_shardings=(repl, repl), donate_argnums=(0,))
        return self._step_fns[shapes]

    def train_step(self, state, batch, rng=None):
        shapes = (batch["tokens"].shape, batch["mels"].shape)
        batch = meshlib.shard_batch(batch, self.mesh)
        return self._get_step_fn(shapes)(state, batch)

    def val_step(self, state, batch, rng=None):
        batch = meshlib.shard_batch(batch, self.mesh)
        _, losses = self._loss(state["params"], batch)
        return {k: float(v) for k, v in losses.items()}

    def val_figures(self, state, batch) -> Dict:
        """GT-vs-predicted mel figures for the first validation batch
        (reference: tasks/tts/tts_base.py:224-245 plot_mel)."""
        from fastdiff_tpu.utils.plot import spec_to_figure
        out = self._apply_train(
            state["params"], {k: jnp.asarray(v) for k, v in batch.items()})
        figs = {}
        n_plots = min(int(self.hparams.get("num_valid_plots", 2)),
                      batch["mels"].shape[0], 2)
        for b in range(n_plots):
            t_valid = int((batch["mel2ph"][b] > 0).sum()) or batch["mels"].shape[1]
            gt = np.asarray(batch["mels"])[b, :t_valid]
            pred = np.asarray(out["mel"])[b, :t_valid]
            stacked = np.concatenate([gt, pred], axis=1)   # bins side by side
            figs[f"mel_val_{b}"] = spec_to_figure(
                stacked, title=f"val {b}: GT (left) vs pred (right)")
        return figs

    # -- data --------------------------------------------------------------
    def _loader(self, prefix: str, batch_size: int, endless: bool) -> Iterator:
        if not hasattr(self, "_datasets"):
            self._datasets = {}
        if prefix not in self._datasets:   # cache across validations
            self._datasets[prefix] = VocoderDataset(self.hparams, prefix)
        ds = self._datasets[prefix]
        n_mels = self.audio_cfg.num_mels
        stream = endless_index_stream(
            len(ds), self.train_cfg.seed, endless,
            jax.process_index(), jax.process_count()) if endless else \
            iter(range(len(ds)))
        buf = []
        for idx in stream:
            item = ds[idx]
            if "phone" not in item:
                continue
            buf.append(item)
            if len(buf) == batch_size:
                token_pad = _round_up(max(len(i["phone"]) for i in buf), 8)
                frame_pad = _round_up(max(i["mel"].shape[0] for i in buf), 32)
                yield collate_tts(buf, token_pad, frame_pad, n_mels,
                                  pitch_type=self.model_cfg.pitch_type,
                                  pitch_norm=self.model_cfg.pitch_norm)
                buf = []

    def train_dataloader(self):
        return self._loader("train", self.train_cfg.max_sentences, True)

    def val_dataloader(self):
        return self._loader("valid", max(1, self.train_cfg.max_valid_sentences),
                            False)

    # -- inference ---------------------------------------------------------
    def infer_to_wav(self, state, tokens: np.ndarray, out_path: str,
                     vocoder=None) -> np.ndarray:
        """tokens (T_ph,) -> mel -> waveform via the vocoder registry
        (tts_base.py after_infer role)."""
        out = fastspeech2_apply(
            state["params"], jnp.asarray(tokens)[None, :], self.model_cfg)
        t_valid = int(out["mel_mask"][0].sum())
        mel = np.asarray(out["mel"])[0, :t_valid]
        if vocoder is None:
            from fastdiff_tpu.vocoders.base import get_vocoder_cls
            vocoder = get_vocoder_cls(self.hparams)(self.hparams)
        wav = vocoder.spec2wav(mel)
        if out_path:
            audio_io.save_wav(wav / max(1e-9, np.abs(wav).max()), out_path,
                              self.audio_cfg.sample_rate)
        return wav
