"""Autoregressive MoL/MoG WaveNet vocoder task (mel -> waveform).

Makes the reference's *dead* r9y9 WaveNet trainable (reference:
modules/wavenet_vocoder/wavenet.py:64-485 — vendored, imported by nothing,
no task or config anywhere in its tree): teacher-forced mixture-NLL
training on the same binarized (mel, wav) crops the diffusion vocoder task
uses, plus fold/unfold batched AR synthesis for test_step.

Trainer contract is the shared one (training/trainer.py): ``build_state``,
``train_step``, ``val_step``, ``*_dataloader``, ``test_step`` — select with
``task: armol`` / ``run.py --hparams 'task=armol'``.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import AudioConfig, MeshConfig, TrainConfig
from fastdiff_tpu.data.dataset import (VocoderDataset, infer_item_iterator,
                                       train_batch_iterator)
from fastdiff_tpu.models.fastdiff import num_params
from fastdiff_tpu.models.wavenet_mol import (MoLWaveNetConfig,
                                             init_wavenet_mol,
                                             wavenet_generate,
                                             wavenet_mol_loss)
from fastdiff_tpu.parallel import mesh as meshlib
from fastdiff_tpu.training.optim import make_optimizer
from fastdiff_tpu.utils import audio_io


class MoLWaveNetTask:
    """AR WaveNet vocoder task (teacher-forced NLL training)."""

    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.audio_cfg = AudioConfig.from_hparams(hparams)
        self.train_cfg = TrainConfig.from_hparams(hparams)
        self.mesh = meshlib.make_mesh(MeshConfig.from_hparams(hparams))
        self.optimizer = make_optimizer(self.train_cfg)
        self.model_cfg = MoLWaveNetConfig.from_hparams(hparams)
        assert self.model_cfg.hop == int(hparams["hop_size"]), (
            "wn_upsample_scales must multiply to hop_size",
            self.model_cfg.upsample_scales, hparams["hop_size"])
        self._train_step_fn = None
        self._val_step_fn = None

    # -- state -------------------------------------------------------------
    def build_state(self, seed: int = None) -> Dict:
        seed = self.train_cfg.seed if seed is None else seed
        params = init_wavenet_mol(jax.random.PRNGKey(seed), self.model_cfg)
        print(f"| model params: {num_params(params) / 1e6:.3f}M")
        opt_state = self.optimizer.init(params)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.zeros((), jnp.int32)}
        return meshlib.replicate(state, self.mesh)

    # -- train/val ---------------------------------------------------------
    def _loss(self, params, batch, rng=None):
        return wavenet_mol_loss(params, batch["wavs"], batch["mels"],
                                self.model_cfg)

    def _make_train_step(self):
        optimizer = self.optimizer

        def step_fn(state, batch, rng):
            import optax
            loss, grads = jax.value_and_grad(self._loss)(
                state["params"], batch, rng)
            finite = jnp.isfinite(loss)
            for g in jax.tree_util.tree_leaves(grads):
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))

            def do_update(_):
                updates, new_opt = optimizer.update(
                    grads, state["opt_state"], state["params"])
                return optax.apply_updates(state["params"], updates), new_opt

            def skip_update(_):
                return state["params"], state["opt_state"]

            new_params, new_opt = jax.lax.cond(finite, do_update, skip_update,
                                               operand=None)
            metrics = {"loss": loss,
                       "nonfinite": 1.0 - finite.astype(jnp.float32)}
            return ({"params": new_params, "opt_state": new_opt,
                     "step": state["step"] + 1}, metrics)

        repl = meshlib.replicated(self.mesh)
        return jax.jit(step_fn, out_shardings=(repl, repl),
                       donate_argnums=(0,))

    def train_step(self, state, batch: Dict[str, np.ndarray], rng):
        if self._train_step_fn is None:
            self._train_step_fn = self._make_train_step()
        batch = meshlib.shard_batch(batch, self.mesh)
        return self._train_step_fn(state, batch, rng)

    def val_step(self, state, batch, rng):
        if self._val_step_fn is None:
            self._val_step_fn = jax.jit(
                lambda p, b: self._loss(p, b),
                out_shardings=meshlib.replicated(self.mesh))
        batch = meshlib.shard_batch(batch, self.mesh)
        return {"loss": self._val_step_fn(state["params"], batch)}

    # -- dataloaders (same binarized data as the diffusion vocoder) --------
    def train_dataloader(self):
        ds = VocoderDataset(self.hparams,
                            self.hparams.get("train_set_name", "train"),
                            shuffle=True)
        max_frames = self.train_cfg.max_samples // int(self.hparams["hop_size"])
        return train_batch_iterator(
            ds, self.train_cfg.max_sentences, max_frames,
            seed=self.train_cfg.seed,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
            endless=self.train_cfg.endless_ds)

    def val_dataloader(self):
        if getattr(self, "_val_ds", None) is None:
            self._val_ds = VocoderDataset(
                self.hparams, self.hparams.get("valid_set_name", "valid"),
                shuffle=False)
        max_frames = self.train_cfg.max_samples // int(self.hparams["hop_size"])
        return train_batch_iterator(
            self._val_ds, max(1, self.train_cfg.max_valid_sentences),
            max_frames, seed=self.train_cfg.seed, endless=False)

    def test_dataloader(self):
        ds = VocoderDataset(self.hparams,
                            self.hparams.get("test_set_name", "test"))
        return infer_item_iterator(ds)

    # -- inference ---------------------------------------------------------
    def sampler_constants(self):
        """No diffusion schedule — AR synthesis (trainer contract no-op)."""
        return None

    def make_test_sampler(self, state, constants):
        """Generation happens inside test_step (fold/unfold AR scan)."""
        return None

    def test_step(self, state, sample: Dict, sampler, gen_dir: str,
                  key) -> Dict:
        """AR synthesis of one utterance + wav dumping (``sampler`` unused —
        generation is the fold/unfold scan in models/wavenet_mol.py)."""
        mel = jnp.asarray(np.asarray(sample["mels"]))
        t0 = time.time()
        wav = wavenet_generate(
            state["params"], mel, self.model_cfg, key,
            target=int(self.hparams.get("wn_fold_target", 12800)),
            overlap=int(self.hparams.get("wn_fold_overlap", 512)))
        gen_time = time.time() - t0
        os.makedirs(gen_dir, exist_ok=True)
        item_name = sample["item_name"]
        sr = self.audio_cfg.sample_rate
        wav_out = wav / max(1e-9, np.abs(wav).max())
        audio_io.save_wav(wav_out,
                          os.path.join(gen_dir, f"{item_name}_pred.wav"), sr)
        if "wavs" in sample and self.hparams.get("save_gt", True):
            gt = np.asarray(sample["wavs"])[0, :, 0]
            gt = gt / max(1e-9, np.abs(gt).max())
            audio_io.save_wav(gt, os.path.join(gen_dir,
                                               f"{item_name}_gt.wav"), sr)
        rtf = gen_time * sr / max(len(wav), 1)
        return {"item_name": item_name, "rtf": rtf, "gen_seconds": gen_time,
                "audio_seconds": len(wav) / sr}
