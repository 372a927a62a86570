"""FastDiff vocoder task: wires model + diffusion + data into the trainer.

The task-layer contract mirrors the reference
(reference: tasks/base_task.py:148-304, modules/FastDiff/task/FastDiff.py):
``build_state`` (model+optimizer init / resume), jitted ``train_step`` /
``val_step`` (theta_timestep_loss, FastDiff.py:44-57), and ``test_step``
(noise-schedule selection + sampling + wav dumping, FastDiff.py:60-119).

TPU-native differences: everything device-side is a pure jitted function over
explicit state pytrees; data parallelism is batch-dim NamedSharding over the
mesh (the gradient all-reduce is inserted by XLA, replacing DDP reducer
hooks); RNG is an explicit threaded key, split per step.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import (AudioConfig, DiffusionConfig, MeshConfig,
                                 ModelConfig, TrainConfig)
from fastdiff_tpu.data.dataset import (VocoderDataset, infer_item_iterator,
                                       train_batch_iterator)
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.losses import theta_timestep_loss
from fastdiff_tpu.models.fastdiff import (fastdiff_apply, init_fastdiff,
                                          num_params)
from fastdiff_tpu.parallel import mesh as meshlib
from fastdiff_tpu.training.optim import make_optimizer
from fastdiff_tpu.utils import audio_io


class FastDiffTask:
    """Conditional diffusion vocoder task (mel -> waveform)."""

    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.diff_cfg = DiffusionConfig.from_hparams(hparams)
        self.audio_cfg = AudioConfig.from_hparams(hparams)
        self.train_cfg = TrainConfig.from_hparams(hparams)
        self.mesh = meshlib.make_mesh(MeshConfig.from_hparams(hparams))
        self.optimizer = make_optimizer(self.train_cfg)
        self.hyperparams = schedules.compute_hyperparams_given_schedule(
            schedules.linear_beta_schedule(self.diff_cfg))
        self._alpha = jnp.asarray(self.hyperparams.alpha)
        self._train_step_fn = None
        self._val_step_fn = None
        self._param_apply_fn = None
        # EMA of params for eval/inference (common diffusion practice the
        # reference lacks); 0 disables.
        self.ema_decay = float(hparams.get("ema_decay", 0.0) or 0.0)
        # denoiser family: 'fastdiff' (default), 'wavenet' (DiffWave-style)
        # or 'pwg' (diffusion-conditioned ParallelWaveGAN) — the reference
        # ships the latter two as dead code; here they are trainable
        # (WaveNet_vocoder: modules/FastDiff/module/WaveNet.py;
        # diffusion PWG: parallel_wavegan/models/parallel_wavegan.py:23-231).
        self.denoiser_type = str(hparams.get("denoiser", "fastdiff"))
        if self.denoiser_type == "wavenet":
            from fastdiff_tpu.models.wavenet import WaveNetConfig
            self.model_cfg = WaveNetConfig.from_hparams(hparams)
        elif self.denoiser_type == "pwg":
            from fastdiff_tpu.models.pwg import PWGConfig
            self.model_cfg = PWGConfig.from_hparams(hparams)
        else:
            self.model_cfg = ModelConfig.from_hparams(hparams)

    def _init_params(self, key):
        if self.denoiser_type == "wavenet":
            from fastdiff_tpu.models.wavenet import init_wavenet
            return init_wavenet(key, self.model_cfg)
        if self.denoiser_type == "pwg":
            from fastdiff_tpu.models.pwg import init_pwg_diffusion
            return init_pwg_diffusion(key, self.model_cfg)
        return init_fastdiff(key, self.model_cfg)

    # -- state -------------------------------------------------------------
    def build_state(self, seed: int = None) -> Dict:
        seed = self.train_cfg.seed if seed is None else seed
        params = self._init_params(jax.random.PRNGKey(seed))
        print(f"| model params: {num_params(params) / 1e6:.3f}M")
        load_ckpt = self.hparams.get("load_ckpt", "")
        if load_ckpt:
            params = self._load_external_params(load_ckpt, params)
        opt_state = self.optimizer.init(params)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.zeros((), jnp.int32)}
        if self.ema_decay > 0:
            state["ema"] = jax.tree_util.tree_map(jnp.array, params)
        return meshlib.replicate(state, self.mesh)

    def _load_external_params(self, path: str, params):
        if path.endswith(".ckpt") or path.endswith(".pt"):
            try:
                from fastdiff_tpu.utils.ckpt_import import load_torch_checkpoint
                loaded = load_torch_checkpoint(path, self.model_cfg)
                print(f"| loaded torch checkpoint: {path}")
                return jax.tree_util.tree_map(jnp.asarray, loaded)
            except Exception:
                pass
        from fastdiff_tpu.training.checkpoint import load_checkpoint
        state = load_checkpoint(path, {"params": params})
        print(f"| loaded native checkpoint: {path}")
        return state["params"]

    # -- denoiser ----------------------------------------------------------
    def denoise_fn(self, params):
        cfg = self.model_cfg
        if self.denoiser_type == "wavenet":
            from fastdiff_tpu.models.wavenet import wavenet_apply

            def fn(x, mel, t):
                return wavenet_apply(params, x, mel, t, cfg)
            return fn
        if self.denoiser_type == "pwg":
            from fastdiff_tpu.models.pwg import pwg_diffusion_apply

            def fn(x, mel, t):
                return pwg_diffusion_apply(params, x, mel, t, cfg)
            return fn

        def fn(x, mel, t):
            return fastdiff_apply(params, x, mel, t, cfg)
        return fn

    def param_apply_fn(self):
        """Identity-stable ``apply(params, x, mel, t)`` — the static jit key
        for the param-traced sampler. Cached per frozen model config, so
        every state (checkpoints, EMA snapshots) and every task/vocoder
        instance with the same config shares one compiled sampler.

        Inference-only path: the whole-block Pallas megakernel is enabled
        per the ``use_pallas_block: auto`` policy (config.py); training
        (denoise_fn) routes per resolve_train_block — "ncl_vjp" on TPU,
        XLA path on CPU/GPU (r5 four-route bench, docs/PERF.md)."""
        if self._param_apply_fn is None:
            if self.denoiser_type == "wavenet":
                from fastdiff_tpu.models.wavenet import get_apply_fn
                cfg = self.model_cfg
            elif self.denoiser_type == "pwg":
                from fastdiff_tpu.models.pwg import get_apply_fn
                cfg = self.model_cfg
            else:
                from fastdiff_tpu.config import inference_model_config
                from fastdiff_tpu.models.fastdiff import get_apply_fn
                cfg = inference_model_config(self.model_cfg, self.hparams)
            self._param_apply_fn = get_apply_fn(cfg)
        return self._param_apply_fn

    # -- train/val ---------------------------------------------------------
    def _loss(self, params, batch, rng):
        return theta_timestep_loss(
            self.denoise_fn(params), rng, batch["mels"], batch["wavs"],
            self._alpha)

    def _make_train_step(self):
        optimizer = self.optimizer

        def step_fn(state, batch, rng):
            loss, grads = jax.value_and_grad(self._loss)(
                state["params"], batch, rng)
            # NaN-grad guard (the reference scans and aborts,
            # trainer.py:319-327; we skip the whole update instead).
            finite = jnp.isfinite(loss)
            for g in jax.tree_util.tree_leaves(grads):
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))

            def do_update(_):
                updates, new_opt = optimizer.update(
                    grads, state["opt_state"], state["params"])
                import optax
                return optax.apply_updates(state["params"], updates), new_opt

            def skip_update(_):
                return state["params"], state["opt_state"]

            new_params, new_opt = jax.lax.cond(finite, do_update, skip_update,
                                               operand=None)
            gnorm = optax_global_norm(grads)
            new_state = {"params": new_params, "opt_state": new_opt,
                         "step": state["step"] + 1}
            if self.ema_decay > 0:
                d = jnp.float32(self.ema_decay)
                new_state["ema"] = jax.tree_util.tree_map(
                    lambda e, q: e * d + q.astype(e.dtype) * (1 - d),
                    state["ema"], new_params)
            metrics = {"loss": loss, "grad_norm": gnorm,
                       "nonfinite": 1.0 - finite.astype(jnp.float32)}
            return new_state, metrics

        # batch sharding comes from the actual device_put placement
        # (shard_batch dp-shards when divisible, else replicates), so jit
        # only pins state/output shardings.
        repl = meshlib.replicated(self.mesh)
        return jax.jit(
            step_fn,
            out_shardings=(repl, repl),
            donate_argnums=(0,))

    def train_step(self, state, batch: Dict[str, np.ndarray], rng):
        if self._train_step_fn is None:
            self._train_step_fn = self._make_train_step()
            dp = self.mesh.shape["dp"]
            if batch["mels"].shape[0] % dp != 0:
                print(f"| WARNING: batch size {batch['mels'].shape[0]} not "
                      f"divisible by dp={dp}; running replicated (no data "
                      f"parallel speedup). Increase max_sentences.")
        batch = meshlib.shard_batch(batch, self.mesh)
        return self._train_step_fn(state, batch, rng)

    def _make_val_step(self):
        def step_fn(params, batch, rng):
            return self._loss(params, batch, rng)
        # no in_shardings: small val batches may be replicated, full ones
        # dp-sharded — jit follows the actual input placement.
        return jax.jit(step_fn, out_shardings=meshlib.replicated(self.mesh))

    def val_step(self, state, batch, rng):
        if self._val_step_fn is None:
            self._val_step_fn = self._make_val_step()
        batch = meshlib.shard_batch(batch, self.mesh)
        return {"loss": self._val_step_fn(state["params"], batch, rng)}

    # -- dataloaders -------------------------------------------------------
    def train_dataloader(self):
        ds = VocoderDataset(self.hparams, self.hparams.get("train_set_name", "train"),
                            shuffle=True)
        max_frames = self.train_cfg.max_samples // int(self.hparams["hop_size"])
        return train_batch_iterator(
            ds, self.train_cfg.max_sentences, max_frames,
            seed=self.train_cfg.seed,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
            endless=self.train_cfg.endless_ds)

    def val_dataloader(self):
        # dataset (lengths + index) cached across validations: the trainer
        # re-calls this every val_check_interval and reopening from disk
        # each time is wasted IO (round-1 weak spot)
        if getattr(self, "_val_ds", None) is None:
            self._val_ds = VocoderDataset(
                self.hparams, self.hparams.get("valid_set_name", "valid"),
                shuffle=False)
        max_frames = self.train_cfg.max_samples // int(self.hparams["hop_size"])
        return train_batch_iterator(
            self._val_ds, max(1, self.train_cfg.max_valid_sentences),
            max_frames, seed=self.train_cfg.seed, endless=False)

    def test_dataloader(self):
        ds = VocoderDataset(self.hparams, self.hparams.get("test_set_name", "test"))
        return infer_item_iterator(ds)

    # -- inference ---------------------------------------------------------
    def sampler_constants(self) -> schedules.SamplerConstants:
        sched = schedules.resolve_noise_schedule(self.hparams)
        return schedules.sampler_constants_for_schedule(sched, self.hyperparams)

    def make_test_sampler(self, state, constants):
        """Jitted sampler bound to this state's params.

        Params are a *traced* argument (fastdiff_tpu.diffusion.sampler.
        make_param_sampler): the compile cache is keyed on shapes + the
        task-cached apply_fn only, so sampling from a new checkpoint or an
        EMA snapshot reuses the compiled executable instead of recompiling
        the whole reverse process."""
        from fastdiff_tpu.diffusion.sampler import make_param_sampler
        psample = make_param_sampler(self.param_apply_fn(), constants)
        params = state["params"]

        def sample(key, mel, audio_length: int):
            return psample(params, key, mel, audio_length)
        return sample

    def test_step(self, state, sample: Dict, sampler, gen_dir: str,
                  key) -> Dict:
        """Generate one utterance and dump wavs (FastDiff.py:60-119).

        ``sampler`` comes from ``make_test_sampler`` (jitted, cache keyed on
        shapes). Mel frames are padded up to a bucket multiple (edge
        padding) so the sampler compiles once per bucket instead of once per
        utterance length; the waveform is trimmed back to frames * hop.
        """
        mel_np = np.asarray(sample["mels"])
        frames = mel_np.shape[1]
        bucket = int(self.hparams.get("infer_frame_bucket", 128))
        padded = ((frames + bucket - 1) // bucket) * bucket
        if padded != frames:
            mel_np = np.pad(mel_np, ((0, 0), (0, padded - frames), (0, 0)),
                            mode="edge")
        mel = jnp.asarray(mel_np)
        hop = int(self.hparams["hop_size"])
        t0 = time.time()
        wav = sampler(key, mel, padded * hop)
        wav = np.asarray(jax.block_until_ready(wav))[0, : frames * hop, 0]
        gen_time = time.time() - t0

        os.makedirs(gen_dir, exist_ok=True)
        item_name = sample["item_name"]
        sr = self.audio_cfg.sample_rate
        wav_out = wav / max(1e-9, np.abs(wav).max())
        audio_io.save_wav(wav_out, os.path.join(gen_dir, f"{item_name}_pred.wav"), sr)
        if "wavs" in sample and self.hparams.get("save_gt", True):
            gt = np.asarray(sample["wavs"])[0, :, 0]
            gt = gt / max(1e-9, np.abs(gt).max())
            audio_io.save_wav(gt, os.path.join(gen_dir, f"{item_name}_gt.wav"), sr)
        rtf = gen_time * sr / len(wav)
        return {"item_name": item_name, "rtf": rtf, "gen_seconds": gen_time,
                "audio_seconds": len(wav) / sr}


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
