"""Training engine: run-until-max_updates loop, validation, checkpointing.

Reproduces the observable behavior of the reference ``Trainer``
(reference: utils/trainer.py:23-521) without its structure:

- epoch-less loop until ``max_updates`` (trainer.py:230-268),
- sanity validation before training (trainer.py:221-223),
- validation every ``val_check_interval`` updates + checkpoint save with
  top-K retention and best-val tracking (trainer.py:248-251,398-437),
- resume from the newest step checkpoint, restoring optimizer state and
  step counters (trainer.py:118-127,348-396),
- scalar logging every ``tb_log_interval`` (trainer.py:254-256,487-508).

What is gone on purpose: process spawning, DDP wrappers, AMP plumbing and
device moves — multi-chip execution is one process with mesh-sharded jitted
steps, bf16 is a model-config dtype policy, and host->device transfer is
``jax.device_put`` with a batch sharding (fastdiff_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import itertools
import os
import sys
import time
from typing import Optional

import jax
import numpy as np

from fastdiff_tpu.training import checkpoint as ckpt
from fastdiff_tpu.utils.logging_utils import MeterBank, ScalarLogger


class Trainer:
    def __init__(self, task, work_dir: str):
        self.task = task
        self.cfg = task.train_cfg
        self.work_dir = work_dir or "checkpoints/default"
        os.makedirs(self.work_dir, exist_ok=True)
        self.is_main = jax.process_index() == 0
        self.logger = ScalarLogger(os.path.join(self.work_dir, "tb_logs"),
                                   enabled=self.is_main)
        self.best_val: Optional[float] = None

    # -- resume ------------------------------------------------------------
    def restore(self, state):
        pin = int(self.task.hparams.get("resume_from_checkpoint", 0) or 0)
        path, step = ckpt.get_last_checkpoint(self.work_dir, pin or None)
        if path is None:
            return state, 0
        host_state = {"params": state["params"],
                      "opt_state": state["opt_state"],
                      "step": np.zeros((), np.int32),
                      "best_val": np.zeros((), np.float32)}
        if "ema" in state:
            host_state["ema"] = state["ema"]
        restored = ckpt.load_checkpoint(path, host_state)
        bv = float(restored.get("best_val", 0.0))
        self.best_val = bv if bv > 0 else None
        from fastdiff_tpu.parallel import mesh as meshlib
        new_state = {"params": restored["params"],
                     "opt_state": restored["opt_state"],
                     "step": np.asarray(restored["step"], np.int32)}
        if "ema" in restored:
            new_state["ema"] = restored["ema"]
        state = meshlib.replicate(new_state, self.task.mesh)
        print(f"| restored checkpoint {os.path.basename(path)} (step {step})")
        return state, int(restored["step"])

    # -- validation --------------------------------------------------------
    def evaluate(self, state, max_batches: Optional[int] = None,
                 step: Optional[int] = None) -> dict:
        meters = MeterBank()
        rng = jax.random.PRNGKey(self.cfg.seed + 777)
        loader = self.task.val_dataloader()
        if max_batches is not None and max_batches >= 0:
            loader = itertools.islice(loader, max_batches)
        n, first_batch = 0, None
        for batch in loader:
            rng, sub = jax.random.split(rng)
            out = self.task.val_step(state, batch, sub)
            meters.update({k: float(v) for k, v in out.items()},
                          n=batch["mels"].shape[0])
            if first_batch is None:
                first_batch = batch
            n += 1
        result = meters.averages()
        if n == 0:
            result = {"loss": float("nan")}
        # validation figures (reference logs GT-vs-pred spectrograms during
        # TTS validation, tasks/tts/tts_base.py:224-245); skipped for the
        # pre-training sanity pass (step=None)
        if (step is not None and first_batch is not None and self.is_main
                and hasattr(self.task, "val_figures")):
            try:
                for tag, fig in self.task.val_figures(state, first_batch).items():
                    self.logger.log_figure(tag, fig, step)
            except Exception as e:   # figures must never kill training
                print(f"| WARNING: val_figures failed: {e}")
        return result

    def _maybe_save(self, state, step: int, val_metrics: dict):
        if not self.is_main:
            return
        monitor = val_metrics.get(
            self.cfg.valid_monitor_key.replace("val_", ""), None)
        is_best = False
        if monitor is not None and np.isfinite(monitor) and self.cfg.save_best:
            better = (self.best_val is None or
                      (monitor < self.best_val
                       if self.cfg.valid_monitor_mode == "min"
                       else monitor > self.best_val))
            if better:
                self.best_val = float(monitor)
                is_best = True
        host_state = {
            "params": state["params"], "opt_state": state["opt_state"],
            "step": np.asarray(step, np.int32),
            "best_val": np.asarray(self.best_val or 0.0, np.float32),
        }
        if "ema" in state:
            host_state["ema"] = state["ema"]
        path = ckpt.save_checkpoint(self.work_dir, step, host_state,
                                    num_keep=self.cfg.num_ckpt_keep,
                                    is_best=is_best)
        print(f"| saved {os.path.basename(path)}"
              + (" (best)" if is_best else ""))

    # -- main loop ---------------------------------------------------------
    def fit(self, state=None) -> dict:
        task = self.task
        if state is None:
            state = task.build_state()
        state, start_step = self.restore(state)

        # sanity validation (trainer.py:221-223)
        if self.cfg.num_sanity_val_steps:
            sanity = self.evaluate(
                state, max_batches=max(0, self.cfg.num_sanity_val_steps))
            print(f"| sanity val: {sanity}")

        rng = jax.random.PRNGKey(self.cfg.seed)
        rng = jax.random.fold_in(rng, start_step)
        train_iter = task.train_dataloader()
        meters = MeterBank()
        t_last = time.time()
        step = start_step

        try:
            for batch in train_iter:
                if step >= self.cfg.max_updates:
                    break
                rng, sub = jax.random.split(rng)
                state, metrics = task.train_step(state, batch, sub)
                step += 1

                if step % self.cfg.tb_log_interval == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t_last
                    t_last = time.time()
                    metrics["steps_per_sec"] = self.cfg.tb_log_interval / dt
                    meters.update(metrics)
                    self.logger.log(metrics, step, prefix="tr/")
                    extras = " ".join(
                        f"{k}={v:.4f}" for k, v in metrics.items()
                        if k not in ("loss", "steps_per_sec"))
                    print(f"| step {step}: loss={metrics.get('loss', float('nan')):.4f} "
                          f"{extras} {metrics['steps_per_sec']:.2f} it/s")
                    sys.stdout.flush()

                if step % self.cfg.val_check_interval == 0:
                    val = self.evaluate(state, self.cfg.eval_max_batches,
                                        step=step)
                    self.logger.log(val, step, prefix="val/")
                    print(f"| validation @ {step}: {val}")
                    self._maybe_save(state, step, val)
        except KeyboardInterrupt:
            print("| KeyboardInterrupt: saving checkpoint before exit.")
            self._maybe_save(state, step, {})
            raise

        val = self.evaluate(state, self.cfg.eval_max_batches)
        self._maybe_save(state, step, val)
        return {"state": state, "step": step, "val": val}

    # -- inference ---------------------------------------------------------
    def test(self, state=None) -> list:
        task = self.task
        if state is None:
            state = task.build_state()
        state, step = self.restore(state)
        # inference-only: prefer EMA params when tracked, fuse weight norm
        from fastdiff_tpu.models.fastdiff import fuse_weight_norm
        infer_params = state.get("ema", state["params"])
        state = {**state, "params": fuse_weight_norm(infer_params)}
        constants = task.sampler_constants()
        sampler = task.make_test_sampler(state, constants)
        gen_dir = os.path.join(
            self.work_dir,
            f"generated_{step}_{task.hparams.get('gen_dir_name', '')}")
        results = []
        # rbg keys on accelerators: sampler noise draws use the TPU hardware
        # RNG (r5h A/B: -0.18 ms/sampler); threefry on CPU for reproducible
        # test goldens. The impl rides the key through split().
        from fastdiff_tpu.diffusion.sampler import inference_key
        key = inference_key(self.cfg.seed)
        for sample in task.test_dataloader():
            key, sub = jax.random.split(key)
            res = task.test_step(state, sample, sampler, gen_dir, sub)
            print(f"| generated {res['item_name']}: rtf={res['rtf']:.4f}")
            results.append(res)
        if results:
            rtf = float(np.mean([r["rtf"] for r in results[1:]] or
                                [results[0]["rtf"]]))
            print(f"| mean RTF (excl. first/compile): {rtf:.4f} "
                  f"({1.0 / max(rtf, 1e-9):.1f}x realtime)")
        return results
