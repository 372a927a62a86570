"""CLI entry point: train or infer a task from a YAML config.

Usage (same surface as the reference, reference: tasks/run.py:6-42,
readme.md:85-133):

    python -m fastdiff_tpu.run --config fastdiff_tpu/configs/ljspeech.yaml \
        --exp_name my_exp --reset
    python -m fastdiff_tpu.run --config ... --exp_name my_exp --infer \
        --hparams 'test_input_dir=wavs,N=4'

The task class is resolved dynamically from ``hparams['task_cls']``.
"""

from __future__ import annotations

import jax
import numpy as np

from fastdiff_tpu.data.dataset import resolve_class
from fastdiff_tpu.utils.hparams import set_hparams


def run_task(hparams: dict):
    task_cls = resolve_class(hparams["task_cls"])
    task = task_cls(hparams)
    np.random.seed(int(hparams.get("seed", 1234)))

    from fastdiff_tpu.training.trainer import Trainer
    trainer = Trainer(task, hparams.get("work_dir") or
                      f"checkpoints/{hparams.get('exp_name', 'default')}")
    if hparams.get("infer"):
        return trainer.test()
    if hparams.get("validate"):
        state, _ = trainer.restore(task.build_state())
        val = trainer.evaluate(state, task.train_cfg.eval_max_batches)
        print(f"| validation: {val}")
        return val
    return trainer.fit()


def main():
    hparams = set_hparams()
    # persistent XLA/Mosaic compilation cache: big compiles (the N=1000
    # reverse-process scan is ~31 s cold) amortize across processes
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # multi-host TPU slices: initialize the distributed runtime before any
    # backend use so jax.devices() spans the slice (see parallel/mesh.py)
    from fastdiff_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(hparams)
    print(f"| jax devices: {jax.devices()}")
    run_task(hparams)


if __name__ == "__main__":
    main()
