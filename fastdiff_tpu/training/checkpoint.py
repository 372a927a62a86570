"""Native checkpoint IO: step-tagged, atomic, top-K + best retention.

Reproduces the observable behavior of the reference checkpoint layer
(reference: utils/trainer.py:348-437, utils/ckpt_utils.py:8-69):

- ``model_ckpt_steps_<N>.ckpt`` naming with keep-top-K pruning
  (trainer.py:400-405, num_ckpt_keep),
- ``model_ckpt_best.pt`` tracking the best ``valid_monitor_key``
  (trainer.py:406-416),
- atomic write via ``.part`` + rename (trainer.py:418-422),
- resume restores params, optimizer state and step counters
  (trainer.py:348-396); ``get_last_checkpoint`` globs the newest step.

Serialization is msgpack via ``flax.serialization`` over a pure pytree —
no pickle, no framework objects on disk. Released *torch* checkpoints are
imported separately (fastdiff_tpu/utils/ckpt_import.py).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(work_dir: str, step: int, state: dict,
                    num_keep: int = 3, is_best: bool = False) -> str:
    """Write ``state`` (a pytree dict) atomically; prune old checkpoints."""
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")
    blob = serialization.to_bytes(_to_numpy_tree(state))
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if is_best:
        best = os.path.join(work_dir, "model_ckpt_best.pt")
        with open(best + ".part", "wb") as f:
            f.write(blob)
        os.replace(best + ".part", best)
    for old in sorted(glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt")),
                      key=_ckpt_step)[:-num_keep]:
        os.remove(old)
        print(f"| Deleted old checkpoint: {os.path.basename(old)}")
    return path


def _ckpt_step(path: str) -> int:
    m = re.search(r"model_ckpt_steps_(\d+)\.ckpt", path)
    return int(m.group(1)) if m else -1


def get_last_checkpoint(work_dir: str,
                        steps: Optional[int] = None) -> Tuple[Optional[str], int]:
    """Newest (or pinned-step) checkpoint path + its step, like
    utils/ckpt_utils.py:8-25."""
    if steps:
        path = os.path.join(work_dir, f"model_ckpt_steps_{steps}.ckpt")
        return (path, steps) if os.path.exists(path) else (None, 0)
    paths = sorted(glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt")),
                   key=_ckpt_step)
    if not paths:
        return None, 0
    return paths[-1], _ckpt_step(paths[-1])


def load_checkpoint(path: str, target: dict) -> dict:
    """Restore a state pytree; ``target`` provides the structure/shapes."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(_to_numpy_tree(target), blob)
