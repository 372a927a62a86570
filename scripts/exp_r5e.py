"""Round-5e: trace matrix — per-op device tables for the round-5 policy
candidates (the slope A/Bs in exp_r5b could not resolve ~0.3 ms inside
session noise; xplane per-op durations can).

  b=1 ncl           the shipped policy (post-r5a revert) — fresh budget
  b=1 ncl_fh @16k   all-blocks fused head at 64-frame tiles (hop 256):
                    in-kernel head dots at M=66 rows vs the r4 loss at M=34
  b=4 ncl           where does the remaining b=4/b=1 gap (5.92 vs ~5.5
                    ms/item) live after the conv-merge revert?

Run ALONE on the TPU host:  python scripts/exp_r5e.py
"""

import sys

sys.path.insert(0, ".")

import jax

import fastdiff_tpu.models.fastdiff as M
import fastdiff_tpu.ops.lvc_block_ncl as NCL
from scripts import exp_trace_sampler

CASES = [
    (1, "ncl", 8192),
    (1, "ncl_fh", 16384),
    (4, "ncl", 8192),
]


def main():
    for b, mode, tile in CASES:
        NCL.TILE_TARGET = tile
        M._APPLY_FNS.clear()
        print(f"==== b={b} mode={mode} tile={tile} ====", flush=True)
        exp_trace_sampler.main(b, mode)
    NCL.TILE_TARGET = 8192


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    main()
    print("DONE", flush=True)
