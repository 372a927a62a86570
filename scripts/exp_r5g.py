"""Round-5g: settle the hop-8 fused-head b=1 gate with the hardware
profiler (the r4 gate was decided at +0.14 ms / 3-of-4 reps in a session
whose micro timings were unusable; the r5c re-run read the OPPOSITE sign
at similar noise).  Traces the b=1 N=4 'ncl' sampler with FH_MAX_B = 1
(fused head for the hop-8 block) and 0 (aug path + separate taug head)
and prints both per-op tables — compare the scan total and the hop-8
block + head lines.

Run ALONE on the TPU host:  python scripts/exp_r5g.py
"""

import sys

sys.path.insert(0, ".")

import jax

import fastdiff_tpu.models.fastdiff as M
import fastdiff_tpu.ops.lvc_block_ncl as NCL
from scripts import exp_trace_sampler


def main(b=1):
    for fh_b in (1, 0):
        NCL.FH_MAX_B = fh_b
        # get_apply_fn caches per config and the jitted sampler keys on the
        # apply_fn identity — clear so each variant re-traces under its
        # trace-time global
        M._APPLY_FNS.clear()
        print(f"==== FH_MAX_B={fh_b} ====", flush=True)
        exp_trace_sampler.main(b, "ncl")


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
    print("DONE", flush=True)
