"""Round-5d: xplane-trace the taug-head w-resident grid A/B.

The full-sampler slope A/B (exp_r5b) could not resolve the expected
~0.36 ms/sampler w-traffic saving inside +-0.5 ms session noise; the
hardware profiler's per-op durations can.  Traces the b=1 N=4 'ncl'
sampler with TAUG_HEAD_W_RESIDENT off and on and prints both per-op
tables — compare the taug_head_matmul_5d custom-call lines.

Run ALONE on the TPU host:  python scripts/exp_r5d.py [b]
"""

import sys

sys.path.insert(0, ".")

import jax

import fastdiff_tpu.models.fastdiff as M
import fastdiff_tpu.ops.lvc_block_pallas as PB
from scripts import exp_trace_sampler


def main(b=1):
    for wres in (False, True):
        PB.TAUG_HEAD_W_RESIDENT = wres
        # get_apply_fn caches per config and the jitted sampler keys on the
        # apply_fn identity — clear so each variant re-traces under its
        # trace-time global
        M._APPLY_FNS.clear()
        print(f"==== TAUG_HEAD_W_RESIDENT={wres} ====", flush=True)
        exp_trace_sampler.main(b, "ncl")
    PB.TAUG_HEAD_W_RESIDENT = True


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
    print("DONE", flush=True)
