"""Round-5h: settle the rbg (TPU hardware RNG) sampler-noise draw against
the new FH_MAX_B=0 production base with 16 interleaved reps (the r5c read
was -0.15 ms median at 5/8 reps — below the decision bar).

Run ALONE on the TPU host:  python scripts/exp_r5h.py [batch]
"""

import sys

sys.path.insert(0, ".")

from scripts import exp_r5c

exp_r5c.VARIANTS = {
    "base": (0, False),   # production: no forced fh, threefry noise
    "rbg":  (0, True),    # TPU hardware RNG for the per-step draws
}

if __name__ == "__main__":
    exp_r5c.main(int(sys.argv[1]) if len(sys.argv) > 1 else 1, reps=16)
    print("DONE", flush=True)
