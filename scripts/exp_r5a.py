"""Round-5a: settle the b=4 batch-scaling question (VERDICT r4 item 1).

BENCH_r04 printed b=4 at 0.81x the b=1 figure against the standing >=1.0x
bar, with the landed-but-unmeasured merged-batch block-diagonal NCL convs
(ops/nn.py) as the prime suspect.  This harness A/Bs the full b=4 sampler
across the batch-policy matrix with interleaved slope timing (the exp_r4e
methodology: one fresh jit closure per variant, traced under the variant's
trace-time globals; variants alternate within each rep so session drift
cancels; min over reps since contention noise is one-sided):

  ship        merged-batch convs ON (r4 shipped state)
  nomerge     merged-batch convs OFF (einsum batched dots — the revert)
  conv_only   only conv1d_ncl merged
  convt_only  only conv_transpose1d_ncl merged
  dotds       + selection-matmul downsample at b=4 (r4: 3/4 reps negative)
  fh4         + hop-8 fused head at b=4 (r4: -0.15 ms)

Run ALONE on the TPU host:  python scripts/exp_r5a.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import _jitted_sample
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.ops import lvc_block_ncl as NCL
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256

# (MERGE_CONV_MAX, MERGE_CONVT_MAX, DOT_DOWNSAMPLE_MAX_B, FH_MAX_B, WRES)
#
# ROUND 1 result (this harness, 4-tuples, healthy session): the r4
# merged-batch conv1d kron path WAS the b=4 regression —
#   nomerge 23.67 | convt_only 23.98 | dotds 29.23 | conv_only 29.97 |
#   ship(merged) 30.41 | fh4 30.55 ms   (all bit-exact vs ship <= 5.3e-2,
#   merged-vs-einsum bf16 reassociation)
# Production flipped to MERGE_*_MAX = 0.  Round 2 re-tests the b=1-gated
# wins on top of the nomerge base + the w-resident taug-head grid.
VARIANTS = {
    "base":      (0, 0, 1, 1, True),
    "nowres":    (0, 0, 1, 1, False),
    "convt":     (0, 8, 1, 1, True),
    "dotds":     (0, 0, 8, 1, True),
    "fh4":       (0, 0, 1, 8, True),
}


def set_policy(pol):
    fnn.MERGE_BATCH_CONV_MAX = pol[0]
    fnn.MERGE_BATCH_CONVT_MAX = pol[1]
    fnn.DOT_DOWNSAMPLE_MAX_B = pol[2]
    NCL.FH_MAX_B = pol[3]
    import fastdiff_tpu.ops.lvc_block_pallas as PB
    PB.TAUG_HEAD_W_RESIDENT = pol[4]


def health_gate():
    import time
    x = jnp.ones((256, 256))
    force(x @ x)
    ts = []
    for _ in range(6):
        t0 = time.time()
        force(x @ x)
        ts.append(1e3 * (time.time() - t0))
    ms = float(np.median(ts))
    print(f"| health: forced tiny op {ms:.1f} ms {'OK' if ms < 40 else 'SLOW'}")
    return ms


def main(batch=4):
    health_gate()
    frames = ((int(SECONDS * SR) // HOP + 127) // 128) * 128
    length = frames * HOP
    params = M.init_fastdiff(jax.random.PRNGKey(0),
                             ModelConfig(use_pallas_block=False))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, frames, 80)), jnp.float32)
    args = (jnp.asarray(const.beta), jnp.asarray(const.alpha),
            jnp.asarray(const.sigma), jnp.asarray(const.steps))
    apply_fn = M.get_apply_fn(ModelConfig(use_pallas_block="ncl"))

    runs, outs = {}, {}
    for name, pol in VARIANTS.items():
        set_policy(pol)

        def make(run_params=params):
            # fresh function identity per variant -> its own trace under
            # the globals set above (jit cache keys on denoise identity)
            def denoise(x, m, t):
                return apply_fn(run_params, x, m, t)

            def run(key=jax.random.PRNGKey(1)):
                return _jitted_sample(denoise, key, mel, *args, length,
                                      const.n_steps, False)
            return run

        run = make()
        outs[name] = np.asarray(run())          # compile + warm (forced)
        runs[name] = run
        print(f"| compiled {name} (policy {pol})", flush=True)
    set_policy(VARIANTS["ship"])

    ref = outs["ship"]
    for name, out in outs.items():
        if name == "ship":
            continue
        d = float(np.max(np.abs(out - ref)))
        print(f"| max |{name} - ship| = {d:.3e}")

    table = {name: [] for name in VARIANTS}
    for rep in range(4):
        row = []
        for name, run in runs.items():
            ms = device_timer_slope(run, n1=2, n2=8, reps=1)
            table[name].append(ms)
            row.append(f"{name} {ms:.2f}")
        print(f"| rep{rep}: " + " | ".join(row), flush=True)

    print(f"== b={batch} summary (min over reps, ms/sampler, ms/item) ==")
    for name, ts in sorted(table.items(), key=lambda kv: min(kv[1])):
        best = min(ts)
        print(f"| {name:11s} {best:7.2f} ms  {best / batch:6.2f} ms/item")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
