"""Round-5b: b=1 sampler glue closes (VERDICT r4 item 2).

Two levers from the r4 trace table (docs/PERF.md "where the remaining time
goes"):

  wres    taug_head_matmul_5d w-resident grid ordering — the (K, cout*rows)
          head-weight slab (~3.1 MB) is fetched once per LAYER instead of
          once per grid step (50 -> 12.6 MB/call of weight reads)
  fh*     all-blocks fused-head megakernel at LARGER tiles.  The r4 loss
          (7.23 vs 6.60 ms) ran tf=32 at hop 256 — the in-kernel head dots
          at M=34 of 128 MXU rows.  tf=128 runs them full-row AND still
          kills the 59 MB x2 kern_taug HBM round trip per block call.

Interleaved slope methodology (exp_r4e/r5a): one fresh jit closure per
variant traced under that variant's trace-time globals; variants alternate
within each rep; min over reps.

Run ALONE on the TPU host:  python scripts/exp_r5b.py [batch]
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
from fastdiff_tpu.ops import lvc_block_pallas as PB
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256

# (policy, TAUG_HEAD_W_RESIDENT, TILE_TARGET)
VARIANTS = {
    "ship":   ("ncl", False, 8192),
    "wres":   ("ncl", True, 8192),
    "fh8k":   ("ncl_fh", True, 8192),
    "fh16k":  ("ncl_fh", True, 16384),
    "fh32k":  ("ncl_fh", True, 32768),
}


def set_policy(pol):
    PB.TAUG_HEAD_W_RESIDENT = pol[1]
    NCL.TILE_TARGET = pol[2]


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


def main(batch=1):
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

    runs, outs = {}, {}
    for name, pol in VARIANTS.items():
        set_policy(pol)
        apply_fn = M.get_apply_fn(ModelConfig(use_pallas_block=pol[0]))

        def make(run_params=params, fn=apply_fn):
            def denoise(x, m, t):
                return fn(run_params, x, m, t)

            def run(key=jax.random.PRNGKey(1)):
                return _jitted_sample(denoise, key, mel, *args, length,
                                      const.n_steps, False)
            return run

        run = make()
        outs[name] = np.asarray(run())
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

    print(f"== b={batch} summary (min over reps, ms/sampler) ==")
    for name, ts in sorted(table.items(), key=lambda kv: min(kv[1])):
        print(f"| {name:7s} {min(ts):7.2f} ms  {min(ts) / batch:6.2f} ms/item")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
