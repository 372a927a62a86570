"""Round-5c: re-run the two ~1sigma r4 policy A/Bs on a healthy session
(VERDICT r4 item 6).

  fh8       hop-8 block fused head at b=1 under the plain 'ncl' policy
            (r4: +0.14 ms, 3/4 interleaved reps in a noisy session)
  rbg       TPU hardware RNG for the sampler's per-step noise draws
            (r4: +0.15 ms avg, ~2 sigma, deferred)

Each gate is either confirmed (more interleaved reps on a clean session)
or simplified away.  Run ALONE on the TPU host:  python scripts/exp_r5c.py
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
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256

# (FH_MAX_B, rbg)
VARIANTS = {
    "base":    (1, False),   # production: hop-8 fh at b=1, threefry
    "nofh8":   (0, False),
    "rbg":     (1, True),
}


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


def main(batch=1, reps=8):
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

    fh_default = NCL.FH_MAX_B
    runs = {}
    for name, (fh_b, rbg) in VARIANTS.items():
        NCL.FH_MAX_B = fh_b
        key = (jax.random.key(1, impl="rbg") if rbg
               else jax.random.PRNGKey(1))

        def make(run_params=params, run_key=key):
            def denoise(x, m, t):
                return apply_fn(run_params, x, m, t)

            def run():
                return _jitted_sample(denoise, run_key, mel, *args, length,
                                      const.n_steps, False)
            return run

        run = make()
        force(run())
        runs[name] = run
        print(f"| compiled {name} (fh_b={fh_b}, rbg={rbg})", flush=True)
    NCL.FH_MAX_B = fh_default

    table = {name: [] for name in VARIANTS}
    for rep in range(reps):
        row = []
        for name, run in runs.items():
            ms = device_timer_slope(run, n1=2, n2=8, reps=1)
            table[name].append(ms)
            row.append(f"{name} {ms:.2f}")
        print(f"| rep{rep}: " + " | ".join(row), flush=True)

    print(f"== b={batch} summary over {reps} interleaved reps ==")
    base = table["base"]
    for name, ts in table.items():
        deltas = [t - b for t, b in zip(ts, base)]
        print(f"| {name:7s} min {min(ts):6.2f}  med {np.median(ts):6.2f}  "
              f"delta-vs-base med {np.median(deltas):+5.2f} "
              f"({sum(d < 0 for d in deltas)}/{reps} reps faster)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
