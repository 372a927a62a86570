"""Round-5f: A/B the selection-matmul phase interleave (DOT_INTERLEAVE)
in conv_transpose1d_ncl at b=1 and b=4.

The r5 b=4 trace attributed 3.04 ms/sampler to the transpose-interleave
copies (6.8x their b=1 rate) on the block-2 upsampler; the dot interleave
replaces the copy with one 0/1 MXU dot per lane tile (bit-exact).  Same
interleaved-slope methodology as exp_r5a: one fresh jit closure per
variant traced under the variant's trace-time globals; variants alternate
within each rep so session drift cancels; min over reps.

Run ALONE on the TPU host:  python scripts/exp_r5f.py [batch]
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
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256

# DOT_INTERLEAVE_MIN_B values: 99 disables the dot interleave at any
# tested batch; 1 forces it on even at b=1
VARIANTS = {"il_off": 99, "il_on": 1}


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
    for name, flag in VARIANTS.items():
        fnn.DOT_INTERLEAVE_MIN_B = flag

        def make(run_params=params):
            def denoise(x, m, t):
                return apply_fn(run_params, x, m, t)

            def run(key=jax.random.PRNGKey(1)):
                return _jitted_sample(denoise, key, mel, *args, length,
                                      const.n_steps, False)
            return run

        run = make()
        outs[name] = np.asarray(run())
        runs[name] = run
        print(f"| compiled {name} (DOT_INTERLEAVE_MIN_B={flag})", flush=True)
    fnn.DOT_INTERLEAVE_MIN_B = 2

    d = float(np.max(np.abs(outs["il_on"] - outs["il_off"])))
    print(f"| max |il_on - il_off| = {d:.3e}  (expect 0: bit-exact)")

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
        print(f"| {name:7s} {best:7.2f} ms  {best / batch:6.2f} ms/item")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
