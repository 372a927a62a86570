"""Device-trace the jitted TRAIN step at the reference recipe (batch 20 x
25600 crops) and print the per-op table — the same xplane treatment that
took inference from 9.3% to 18.7% MFU, applied to the 49.7 ms / 3.7% MFU
training step (r4 verdict item 3).

Questions the table answers:
- does the b=20 batched-dot lowering pay the same convolution-fusion
  pathology that cost 1.94 ms/sampler at inference b=4?
- where do the backward's transpose convolutions land (MXU dots vs gather
  or relayout fusions)?
- forward / backward / optimizer split (optimizer ops are elementwise
  multiply_add fusions over param shapes — recognizable by size).

Usage (ALONE on the TPU host): python scripts/exp_trace_train.py [route]
route in {xla, ncl_vjp, ncl_sr}
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import optax

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.losses import theta_timestep_loss
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.utils.profiling import force
from scripts.exp_trace_sampler import report_trace

BATCH, CROP = 20, 25600


def main(route="xla"):
    cfg = ModelConfig(use_pallas_block=False if route == "xla" else route)
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    alpha = jnp.asarray(hp.alpha)

    rng = np.random.default_rng(0)
    frames = CROP // 256
    mels = jnp.asarray(rng.standard_normal((BATCH, frames, 80)), jnp.float32)
    wavs = jnp.asarray(rng.standard_normal((BATCH, CROP, 1)) * 0.3,
                       jnp.float32)

    params = M.init_fastdiff(jax.random.PRNGKey(0), cfg)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(2e-4, weight_decay=0.0))
    opt_state = opt.init(params)

    def loss_fn(p, key):
        return theta_timestep_loss(
            lambda x, m, t: M.fastdiff_apply(p, x, m, t, cfg),
            key, mels, wavs, alpha)

    @jax.jit
    def step(p, s, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, key)
    force(loss)                                      # compile + warm
    calls = 10
    out_dir = f"/tmp/trace_train_{route}"
    os.system(f"rm -rf {out_dir}")
    jax.profiler.start_trace(out_dir)
    for i in range(calls):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(2 + i))
    force(loss)
    jax.profiler.stop_trace()
    report_trace(out_dir, calls=calls, top=40)


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    main(sys.argv[1] if len(sys.argv) > 1 else "xla")
    print("DONE", flush=True)
