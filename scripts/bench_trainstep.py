"""Training-step benchmark at the reference recipe (batch 20 x 25600 crops).

Measures the full jitted train step (theta_timestep_loss value_and_grad +
grad clip + AdamW update) on the real chip, slope-timed, for each LVC-block
training implementation:

- xla:      the production path (shifted-matmul NWC convs)
- ncl_sr:   full-NCL training forward + SAVED-RESIDUAL megakernel VJP
            (ops/lvc_block_ncl.lvc_block_ncl_taug_sr — no forward
            recompute in the backward; the r5 structural fix the training
            trace attribution called for, docs/PERF.md)
- ncl_vjp:  NCL megakernel forward + unfused-recompute backward
            (ops/lvc_block_ncl.lvc_block_ncl custom VJP)
- nwc_vjp:  round-2 NWC megakernel forward + unfused-recompute backward
            (ops/lvc_block_pallas.lvc_block_fused custom VJP)

Whichever wins should be the training default (r3 verdict item 6).
Run ALONE on the TPU host:  python scripts/bench_trainstep.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import dataclasses

import optax

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.losses import theta_timestep_loss
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.utils.profiling import device_timer_slope, force

BATCH, CROP = 20, 25600


def main():
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    alpha = jnp.asarray(hp.alpha)

    rng = np.random.default_rng(0)
    frames = CROP // 256
    mels = jnp.asarray(rng.standard_normal((BATCH, frames, 80)), jnp.float32)
    wavs = jnp.asarray(rng.standard_normal((BATCH, CROP, 1)) * 0.3,
                       jnp.float32)
    batch = {"mels": mels, "wavs": wavs}

    variants = {
        "xla": ModelConfig(use_pallas_block=False),
        "ncl_sr": ModelConfig(use_pallas_block="ncl_sr"),
        "ncl_vjp": ModelConfig(use_pallas_block="ncl_vjp"),
        "nwc_vjp": ModelConfig(use_pallas_block=True),
    }
    base_params = M.init_fastdiff(jax.random.PRNGKey(0),
                                  variants["xla"])
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(2e-4, weight_decay=0.0))
    opt_state = opt.init(base_params)

    # train FLOPs ~ 3x forward (fwd + bwd-activations + bwd-weights);
    # forward = 2.369e5 FLOP/sample (XLA cost_analysis, docs/PERF.md)
    flops = 3 * 2.369e5 * CROP * BATCH

    results = {}
    for name, cfg in variants.items():
        def loss_fn(params, batch, key, cfg=cfg):
            return theta_timestep_loss(
                lambda x, m, t: M.fastdiff_apply(params, x, m, t, cfg),
                key, batch["mels"], batch["wavs"], alpha)

        @jax.jit
        def step(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        try:
            p, s, loss = step(base_params, opt_state, batch,
                              jax.random.PRNGKey(1))
            force(loss)
            ms = device_timer_slope(
                lambda: step(base_params, opt_state, batch,
                             jax.random.PRNGKey(2)), n1=4, n2=16, reps=3)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"| {name}: FAILED {repr(e)[:160]}")
            continue
        mfu = flops / (ms / 1e3) / 197e12
        results[name] = ms
        print(f"| {name}: {ms:.2f} ms/step = {1e3 / ms:.1f} steps/s, "
              f"MFU {mfu * 100:.1f}%  (loss {float(loss):.4f})")

    if results:
        best = min(results, key=results.get)
        print(f"| best: {best} ({results[best]:.2f} ms); "
              f"1M updates in {results[best] * 1e6 / 3.6e6:.1f} h single-chip")


if __name__ == "__main__":
    main()
