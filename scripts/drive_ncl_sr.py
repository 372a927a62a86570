"""Correctness drive for the saved-residual training route on the real chip:
one jitted value_and_grad + AdamW step at the reference recipe with
use_pallas_block='ncl_sr', checking the loss and every grad leaf is finite
and the loss matches the XLA route to bf16 tolerance.

Run ALONE is not required (correctness only): python scripts/drive_ncl_sr.py
"""

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
    params = M.init_fastdiff(jax.random.PRNGKey(0), ModelConfig())
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(2e-4, weight_decay=0.0))
    opt_state = opt.init(params)

    results = {}
    for name in ("xla", "ncl_sr"):
        cfg = ModelConfig(use_pallas_block=False if name == "xla" else name)

        def loss_fn(p, key, cfg=cfg):
            return theta_timestep_loss(
                lambda x, m, t: M.fastdiff_apply(p, x, m, t, cfg),
                key, mels, wavs, alpha)

        @jax.jit
        def step(p, s, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, key)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss, grads

        p2, s2, loss, grads = step(params, opt_state, jax.random.PRNGKey(1))
        loss = float(loss)
        finite = all(bool(jnp.all(jnp.isfinite(g)))
                     for g in jax.tree_util.tree_leaves(grads))
        gnorm = float(optax.global_norm(grads))
        results[name] = (loss, gnorm, finite)
        print(f"| {name}: loss {loss:.6f} gnorm {gnorm:.4f} "
              f"finite={finite}", flush=True)

    lx, gx, _ = results["xla"]
    ls, gs, _ = results["ncl_sr"]
    print(f"| loss rel diff {abs(lx - ls) / max(abs(lx), 1e-9):.2e}; "
          f"gnorm rel diff {abs(gx - gs) / max(abs(gx), 1e-9):.2e}")
    ok = (all(r[2] for r in results.values())
          and abs(lx - ls) / max(abs(lx), 1e-9) < 5e-2
          and abs(gx - gs) / max(abs(gx), 1e-9) < 1e-1)
    print("DRIVE", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
