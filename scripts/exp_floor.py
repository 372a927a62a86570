"""Round-3 decisive perf experiments: component MXU floors + lax.map batching.

Two questions, one session each (run ALONE; one CPU host):

1. ``floor``: what is the sum of un-beatable component floors of the
   denoiser forward at the bench shape?  Each hot component is timed as an
   isolated jitted program at its exact production shape, including
   idealized variants (pre-built operands, padded-to-128 dots).  The sum
   bounds what ANY fusion (Pallas or otherwise) can reach — the
   kill-criterion instrument for VERDICT round-3 item 2.

2. ``map``: does ``lax.map`` over items inside one jit restore LINEAR batch
   scaling (per-item cost == b=1 cost), where the batched program
   anti-scales (488x -> 225x aggregate, docs/PERF.md)?

Methodology: CHAINED timing — K data-dependent applications inside one
jitted call (output feeds the next input so XLA cannot CSE), two pipeline
sizes, slope over the difference.  Sub-ms isolated ops under relay
contention read negative with plain slope timing; the chain makes per-call
device work ~10 ms which dwarfs the jitter (same approach that settled the
conv anti-scaling numbers, scripts/exp_batchscale2.py).

Usage: python scripts/exp_floor.py floor|map
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import ModelConfig, DiffusionConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import sampling_given_noise_schedule
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.ops.lvc import location_variable_convolution
from fastdiff_tpu.utils.profiling import device_timer_slope, force, timed_pipeline

FRAMES = 864
HOP = 256
L = FRAMES * HOP
C = 32


def health_gate():
    probe = jax.jit(lambda v: v * 2)
    force(probe(jnp.ones((8, 128))))
    for _ in range(20):
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            force(probe(jnp.ones((8, 128))))
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times)) * 1e3
        print(f"| tiny-op forced probe {lat:.1f} ms", flush=True)
        if lat < 30.0:
            return
        time.sleep(30)


def chained_ms(step, x0, K=32, reps=4, n1=2, n2=8):
    """ms per application of ``step`` (x -> x, same shape/dtype), measured
    as a K-deep dependent chain inside one jit, two-point pipelined."""
    def run(x):
        y = x
        for _ in range(K):
            y = step(y)
        return y
    fn = jax.jit(run)
    force(fn(x0))
    best = float("inf")
    for _ in range(reps):
        t1 = timed_pipeline(fn, x0, n=n1)
        t2 = timed_pipeline(fn, x0, n=n2)
        best = min(best, (t2 - t1) / (n2 - n1) / K)
    return best * 1e3


def floors():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # ---- LVC dot variants (block-2 shape), pre-built operands ----------
    # chain: the next dot's LHS adds 0*scalar(prev) — fused into the dot
    # read, so the chain dependency is free.
    win = jnp.asarray(rng.standard_normal((FRAMES, HOP, 97)), bf)
    ker = jnp.asarray(rng.standard_normal((FRAMES, 97, 64)), bf)
    win128 = jnp.pad(win, ((0, 0), (0, 0), (0, 31)))
    ker128 = jnp.pad(ker, ((0, 0), (0, 31), (0, 64)))
    w2 = win128.reshape(432, 2, HOP, 128)
    win2 = jnp.concatenate([
        jnp.pad(w2[:, 0], ((0, 0), (0, 0), (0, 128))),
        jnp.pad(w2[:, 1], ((0, 0), (0, 0), (128, 0)))], axis=1)  # (432,512,256)
    k2 = jnp.pad(ker, ((0, 0), (0, 31), (0, 0))).reshape(432, 2, 128, 64)
    ker2 = jnp.concatenate([
        jnp.pad(k2[:, 0], ((0, 0), (0, 0), (0, 64))),
        jnp.pad(k2[:, 1], ((0, 0), (0, 0), (64, 0)))], axis=1)  # (432,256,128)

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def dot_chain(w, k, label, gflop):
        def step(carry):
            # carry is a data-dependent ~0 scalar; the broadcast add fuses
            # into the dot's operand read (x*0 would risk constant folding)
            out = bdot(w + carry, k)
            return (out[0, 0, 0] * 1e-30).astype(bf)
        ms = chained_ms(step, jnp.zeros((), bf))
        mfu = gflop / (ms * 1e-3) / 197e3
        print(f"| {label:36s}: {ms:7.3f} ms  ({100*mfu:4.1f}% MFU)",
              flush=True)
        return ms

    gf_cur = 2 * FRAMES * HOP * 97 * 64 / 1e9
    gf_pad = 2 * FRAMES * HOP * 128 * 128 / 1e9
    gf_2f = 2 * 432 * 512 * 256 * 128 / 1e9
    t_cur = dot_chain(win, ker, "lvc dot cur (864,256,97)@(97,64)", gf_cur)
    dot_chain(win128, ker128, "lvc dot pad128 (864,256,128)@(128,128)", gf_pad)
    dot_chain(win2, ker2, "lvc dot 2frame (432,512,256)@(256,128)", gf_2f)

    # ---- full LVC op (window build + dot + bias): diff vs dot = tap tax
    kfull = jnp.asarray(rng.standard_normal((1, FRAMES, 3, C, 64)), bf)
    bia = jnp.asarray(rng.standard_normal((1, FRAMES, 64)), jnp.float32)

    def lvc_step(y):
        out = location_variable_convolution(y, kfull, bia, HOP)
        return (out[..., :C] * 0.1).astype(bf)
    y0 = jnp.asarray(rng.standard_normal((1, L, C)), bf)
    t_lvc = chained_ms(lvc_step, y0)
    print(f"| {'lvc op full (win build + dot)':36s}: {t_lvc:7.3f} ms  "
          f"(win-build tax {t_lvc - t_cur:+.3f})", flush=True)

    # ---- conv floors per dilation (block-2 length) ---------------------
    p = {"w": jnp.asarray(rng.standard_normal((3, C, C)) * 0.1, jnp.float32),
         "b": jnp.zeros((C,), jnp.float32)}
    for d in (1, 3, 9, 27):
        ms = chained_ms(
            lambda y, d=d: (fnn.conv1d_dot(p, y, dilation=d, compute_dtype=bf)
                            * 0.1).astype(bf), y0)
        print(f"| {'conv1d_dot d=%2d' % d:36s}: {ms:7.3f} ms", flush=True)

    # ---- gate + residual ----------------------------------------------
    zw = jnp.asarray(rng.standard_normal((1, L, 64)), jnp.float32)

    def gate_step(x):
        g = jax.nn.sigmoid(zw[..., :C] + x * 1e-30) * jnp.tanh(zw[..., C:])
        return (x + g.astype(x.dtype)) * 0.5
    print(f"| {'gate+residual (L,64)->(L,32)':36s}: "
          f"{chained_ms(gate_step, y0):7.3f} ms", flush=True)

    # ---- one inner layer + 4-layer inner loop --------------------------
    skip = jnp.asarray(rng.standard_normal((1, L, C)), bf)

    def layer_step(x):
        s = x + skip
        yy = fnn.leaky_relu(s, 0.2)
        yy = fnn.conv1d_dot(p, yy, dilation=1, compute_dtype=bf)
        yy = fnn.leaky_relu(yy, 0.2)
        zz = location_variable_convolution(yy, kfull, bia, HOP)
        g = jax.nn.sigmoid(zz[..., :C]) * jnp.tanh(zz[..., C:])
        return ((s + g.astype(s.dtype)) * 0.5).astype(bf)
    print(f"| {'one inner layer (hop 256)':36s}: "
          f"{chained_ms(layer_step, y0):7.3f} ms", flush=True)

    def inner4_step(x):
        out = x
        for i in range(4):
            s = out + skip
            yy = fnn.leaky_relu(s, 0.2)
            yy = fnn.conv1d_dot(p, yy, dilation=3 ** i, compute_dtype=bf)
            yy = fnn.leaky_relu(yy, 0.2)
            zz = location_variable_convolution(yy, kfull, bia, HOP)
            g = jax.nn.sigmoid(zz[..., :C]) * jnp.tanh(zz[..., C:])
            out = s + g.astype(s.dtype)
        return (out * 0.5).astype(bf)
    print(f"| {'4-layer inner loop (hop 256)':36s}: "
          f"{chained_ms(inner4_step, y0, K=8):7.3f} ms", flush=True)

    # ---- full forward + sampler baseline -------------------------------
    cfg = ModelConfig()
    params = M.init_fastdiff(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((1, FRAMES, 80)), jnp.float32)
    t = jnp.ones((1, 1), jnp.float32)

    def fwd_step(a):
        out = M.fastdiff_apply(params, a, mel, t, cfg)
        return out * 0.5
    a0 = jnp.asarray(rng.standard_normal((1, L, 1)), jnp.float32)
    print(f"| {'full forward':36s}: "
          f"{chained_ms(fwd_step, a0, K=8):7.3f} ms", flush=True)

    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    def sample1(key, m):
        return sampling_given_noise_schedule(
            lambda xx, mm, tt: M.fastdiff_apply(params, xx, mm, tt, cfg),
            key, m, const, L)
    key = jax.random.PRNGKey(1)
    ms = device_timer_slope(jax.jit(sample1), key, mel, n1=5, n2=25)
    print(f"| {'sampler N=4 b=1':36s}: {ms:7.3f} ms "
          f"-> {10032.0 / ms:.0f}x realtime", flush=True)


def map_batching():
    rng = np.random.default_rng(0)
    cfg = ModelConfig()
    params = M.init_fastdiff(jax.random.PRNGKey(0), cfg)
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    def denoise(xx, mm, tt):
        return M.fastdiff_apply(params, xx, mm, tt, cfg)

    def sample_batched(key, mels):
        return sampling_given_noise_schedule(denoise, key, mels, const, L)

    def sample_mapped(key, mels):
        keys = jax.random.split(key, mels.shape[0])

        def one(args):
            k, m = args
            return sampling_given_noise_schedule(denoise, k, m[None], const, L)[0]
        return jax.lax.map(one, (keys, mels))

    key = jax.random.PRNGKey(1)
    for b in (1, 2, 4, 8):
        mels = jnp.asarray(rng.standard_normal((b, FRAMES, 80)), jnp.float32)
        for name, fn in (("batched", jax.jit(sample_batched)),
                         ("lax.map", jax.jit(sample_mapped))):
            n1, n2 = (4, 16) if b <= 2 else (2, 8)
            ms = device_timer_slope(fn, key, mels, n1=n1, n2=n2)
            agg = b * 10032.0 / ms
            print(f"| b={b} {name:8s}: {ms:8.2f} ms/call  "
                  f"{ms / b:7.2f} ms/item  -> {agg:5.0f}x aggregate",
                  flush=True)


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    health_gate()
    mode = sys.argv[1] if len(sys.argv) > 1 else "floor"
    if mode == "floor":
        floors()
    elif mode == "map":
        map_batching()
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("DONE", flush=True)
