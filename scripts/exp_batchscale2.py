"""Round-3 batch anti-scaling investigation, part 2 — clean-session matrix
plus a device trace of the offender.

Run ALONE on the host (one CPU: any concurrent work corrupts timings):
    python scripts/exp_batchscale2.py conv    # conv variants x batch
    python scripts/exp_batchscale2.py trace   # xplane trace cur@b4 -> top ops
    python scripts/exp_batchscale2.py model   # full sampler b=1..8
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.utils.profiling import device_timer_slope, force

LENGTH = 864 * 256
CIN = COUT = 32


def health_gate(max_wait=1200):
    probe = jax.jit(lambda v: v * 2)
    force(probe(jnp.ones((8, 128))))
    deadline = time.time() + max_wait
    while True:
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            force(probe(jnp.ones((8, 128))))
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times)) * 1e3
        print(f"| tiny-op forced probe {lat:.1f} ms", flush=True)
        if lat < 30.0 or time.time() > deadline:
            return lat
        time.sleep(30)


def conv_params(rng):
    return {"w": jnp.asarray(rng.standard_normal((3, CIN, COUT)) * 0.1,
                             jnp.float32),
            "b": jnp.zeros((COUT,), jnp.float32)}


def conv_oshift(params, x, *, dilation=1, dtype=jnp.bfloat16, flat=False):
    """Single dot against tap-concatenated weights; shifted OUTPUT adds.
    ``flat=True`` additionally reshapes the contiguous padded operand to 2-D
    (B*(L+2p), C) so the dot has an explicit flat M dim."""
    w = fnn.conv_weight(params).astype(dtype)
    x = x.astype(dtype)
    k, cin, cout = w.shape
    pad = dilation * ((k - 1) // 2)
    b, length, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    wcat = jnp.transpose(w, (1, 0, 2)).reshape(cin, k * cout)
    if flat:
        t = jnp.dot(xp.reshape(b * (length + 2 * pad), cin), wcat,
                    preferred_element_type=jnp.float32)
        t = t.reshape(b, length + 2 * pad, k, cout)
    else:
        t = jnp.dot(xp, wcat, preferred_element_type=jnp.float32)
        t = t.reshape(b, length + 2 * pad, k, cout)
    y = None
    for tap in range(k):
        term = jax.lax.slice_in_dim(t, tap * dilation,
                                    tap * dilation + length, axis=1)[:, :, tap, :]
        y = term if y is None else y + term
    return (y + params["b"][None, None, :]).astype(dtype)


def conv_vmapped(params, x, *, dtype=jnp.bfloat16):
    """vmap of the b=1 program over the batch axis."""
    def one(xi):
        return fnn.conv1d_dot(params, xi[None], compute_dtype=dtype)[0]
    return jax.vmap(one)(x)


def bench_conv():
    rng = np.random.default_rng(0)
    p = conv_params(rng)
    # correctness
    x = jnp.asarray(rng.standard_normal((3, 4096, CIN)), jnp.float32)
    ref = fnn.conv1d_dot(p, x)
    for name, fn in (("oshift", lambda: conv_oshift(p, x, dtype=jnp.float32)),
                     ("oshift_flat", lambda: conv_oshift(p, x, dtype=jnp.float32, flat=True)),
                     ("vmap", lambda: conv_vmapped(p, x, dtype=jnp.float32))):
        err = float(jnp.max(jnp.abs(ref - fn())))
        print(f"| {name} max err {err:.2e}")
        assert err < 1e-3, name

    w0 = fnn.conv_weight(p).astype(jnp.bfloat16)[0]
    variants = {
        "cur": lambda xx: fnn.conv1d_dot(p, xx, compute_dtype=jnp.bfloat16),
        "oshift": lambda xx: conv_oshift(p, xx),
        "vmap": lambda xx: conv_vmapped(p, xx),
        # diagnostics: the dot WITHOUT pad/shift structure
        "puredot": lambda xx: jnp.dot(xx, w0,
                                      preferred_element_type=jnp.float32),
        "dot2d": lambda xx: jnp.dot(
            xx.reshape(-1, xx.shape[-1]), w0,
            preferred_element_type=jnp.float32),
    }
    # CHAINED timing: K dependent applications inside ONE jitted call make
    # per-call device work ~10+ ms, dwarfing relay jitter that drowned the
    # raw sub-ms kernels (negative slopes under contention). Each iteration
    # consumes the previous output (scaled back to unit variance) so XLA
    # cannot CSE the chain.
    from fastdiff_tpu.utils.profiling import timed_pipeline
    K = 64

    def chained(fn, keep_ch):
        def run(xx):
            y = xx
            for _ in range(K):
                y = (fn(y)[..., :keep_ch] * 0.1).astype(xx.dtype)
            return y
        return run

    def dot2d_chained(xx):
        b, l, c = xx.shape
        y = xx
        for _ in range(K):
            y = (jnp.dot(y.reshape(b * l, c), w0,
                         preferred_element_type=jnp.float32)
                 .reshape(b, l, c).astype(jnp.bfloat16) * 0.1)
        return y

    for b in (1, 2, 4, 8):
        x = jnp.asarray(rng.standard_normal((b, LENGTH, CIN)), jnp.bfloat16)
        jitted = {name: jax.jit(chained(fn, CIN))
                  for name, fn in variants.items() if name != "dot2d"}
        jitted["dot2d"] = jax.jit(dot2d_chained)
        for fn in jitted.values():
            force(fn(x))                      # compile + warm
        best = {name: float("inf") for name in jitted}
        for _round in range(6):
            for name, fn in jitted.items():
                t1 = timed_pipeline(fn, x, n=2)
                t2 = timed_pipeline(fn, x, n=8)
                best[name] = min(best[name], (t2 - t1) / 6 / K * 1e3)
        row = [f"{name} {t:.3f} ({t/b*1e3:.0f}us/it)"
               for name, t in best.items()]
        print(f"| b={b}: " + "  ".join(row), flush=True)


def trace_conv(b=4):
    rng = np.random.default_rng(0)
    p = conv_params(rng)
    x = jnp.asarray(rng.standard_normal((b, LENGTH, CIN)), jnp.bfloat16)
    fn = jax.jit(lambda xx: fnn.conv1d_dot(p, xx, compute_dtype=jnp.bfloat16))
    force(fn(x))
    out_dir = f"/tmp/trace_conv_b{b}"
    os.system(f"rm -rf {out_dir}")
    jax.profiler.start_trace(out_dir)
    out = None
    for _ in range(30):
        out = fn(x)
    force(out)
    jax.profiler.stop_trace()
    report_trace(out_dir, calls=30)


def report_trace(out_dir, calls=1):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("| no trace file found under", out_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep device-lane events (TPU op executions live on pids with
    # 'TPU' / 'device' thread names); fall back to everything
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()}
    dev = [e for e in events if e["pid"] in dev_pids] or events
    agg = {}
    for e in dev:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e["dur"]
    total = sum(agg.values())
    print(f"| trace {out_dir}: {len(dev)} device events, "
          f"{total/1e3/calls:.3f} ms/call total")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"|   {dur/1e3/calls:8.3f} ms/call  {name[:90]}")


def bench_model():
    from fastdiff_tpu.config import DiffusionConfig, ModelConfig
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.sampler import make_param_sampler
    from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                              init_fastdiff)
    cfg = ModelConfig(use_pallas_block=False)
    params = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    frames = 864
    audio_len = frames * cfg.total_hop
    audio_sec = audio_len / 22050.0
    sampler = make_param_sampler(get_apply_fn(cfg), const)
    rng = np.random.default_rng(0)
    for b in (1, 2, 4, 8):
        mel = jnp.asarray(rng.standard_normal((b, frames, 80)), jnp.float32)
        fn = lambda m: sampler(params, jax.random.PRNGKey(1), m, audio_len)
        force(fn(mel))
        t = device_timer_slope(fn, mel, n1=4, n2=16, reps=4)
        agg = b * audio_sec / (t / 1e3)
        print(f"| sampler b={b}: {t:.2f} ms -> {t/b:.2f} ms/item, "
              f"aggregate {agg:.0f}x realtime", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "conv"
    print(f"| backend={jax.default_backend()}")
    health_gate()
    if which == "conv":
        bench_conv()
    elif which == "trace":
        trace_conv(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    elif which == "model":
        bench_model()
