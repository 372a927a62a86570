"""Round-3 experiment: does folding the batch dim into the matmul M dim fix
single-chip batch anti-scaling?

Round-2 finding (docs/PERF.md): sampler aggregate throughput FALLS with batch
(488x b=1 -> 225x b=4) and a single conv1d_dot at the full-rate shape costs
0.26 ms/item at b=2 but 0.41 ms/item at b=4 — XLA's layout/fusion choices
degrade when a batch axis is present at thin-channel shapes.

Hypothesis: reformulate shifted-matmul convs over a flattened (B*(L+2p), C)
operand so XLA never sees a batch axis — per-item 'same' zero-padding becomes
inter-item separator rows, outputs are exact (each output row only reads
within its own item's padded span).

Usage: python scripts/exp_batchfold.py [conv|model]
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

from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.utils.profiling import device_timer_slope, force


def conv1d_dot_folded(params, x, *, dilation=1, compute_dtype=None):
    """conv1d_dot with batch folded into the matmul M dimension.

    Pad each item by p on both sides (the 'same' zeros double as inter-item
    separators), flatten (B, L+2p, C) -> (B*(L+2p), C), run the K shifted
    dots on the flat array, reshape back and drop the 2p garbage rows per
    item. Output row m = i*(L+2p)+j reads flat rows m..m+2p which stay
    within item i's padded span -> exact.
    """
    w = fnn.conv_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k = w.shape[0]
    pad = dilation * ((k - 1) // 2)
    b, length, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    m = b * (length + 2 * pad)
    flat = xp.reshape(m, c)
    flat = jnp.pad(flat, ((0, 2 * pad), (0, 0)))
    y = None
    for tap in range(k):
        xs = jax.lax.slice_in_dim(flat, tap * dilation, tap * dilation + m,
                                  axis=0)
        term = jnp.dot(xs, w[tap], preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    y = y.reshape(b, length + 2 * pad, -1)[:, :length, :]
    return (y + params["b"][None, None, :]).astype(out_dtype)


def conv1d_dot_oshift(params, x, *, dilation=1, compute_dtype=None):
    """conv1d as ONE matmul against all taps concatenated on the N axis,
    combined by shifted OUTPUT slices.

    y[m] = sum_k xp[m + k*d] @ w[k]  ==  t = xp @ [w0|w1|..];
    y[m] = sum_k t[m + k*d, k-th N-block].  The matmul input is the plain
    contiguous padded array (XLA folds (B, L+2p) into M with no per-tap
    input slicing/copies); the shifted combines are fusible elementwise
    adds of views.
    """
    w = fnn.conv_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k, cin, cout = w.shape
    pad = dilation * ((k - 1) // 2)
    length = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    wcat = jnp.transpose(w, (1, 0, 2)).reshape(cin, k * cout)
    t = jnp.dot(xp, wcat, preferred_element_type=jnp.float32)
    t = t.reshape(xp.shape[0], xp.shape[1], k, cout)
    y = None
    for tap in range(k):
        term = jax.lax.slice_in_dim(t, tap * dilation, tap * dilation + length,
                                    axis=1)[:, :, tap, :]
        y = term if y is None else y + term
    return (y + params["b"][None, None, :]).astype(out_dtype)


def bench_conv():
    rng = np.random.default_rng(0)
    length = 864 * 256           # bench shape, full rate
    cin = cout = 32
    p = {"w": jnp.asarray(rng.standard_normal((3, cin, cout)) * 0.1,
                          jnp.float32),
         "b": jnp.zeros((cout,), jnp.float32)}

    # correctness first
    x = jnp.asarray(rng.standard_normal((4, 4096, cin)), jnp.float32)
    ref = fnn.conv1d_dot(p, x)
    got = conv1d_dot_folded(p, x)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"| folded conv max err vs current: {err:.2e}")
    assert err < 1e-4

    ref = fnn.conv1d_dot(p, x)
    got = conv1d_dot_oshift(p, x)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"| oshift conv max err vs current: {err:.2e}")
    assert err < 1e-4

    variants = {
        "cur": lambda xx: fnn.conv1d_dot(p, xx, compute_dtype=jnp.bfloat16),
        "oshift": lambda xx: conv1d_dot_oshift(p, xx,
                                               compute_dtype=jnp.bfloat16),
        "lax": lambda xx: fnn.conv1d(p, xx, compute_dtype=jnp.bfloat16,
                                     impl="lax"),
    }
    for b in (1, 2, 4, 8):
        x = jnp.asarray(rng.standard_normal((b, length, cin)), jnp.bfloat16)
        row = []
        for name, fn in variants.items():
            t = device_timer_slope(jax.jit(fn), x, n1=10, n2=40)
            row.append(f"{name} {t:.3f} ({t/b:.3f}/item)")
        print(f"| b={b}: " + "  ".join(row))


def bench_model():
    """Full sampler at b=1..8, current production path, for the aggregate
    throughput reference points."""
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
        t = device_timer_slope(fn, mel, n1=4, n2=16)
        agg = b * audio_sec / (t / 1e3)
        print(f"| sampler b={b}: {t:.2f} ms -> {t/b:.2f} ms/item, "
              f"aggregate {agg:.0f}x realtime")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "conv"
    print(f"| backend={jax.default_backend()}")
    probe = jax.jit(lambda v: v * 2)
    force(probe(jnp.ones((8, 128))))          # compile outside the probe
    deadline = time.time() + 1200
    while True:
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            force(probe(jnp.ones((8, 128))))
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times)) * 1e3
        print(f"| tiny-op forced probe {lat:.1f} ms", flush=True)
        if lat < 30.0:
            break
        if time.time() > deadline:
            print("| UNHEALTHY session after 20 min — numbers suspect")
            break
        time.sleep(30)
    if which in ("conv", "all"):
        bench_conv()
    if which in ("model", "all"):
        bench_model()
