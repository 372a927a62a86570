"""Layout-thrash hunt: compile the forward, count relayout copies in HLO.

The b=1 device trace (scripts/exp_trace_sampler.py) shows ~40% of sampler
device time is pure data movement: XLA assigns time-in-lanes layouts
({1,2,0}) to the big activations but the shifted-matmul/einsum formulations
force channel-minor operands, so relayout copies surround every dot.
Copies are visible in the compiled HLO with estimated cycles — so
formulation variants can be scored by COMPILE ONLY (fast, noise-免).

Usage: python scripts/exp_layout.py [fwd|variants]
"""

import re
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.models import fastdiff as M

FRAMES = 864
L = FRAMES * 256

_SHAPE_RE = re.compile(r"(bf16|f32|s32|pred)\[([\d,]*)\]")


def _bytes(shape_str):
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * (2 if dt == "bf16" else 4)


def copy_report(hlo_text, label=""):
    """Sum logical bytes of copy/reshape/transpose ops, grouped by shape."""
    agg = {}
    for m in re.finditer(r"%(copy|reshape|transpose)[.\d]* = ([^ ]+) ", hlo_text):
        kind, shape = m.groups()
        shape = shape.split("{")[0]
        key = (kind, shape)
        agg[key] = (agg.get(key, (0, 0))[0] + 1,
                    agg.get(key, (0, 0))[1] + _bytes(shape))
    total_mb = sum(b for _, b in agg.values()) / 2 ** 20
    n_ops = sum(c for c, _ in agg.values())
    print(f"| {label}: {n_ops} copy/reshape/transpose ops, "
          f"{total_mb:.1f} MB logical")
    for (kind, shape), (cnt, byt) in sorted(
            agg.items(), key=lambda kv: -kv[1][1])[:12]:
        if byt < 2 ** 20:
            continue
        print(f"|   {byt/2**20:8.1f} MB  x{cnt:2d}  {kind:9s} {shape}")
    return total_mb


def compile_fwd(cfg, params):
    mel = jnp.zeros((1, FRAMES, 80), jnp.float32)
    audio = jnp.zeros((1, L, 1), jnp.float32)
    t = jnp.ones((1, 1), jnp.float32)
    fn = jax.jit(lambda a, m, tt: M.fastdiff_apply(params, a, m, tt, cfg))
    return fn.lower(audio, mel, t).compile().as_text()


def main():
    cfg = ModelConfig(use_pallas_block=False)
    params = M.fuse_weight_norm(M.init_fastdiff(jax.random.PRNGKey(0), cfg))
    txt = compile_fwd(cfg, params)
    open("/tmp/fwd_hlo.txt", "w").write(txt)
    copy_report(txt, "forward baseline")




# ---------------------------------------------------------------------------
# NCL (channel-first, time-in-lanes) inner-loop variant
# ---------------------------------------------------------------------------

def inner4_nwc(x, skip, kern, bias, conv_ws, conv_bs):
    """Current production formulation (NWC shifted-matmul + grouped einsum)."""
    from fastdiff_tpu.ops import nn as fnn
    from fastdiff_tpu.ops.lvc import location_variable_convolution
    out = x
    for i in range(4):
        s = out + skip
        y = fnn.leaky_relu(s, 0.2)
        y = fnn.conv1d_dot({"w": conv_ws[i], "b": conv_bs[i]}, y,
                           dilation=3 ** i, compute_dtype=jnp.bfloat16)
        y = fnn.leaky_relu(y, 0.2)
        z = location_variable_convolution(y, kern[:, :, i], bias[:, :, i], 256)
        g = jax.nn.sigmoid(z[..., :32]) * jnp.tanh(z[..., 32:])
        out = s + g.astype(s.dtype)
    return out


def inner4_ncl(x, skip, kern_t, bias, conv_ws, conv_bs):
    """NCL world: x, skip are (B, C, L); kern_t is (B, F, layers, 2C, K*C);
    conv via native NCW convolution; LVC contracts (2C, K*C) @ (K*C, hop)
    per frame; gate channels are leading-dim slices."""
    b, c, length = x.shape
    frames = kern_t.shape[1]
    hop = length // frames
    out = x
    for i in range(4):
        d = 3 ** i
        s = out + skip
        y = jnp.maximum(s, s * 0.2)
        w = conv_ws[i].astype(jnp.bfloat16)          # (K, Cin, Cout)
        y = jax.lax.conv_general_dilated(
            y.astype(jnp.bfloat16), jnp.transpose(w, (2, 1, 0)),
            window_strides=(1,), padding=[(d, d)], rhs_dilation=(d,),
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32)
        y = y + conv_bs[i][None, :, None]
        y = jnp.maximum(y, y * 0.2).astype(jnp.bfloat16)
        # windows: (B, K*C, L) via shifted slices (pad 1 each side, K=3)
        yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1)))
        win = jnp.concatenate([yp[:, :, k:k + length] for k in range(3)],
                              axis=1)                 # (B, 3C, L)
        win = win.reshape(b, 3 * c, frames, hop)
        z = jnp.einsum("bfok,bkfh->bofh", kern_t[:, :, i].astype(jnp.bfloat16),
                       win, preferred_element_type=jnp.float32)
        z = z + jnp.transpose(bias[:, :, i], (0, 2, 1))[:, :, :, None]
        z = z.reshape(b, 2 * c, length)
        g = jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])
        out = s + g.astype(s.dtype)
    return out


def variants():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    conv_ws = [jnp.asarray(rng.standard_normal((3, 32, 32)) * 0.1,
                           jnp.float32) for _ in range(4)]
    conv_bs = [jnp.zeros((32,), jnp.float32) for _ in range(4)]

    x = jnp.asarray(rng.standard_normal((1, L, 32)), bf)
    skip = jnp.asarray(rng.standard_normal((1, L, 32)), bf)
    kern = jnp.asarray(rng.standard_normal((1, FRAMES, 4, 3, 32, 64)), bf)
    bias = jnp.asarray(rng.standard_normal((1, FRAMES, 4, 64)), jnp.float32)

    fn = jax.jit(lambda *a: inner4_nwc(*a))
    txt = fn.lower(x, skip, kern, bias, conv_ws, conv_bs).compile().as_text()
    copy_report(txt, "inner4 NWC (production)")

    xt = jnp.transpose(x, (0, 2, 1))
    st = jnp.transpose(skip, (0, 2, 1))
    # kern_t: (B, F, layers, 2C, K*C) — transposed contraction operand
    kern_t = jnp.transpose(kern.reshape(1, FRAMES, 4, 96, 64), (0, 1, 2, 4, 3))
    fn2 = jax.jit(lambda *a: inner4_ncl(*a))
    txt2 = fn2.lower(xt, st, kern_t, bias, conv_ws, conv_bs).compile().as_text()
    open("/tmp/ncl_hlo.txt", "w").write(txt2)
    copy_report(txt2, "inner4 NCL (time-in-lanes)")

    # parity check on a small shape (CPU-precision tolerant)
    xs = jnp.asarray(rng.standard_normal((1, 2048, 32)), bf)
    ss = jnp.asarray(rng.standard_normal((1, 2048, 32)), bf)
    ks = jnp.asarray(rng.standard_normal((1, 8, 4, 3, 32, 64)) * 0.1, bf)
    bs = jnp.zeros((1, 8, 4, 64), jnp.float32)
    ref = inner4_nwc(xs, ss, ks, bs, conv_ws, conv_bs)
    kst = jnp.transpose(ks.reshape(1, 8, 4, 96, 64), (0, 1, 2, 4, 3))
    got = inner4_ncl(jnp.transpose(xs, (0, 2, 1)), jnp.transpose(ss, (0, 2, 1)),
                     kst, bs, conv_ws, conv_bs)
    err = float(jnp.max(jnp.abs(ref - jnp.transpose(got, (0, 2, 1)))))
    print(f"| NCL parity max err: {err:.4f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    if mode == "fwd":
        main()
    else:
        variants()
    print("DONE", flush=True)
