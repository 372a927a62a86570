"""Round-4b perf experiments, targeting the r4 trace's remaining glue
(docs/PERF.md "where the remaining time goes"):

  A. sampler state layout: (B, L, 1) vs (B, 1, L) scan state
     (sampler update select/add/RNG measured ~0.55 ms at (B, L, 1))
  B. taug_head_matmul_5d grid ordering: m-outer (shipped) vs w-resident
     (layer-outer) and a larger m_tile (heads measured 1.17 ms vs ~0.2
     analytic floor)
  C. nearest_downsample_ncl: lane-strided slice vs MXU selection-matmul
     (first-dblock downsample gather measured 0.58 ms)

Run ALONE on the TPU host:  python scripts/exp_r4b.py [A|B|C ...]
"""

import functools
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import _jitted_sample
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.ops.lvc_block_pallas import _head_mm5d_body
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256


def _bench_frames():
    frames = int(SECONDS * SR) // HOP
    return ((frames + 127) // 128) * 128          # bucket-pad like bench.py


def health_gate():
    x = jnp.ones((256, 256))
    import time
    force(x @ x)
    t0 = time.time()
    force(x @ x)
    ms = 1e3 * (time.time() - t0)
    print(f"| health: forced tiny op {ms:.1f} ms {'OK' if ms < 40 else 'SLOW'}")
    return ms


def _sampler_setup(batch=1):
    params = M.init_fastdiff(jax.random.PRNGKey(0),
                             ModelConfig(use_pallas_block=False))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    frames = _bench_frames()
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, frames, 80)), jnp.float32)
    args = (jnp.asarray(const.beta), jnp.asarray(const.alpha),
            jnp.asarray(const.sigma), jnp.asarray(const.steps))
    return params, const, mel, frames * HOP, args


def exp_a():
    print("== A: sampler state layout ==")
    params, const, mel, length, args = _sampler_setup()
    denoise = functools.partial(M.get_apply_fn(
        ModelConfig(use_pallas_block="ncl")), params)

    outs = {}
    for ncl in (False, True):
        def run(key, ncl=ncl):
            return _jitted_sample(denoise, key, mel, *args, length,
                                  const.n_steps, False, state_ncl=ncl)
        out = run(jax.random.PRNGKey(1))
        force(out)
        outs[ncl] = np.asarray(out)
        ms = device_timer_slope(lambda: run(jax.random.PRNGKey(1)),
                                n1=4, n2=16, reps=3)
        rt = SECONDS / (ms / 1e3)
        print(f"| state_ncl={ncl}: sampler {ms:.2f} ms -> {rt:.0f}x realtime")
    d = np.max(np.abs(outs[False] - outs[True]))
    print(f"| max |diff| between layouts: {d:.3e} (expect 0 — same RNG bits)")


def exp_d():
    print("== D: fused-head megakernel (ncl vs ncl_fh), b=1 and b=4 ==")
    for batch in (1, 4):
        params, const, mel, length, args = _sampler_setup(batch)
        outs = {}
        for blk in ("ncl", "ncl_fh"):
            denoise = functools.partial(M.get_apply_fn(
                ModelConfig(use_pallas_block=blk)), params)

            def run(key, d=denoise):
                return _jitted_sample(d, key, mel, *args, length,
                                      const.n_steps, False, state_ncl=True)
            out = run(jax.random.PRNGKey(1))
            force(out)
            outs[blk] = np.asarray(out)
            ms = device_timer_slope(lambda: run(jax.random.PRNGKey(1)),
                                    n1=4, n2=16, reps=3)
            per = ms / batch
            rt = SECONDS / (per / 1e3)
            print(f"| b={batch} {blk}: sampler {ms:.2f} ms "
                  f"({per:.2f}/item -> {rt:.0f}x realtime aggregate)")
        d = np.max(np.abs(outs["ncl"] - outs["ncl_fh"]))
        print(f"| b={batch} max |ncl - ncl_fh|: {d:.3e} (expect 0)")


def _taug_head_variant(tap_c, w_head, b_head, layers, cout, rows,
                       order: str, m_tile: int, vmem_mb: int = 0):
    m, k = tap_c.shape
    n_slab = cout * rows
    m_tile = min(m, m_tile)
    cp = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2 ** 20)
          if vmem_mb else None)
    if order == "m_outer":
        grid = (pl.cdiv(m, m_tile), layers)
        xi = lambda mi, li: (mi, 0)
        wi = lambda mi, li: (0, li)
        bi_ = lambda mi, li: (0, li)
        oi = lambda mi, li: (mi, li, 0, 0)
    else:  # w-resident: layers outermost, m innermost
        grid = (layers, pl.cdiv(m, m_tile))
        xi = lambda li, mi: (mi, 0)
        wi = lambda li, mi: (0, li)
        bi_ = lambda li, mi: (0, li)
        oi = lambda li, mi: (mi, li, 0, 0)
    return pl.pallas_call(
        _head_mm5d_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), xi, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_slab), wi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_slab), bi_, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, 1, cout, rows), oi,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, layers, cout, rows), tap_c.dtype),
        compiler_params=cp,
    )(tap_c, w_head, b_head.reshape(1, layers * n_slab).astype(jnp.float32))


def exp_b():
    print("== B: taug head grid ordering ==")
    cfg = ModelConfig()
    layers, cout = 4, 2 * cfg.inner_channels
    rows = 128                                   # lane-padded 3C+1
    hid, ksz = cfg.kpnet_hidden_channels, cfg.kpnet_conv_size
    k = ksz * hid
    frames = _bench_frames()
    rng = np.random.default_rng(0)
    tap_c = jnp.asarray(rng.standard_normal((frames, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, layers * cout * rows)) * 0.05,
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((layers * cout * rows,)), jnp.float32)

    ref = None
    variants = [("m_outer m216 (shipped)", "m_outer", 216, 0),
                ("w_resident m216", "w_res", 216, 0),
                ("m_outer m432 96MB", "m_outer", 432, 96),
                ("w_resident m432 96MB", "w_res", 432, 96),
                ("w_resident m864 96MB", "w_res", 864, 96)]
    jit_v = jax.jit(_taug_head_variant,
                    static_argnames=("layers", "cout", "rows", "order",
                                     "m_tile", "vmem_mb"))
    for name, order, mt, vm in variants:
        try:
            out = jit_v(tap_c, w, b, layers, cout, rows, order, mt, vm)
            force(out)
        except Exception as e:  # noqa: BLE001
            print(f"| {name}: FAILED {repr(e)[:120]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            d = np.max(np.abs(np.asarray(out, np.float32) - ref))
            if d > 1e-2:
                print(f"| {name}: MISMATCH {d}")
                continue
        ms = device_timer_slope(
            lambda: jit_v(tap_c, w, b, layers, cout, rows, order, mt, vm),
            n1=8, n2=32, reps=3)
        print(f"| {name}: {ms * 1e3:.0f} us/call "
              f"(x3 blocks = {3 * ms:.2f} ms/fwd, x4 steps {12 * ms:.2f} "
              f"ms/sampler)")


def _down_dot(x, factor):
    b, c, length = x.shape
    groups = 512
    sel = np.zeros((groups, groups // factor), x.dtype)
    sel[np.arange(0, groups, factor), np.arange(groups // factor)] = 1
    sel = jnp.asarray(sel)
    xg = x.reshape(b * c, length // groups, groups)
    y = jax.lax.dot_general(xg, sel, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(b, c, length // factor)


def exp_c():
    print("== C: NCL downsample slice vs dot ==")
    from fastdiff_tpu.ops.nn import nearest_downsample_ncl
    frames = _bench_frames()
    length = frames * HOP
    rng = np.random.default_rng(0)
    for bsz in (1, 4):
        x = jnp.asarray(rng.standard_normal((bsz, 32, length)), jnp.bfloat16)
        f_slice = jax.jit(functools.partial(nearest_downsample_ncl, factor=4))
        f_dot = jax.jit(functools.partial(_down_dot, factor=4))
        a, bout = f_slice(x), f_dot(x)
        force(a), force(bout)
        d = np.max(np.abs(np.asarray(a, np.float32) - np.asarray(bout, np.float32)))
        assert d == 0, d
        ms_s = device_timer_slope(lambda: f_slice(x), n1=8, n2=32, reps=3)
        ms_d = device_timer_slope(lambda: f_dot(x), n1=8, n2=32, reps=3)
        print(f"| b={bsz}: slice {ms_s * 1e3:.0f} us, dot {ms_d * 1e3:.0f} us"
              f" (x4 sampler steps: {4 * ms_s:.2f} vs {4 * ms_d:.2f} ms)")


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C", "D"}
    health_gate()
    if "B" in which:
        exp_b()
    if "C" in which:
        exp_c()
    if "A" in which:
        exp_a()
    if "D" in which:
        exp_d()


if __name__ == "__main__":
    main()
