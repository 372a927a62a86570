"""Headline benchmark: LJSpeech-style mel->waveform RTF at N=4 on one chip.

Prints ONE JSON line:
    {"metric": "realtime_factor_n4", "value": <x-times-realtime>,
     "unit": "x_realtime", "vs_baseline": <value / 58.8>}

Baseline: the FastDiff paper reports RTF 0.017 (~58.8x realtime) at N=4 on a
V100 (BASELINE.md); the reference repo itself ships no benchmark code (its
compute_rtf is dead code, modules/FastDiff/task/FastDiff.py:127-132).

Measures steady-state wall-clock for a 10-second utterance, batch 1 — the
reference's inference shape (batch 1 full utterances,
tasks/vocoder/dataset_utils.py:56).

Methodology — forced-completion pipelined timing: dispatch a pipelined loop
of n sampler calls, then force the whole chain with a device-side scalar
reduction of the LAST output and a 4-byte host fetch. In this environment
the chip sits behind a network relay whose ``block_until_ready`` can ACK
BEFORE execution completes (measured: "timings" implying >peak FLOP/s), so
any block_until_ready-based timing here is unsound; fetching real bytes
that data-depend on every dispatched call is the only trustworthy fence.
The single fetch RTT (~10 ms) is amortized over n=16 calls and the scalar
sum rides the same executable stream (in-order device execution), so the
per-call figure reflects device compute.

Both the NCL megakernel (the `use_pallas_block: auto` production path
since round 3 — ops/lvc_block_ncl, hardware-trace-validated 5.1x/4.4x
faster inner loops) and the pure-XLA path are timed; the better one is
reported, and a mismatch with the auto policy is a signal to re-pin it.
"""

import json
import sys
import time

import numpy as np


def _wait_for_healthy_chip(max_wait_s: float = 600.0) -> float:
    """Gate on tiny-op latency measured with a REAL scalar fetch (the relay's
    block_until_ready can lie; see module docstring). Healthy sessions fetch
    a jitted scalar in <30 ms; degraded sessions (leaked device grants) take
    100s of ms. Returns the observed latency (ms)."""
    import jax
    import jax.numpy as jnp

    reduce_fetch = jax.jit(lambda v: jnp.sum(v))
    x = jnp.ones((8, 128), jnp.float32)
    deadline = time.time() + max_wait_s
    while True:
        float(reduce_fetch(x))
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(reduce_fetch(x))
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times)) * 1000.0
        if lat < 30.0 or time.time() > deadline:
            return lat
        time.sleep(30.0)


def main():
    import jax

    # persistent compilation cache: Mosaic/XLA compiles amortize across runs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    rtt_ms = _wait_for_healthy_chip()
    print(f"| tiny-op scalar-fetch RTT {rtt_ms:.2f} ms", file=sys.stderr)

    import dataclasses

    from fastdiff_tpu.config import DiffusionConfig, ModelConfig
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.sampler import (inference_key,
                                                make_param_sampler)
    from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                              init_fastdiff)

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg_xla = ModelConfig(use_pallas_block=False)
    params = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg_xla))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    sample_rate, hop = 22050, cfg_xla.total_hop
    frames = 864                       # ~10.03 s of audio
    audio_len = frames * hop
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, frames, 80)), jnp.float32)

    force = jax.jit(lambda v: jnp.sum(v))

    def build_sampler(cfg, mel_in):
        sampler = make_param_sampler(get_apply_fn(cfg), const)
        # compile + warmup (forced); rbg keys on TPU (r5h: -0.18 ms/sampler)
        float(force(sampler(params, inference_key(1), mel_in, audio_len)))
        return sampler

    def timed_loop(sampler, mel_in, n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = sampler(params, inference_key(2 + i), mel_in, audio_len)
        float(force(out))     # forces the whole in-order chain
        return time.perf_counter() - t0

    def slope(sampler, mel_in, n1=4, n2=20):
        # two-point slope: a single pipelined loop still carries a constant
        # +RTT/n bias (~1.5 ms at n=16 with the relay's ~25 ms fetch RTT);
        # the slope between two loop sizes cancels every constant
        t1 = timed_loop(sampler, mel_in, n1)
        t2 = timed_loop(sampler, mel_in, n2)
        return (t2 - t1) / (n2 - n1)

    candidates = {"xla": cfg_xla}
    if on_tpu:
        # 'auto' production path (round 3): NCL time-in-lanes megakernel
        candidates["pallas_ncl"] = dataclasses.replace(
            cfg_xla, use_pallas_block="ncl")
        # r4b candidate: predictor head fused INTO the megakernel (the 5D
        # kern_taug operand never exists in HBM); bit-exact vs pallas_ncl
        candidates["pallas_ncl_fh"] = dataclasses.replace(
            cfg_xla, use_pallas_block="ncl_fh")
    # Race the candidates with reps INTERLEAVED round-robin (not one
    # candidate fully then the next): session drift on the shared relay
    # flipped candidate ordering between runs when measured sequentially
    # (docs/PERF.md, r5). min over interleaved reps is drift-robust.
    samplers = {name: build_sampler(cfg, mel) for name, cfg in
                candidates.items()}
    times = {name: float("inf") for name in samplers}
    for _ in range(5):
        for name, s in samplers.items():
            times[name] = min(times[name], slope(s, mel))
    best_name = min(times, key=times.get)
    dt = times[best_name]
    for name, t in sorted(times.items(), key=lambda kv: kv[1]):
        print(f"| {name}: {t*1e3:.2f} ms/10s-utt", file=sys.stderr)

    audio_seconds = audio_len / sample_rate
    x_realtime = audio_seconds / dt

    # Batched aggregate throughput at the best config (the serving
    # scale-up question: does batch>1 on ONE chip beat running utterances
    # back to back?). Reported on stderr; headline stays b=1 latency.
    if on_tpu:
        sampler = samplers[best_name]
        for b in (4,):
            mel_b = jnp.tile(mel, (b, 1, 1))
            float(force(sampler(params, inference_key(1), mel_b,
                                audio_len)))
            # b=1 and b=4 slopes interleaved in the SAME phase: the ratio
            # is only meaningful when both sides see the same session
            # conditions (the r4 0.81x reading compared a late b=4 against
            # an earlier b=1 after the session drifted).
            best_b, best_b1 = float("inf"), float("inf")
            for _ in range(4):
                best_b1 = min(best_b1, slope(sampler, mel))
                best_b = min(best_b, slope(sampler, mel_b, 2, 8))
            # the b=1 headline is a min-estimator over the same config;
            # fold in the same-phase reps
            dt = min(dt, best_b1)
            x_realtime = audio_seconds / dt
            agg = audio_seconds * b / best_b
            ratio = agg / (audio_seconds / best_b1)
            print(f"| {best_name} b={b}: {best_b*1e3/b:.2f} ms/item "
                  f"-> aggregate {agg:.0f}x realtime "
                  f"({ratio:.2f}x the same-phase b=1 figure "
                  f"{best_b1*1e3:.2f} ms)", file=sys.stderr)

    # MFU: 2.369e5 FLOP/sample per denoiser call (XLA cost_analysis of the
    # default config; linear in length) x N=4 calls, vs v5e bf16 peak
    # 197 TFLOP/s. Reported on stderr; the JSON contract line stays 4-key.
    flops = 2.369e5 * audio_len * 4
    mfu = flops / dt / 197e12
    print(f"| best={best_name} {dt*1e3:.2f} ms/10s-utt, model FLOPs "
          f"{flops/1e9:.1f} G -> MFU {mfu*100:.2f}% of v5e bf16 peak",
          file=sys.stderr)

    print(json.dumps({
        "metric": "realtime_factor_n4",
        "value": round(x_realtime, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 58.8, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
