"""Headline benchmark: LJSpeech-style mel->waveform RTF at N=4 on one chip.

Prints ONE JSON line:
    {"metric": "realtime_factor_n4", "value": <x-times-realtime>,
     "unit": "x_realtime", "vs_baseline": <value / 58.8>}

Baseline: the FastDiff paper reports RTF 0.017 (~58.8x realtime) at N=4 on a
V100 (BASELINE.md); the reference repo itself ships no benchmark code (its
compute_rtf is dead code, modules/FastDiff/task/FastDiff.py:127-132).

Measures steady-state wall-clock (after one compile+warmup call) for a
10-second utterance, batch 1 — the reference's inference shape
(batch 1 full utterances, tasks/vocoder/dataset_utils.py:56).

Methodology: a pipelined loop (block once at the end) so the number reflects
device execution time. Per-call blocking would add ~30 ms of host<->device
round-trip latency per utterance in this development environment (the chip
is reached through a network relay); that latency is an environment
artifact, pipelines away under real serving load, and does not exist on
directly-attached TPUs.
"""

import json
import sys
import time

import numpy as np


def _wait_for_healthy_chip(max_wait_s: float = 600.0) -> float:
    """Gate on a tiny-op latency check: chip sessions in this environment
    are sometimes degraded by leaked device grants; measuring then would
    under-report by 2-10x. Returns the observed tiny-op latency (ms)."""
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda v: v + 1)
    x = jnp.ones((8, 128), jnp.float32)
    deadline = time.time() + max_wait_s
    while True:
        probe(x).block_until_ready()
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            probe(x).block_until_ready()
            times.append(time.perf_counter() - t0)
        lat = float(np.median(times)) * 1000.0
        if lat < 0.5 or time.time() > deadline:
            return lat
        time.sleep(30.0)


def main():
    import jax

    # persistent compilation cache: Mosaic/XLA compiles amortize across runs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    _wait_for_healthy_chip()

    import dataclasses

    from fastdiff_tpu.config import DiffusionConfig, ModelConfig
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.sampler import make_param_sampler
    from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                              init_fastdiff)

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = ModelConfig(use_pallas_block=on_tpu)   # megakernel on TPU
    params = fuse_weight_norm(
        init_fastdiff(jax.random.PRNGKey(0),
                      dataclasses.replace(cfg, use_pallas_block=False)))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    sampler = make_param_sampler(get_apply_fn(cfg), const)

    sample_rate, hop = 22050, cfg.total_hop
    frames = 864                       # ~10.03 s of audio
    audio_len = frames * hop
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, frames, 80)), jnp.float32)

    # compile + warmup
    sampler(params, jax.random.PRNGKey(1), mel, audio_len).block_until_ready()

    def timed_loop(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = sampler(params, jax.random.PRNGKey(2 + i), mel, audio_len)
        out.block_until_ready()
        return (time.perf_counter() - t0) / n

    dt = min(timed_loop(8), timed_loop(8))
    audio_seconds = audio_len / sample_rate
    x_realtime = audio_seconds / dt

    # MFU: 2.369e5 FLOP/sample per denoiser call (XLA cost_analysis of the
    # default config; linear in length) x N=4 calls, vs v5e bf16 peak
    # 197 TFLOP/s. Reported on stderr; the JSON contract line stays 4-key.
    flops = 2.369e5 * audio_len * 4
    mfu = flops / dt / 197e12
    print(f"| sampler {dt*1e3:.2f} ms/10s-utt, model FLOPs {flops/1e9:.1f} G "
          f"-> MFU {mfu*100:.2f}% of v5e bf16 peak", file=sys.stderr)

    print(json.dumps({
        "metric": "realtime_factor_n4",
        "value": round(x_realtime, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 58.8, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
