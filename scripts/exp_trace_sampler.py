"""Device-trace the N=4 sampler at b=1 and b=4 and print the per-op table.

The xplane/trace-event device timeline is the ground-truth instrument here:
per-op durations come from the hardware profiler, immune to the relay-fence
pathologies that corrupt host-side timing (docs/PERF.md "measurement
discipline").  Output answers, op by op:

- b=1: which ops make up the 5.1 ms forward — MXU dots near their shape
  floors (=> fusion cannot produce a step change; closure for VERDICT
  item 2) vs copies/relayouts/underfused glue (=> a concrete target).
- b=4: which ops grow super-linearly (the batch anti-scaling offender).

Usage: python scripts/exp_trace_sampler.py [b]
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

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import make_param_sampler
from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                          init_fastdiff)
from fastdiff_tpu.utils.profiling import force

FRAMES = 864


def report_trace(out_dir, calls=1, top=25):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("| no trace file found under", out_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
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
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"|   {dur/1e3/calls:8.3f} ms/call  {name[:110]}")


def main(b, mode="xla"):
    cfg = ModelConfig(use_pallas_block=False if mode == "xla" else mode)
    params = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    audio_len = FRAMES * cfg.total_hop
    sampler = make_param_sampler(get_apply_fn(cfg), const)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, FRAMES, 80)), jnp.float32)
    fn = lambda m: sampler(params, jax.random.PRNGKey(1), m, audio_len)
    force(fn(mel))                                   # compile + warm
    calls = 20
    out_dir = f"/tmp/trace_sampler_b{b}_{mode}"
    os.system(f"rm -rf {out_dir}")
    jax.profiler.start_trace(out_dir)
    out = None
    for _ in range(calls):
        out = fn(mel)
    force(out)
    jax.profiler.stop_trace()
    report_trace(out_dir, calls=calls)


if __name__ == "__main__":
    print(f"| backend={jax.default_backend()}", flush=True)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         sys.argv[2] if len(sys.argv) > 2 else "xla")
    print("DONE", flush=True)
