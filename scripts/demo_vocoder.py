"""Minimal library-level demo: checkpoint -> schedule -> sample -> wav.

The script equivalent of the reference's egs/demo.ipynb cells:

    python scripts/demo_vocoder.py --ckpt model_ckpt_steps_500000.ckpt \
        --wav egs/audios/LJ001-0001_gt.wav --N 4 --out demo_out
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="", help="torch or native checkpoint")
    parser.add_argument("--wav", required=True, help="input wav (analysis+resynthesis)")
    parser.add_argument("--N", type=int, default=4)
    parser.add_argument("--out", default="demo_out")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdiff_tpu.config import AudioConfig, DiffusionConfig, ModelConfig
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.sampler import inference_key, make_sampler
    from fastdiff_tpu.models.fastdiff import (fastdiff_apply, fuse_weight_norm,
                                              init_fastdiff)
    from fastdiff_tpu.ops.dsp import wav2mel_np
    from fastdiff_tpu.utils import audio_io, metrics

    audio_cfg = AudioConfig()
    model_cfg = ModelConfig()

    # 1. load checkpoint (torch released / native), else random weights
    if args.ckpt:
        from fastdiff_tpu.utils.ckpt_import import load_torch_checkpoint
        try:
            params = load_torch_checkpoint(args.ckpt, model_cfg)
        except Exception:
            from fastdiff_tpu.training.checkpoint import load_checkpoint
            target = init_fastdiff(jax.random.PRNGKey(0), model_cfg)
            params = load_checkpoint(args.ckpt, {"params": target})["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print("| no --ckpt: using random weights (noise out, timing only)")
        params = init_fastdiff(jax.random.PRNGKey(0), model_cfg)
    params = fuse_weight_norm(params)

    # 2. derived noise schedule for N reverse steps
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    constants = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(args.N), hp)
    print(f"| N={args.N} fractional steps: {constants.steps}")

    # 3. analyze input wav -> mel
    wav, _ = audio_io.load_wav(args.wav, target_sr=audio_cfg.sample_rate)
    wav, mel = wav2mel_np(wav, audio_cfg)
    mel_dev = jnp.asarray(mel.T)[None]          # (1, T, 80)

    # 4. sample
    sampler = make_sampler(
        lambda x, m, t: fastdiff_apply(params, x, m, t, model_cfg), constants)
    from fastdiff_tpu.utils.profiling import force
    out = sampler(inference_key(42), mel_dev, mel.shape[1] * audio_cfg.hop_size)
    force(out)
    t0 = time.perf_counter()
    out = sampler(inference_key(43), mel_dev, mel.shape[1] * audio_cfg.hop_size)
    force(out)
    dt = time.perf_counter() - t0
    pred = np.asarray(out)[0, :, 0]
    rtf = metrics.compute_rtf(dt, len(pred), audio_cfg.sample_rate)
    print(f"| generated {len(pred) / audio_cfg.sample_rate:.2f}s in {dt * 1000:.1f}ms "
          f"-> RTF {rtf:.4f} ({1 / rtf:.0f}x realtime)")

    os.makedirs(args.out, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.wav))[0]
    audio_io.save_wav(pred / max(1e-9, np.abs(pred).max()),
                      os.path.join(args.out, f"{name}_pred.wav"),
                      audio_cfg.sample_rate)
    audio_io.save_wav(wav, os.path.join(args.out, f"{name}_gt.wav"),
                      audio_cfg.sample_rate)
    if args.ckpt:
        print(f"| MCD vs input: {metrics.mcd(pred, wav, audio_cfg):.2f} dB")
    print(f"| wrote {args.out}/{name}_pred.wav")


if __name__ == "__main__":
    main()
