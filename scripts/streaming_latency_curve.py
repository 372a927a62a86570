"""Measure the streaming latency-vs-quality trade-off on micro-LJ weights.

For each (chunk, halo) setting, vocode the micro-LJ validation mels with the
StreamingVocoder and compare against the full-utterance batch sampler output
(the quality reference: identical weights, no chunk seams). Prints one row
per setting: finalization latency (ms) + MCD / mel-L2 / MR-STFT deltas.

Run ALONE on the TPU host (compiles one sampler shape per chunk size):
    python scripts/streaming_latency_curve.py [ckpt_dir]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import AudioConfig, DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import make_param_sampler
from fastdiff_tpu.models.fastdiff import fuse_weight_norm, get_apply_fn
from fastdiff_tpu.serving.streaming_vocoder import StreamingVocoder
from fastdiff_tpu.training.checkpoint import load_checkpoint
from fastdiff_tpu.utils.hparams import set_hparams
from fastdiff_tpu.utils.metrics import (mcd, mel_spectral_distance,
                                        multi_resolution_stft_distance)

SETTINGS = [                      # (chunk_frames, halo_frames)
    (256, 16),                    # production default (~2.8 s latency)
    (128, 16),                    # ~1.5 s
    (64, 12),                     # ~600 ms
    (48, 8),                      # low_latency preset (~464 ms)
    (32, 8),                      # ~270 ms (halo = RF/2, quality floor probe)
]


def main():
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/micro_lj_r2b"
    hp = set_hparams(config=os.path.join(ckpt_dir, "config.yaml"),
                     exp_name="", hparams_str="")
    cfg = ModelConfig.from_hparams(hp)
    audio_cfg = AudioConfig.from_hparams(hp)
    from fastdiff_tpu.models.fastdiff import init_fastdiff
    from fastdiff_tpu.training.checkpoint import get_last_checkpoint
    path, step = get_last_checkpoint(ckpt_dir)
    target = init_fastdiff(jax.random.PRNGKey(0), cfg)
    state = load_checkpoint(path, {"params": target})
    params = fuse_weight_norm(state["params"])
    state["step"] = step
    dhp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig.from_hparams(hp)))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), dhp)
    psampler = make_param_sampler(get_apply_fn(cfg), const)

    def sampler(key, mel, audio_length):
        return psampler(params, key, mel, audio_length)

    # validation mels from the binarized micro-LJ valid split
    from fastdiff_tpu.data.indexed_dataset import IndexedDataset
    ds = IndexedDataset(os.path.join(hp["binary_data_dir"], "valid"))
    items = [ds[i] for i in range(len(ds))]
    print(f"| {len(items)} validation utterances, model "
          f"{ckpt_dir} step {int(state.get('step', 0))}")

    hop = audio_cfg.hop_size
    key = jax.random.PRNGKey(0)

    # quality reference: full-utterance batch sampling (bucketed padding)
    refs = []
    for it in items:
        mel = np.asarray(it["mel"], np.float32)
        frames = mel.shape[0]
        bucket = 128
        padded = ((frames + bucket - 1) // bucket) * bucket
        mel_p = np.pad(mel, ((0, padded - frames), (0, 0)), mode="edge")
        wav = np.asarray(sampler(key, jnp.asarray(mel_p)[None],
                                 padded * hop))[0, : frames * hop, 0]
        refs.append(wav)

    print("| chunk halo latency_ms   MCD   mel-L2  MR-STFT   (vs batch path)")
    for chunk, halo in SETTINGS:
        lat_ms = (chunk - halo) * hop / audio_cfg.sample_rate * 1e3
        mcds, l2s, stfts = [], [], []
        for it, ref in zip(items, refs):
            mel = np.asarray(it["mel"], np.float32)
            voc = StreamingVocoder(sampler, hop, chunk_frames=chunk,
                                   halo_frames=halo, key=key)
            out = np.concatenate([voc.feed(mel), voc.finish()])
            n = min(len(out), len(ref))
            mcds.append(mcd(out[:n], ref[:n], audio_cfg))
            l2s.append(mel_spectral_distance(out[:n], ref[:n], audio_cfg))
            stfts.append(multi_resolution_stft_distance(out[:n], ref[:n]))
        print(f"| {chunk:5d} {halo:4d} {lat_ms:10.0f} "
              f"{np.mean(mcds):6.2f} {np.mean(l2s):7.3f} "
              f"{np.mean(stfts):8.3f}", flush=True)


if __name__ == "__main__":
    main()
