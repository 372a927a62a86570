"""Batch vocoding CLI: a directory of mels (or wavs) -> waveforms, with
the batch/chunk axes sharded over the device mesh.

    python scripts/vocode.py --config fastdiff_tpu/configs/ljspeech.yaml \
        --input mels_dir --out out_dir \
        --hparams 'vocoder_ckpt=checkpoints/.../model_ckpt_steps_X.ckpt,N=4'

.npy inputs are treated as (T, n_mels) mels; .wav inputs are analyzed with
the canonical front-end first (wav -> mel -> wav resynthesis).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", default="vocode_out")
    parser.add_argument("--hparams", default="")
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    import jax

    from fastdiff_tpu.config import AudioConfig
    from fastdiff_tpu.ops.dsp import wav2mel_np
    from fastdiff_tpu.serving.batch_vocoder import BatchedVocoder
    from fastdiff_tpu.utils import audio_io
    from fastdiff_tpu.utils.hparams import set_hparams
    from fastdiff_tpu.vocoders.fastdiff_vocoder import FastDiff as FastDiffVocoder

    hp = set_hparams(config=args.config, hparams_str=args.hparams,
                     print_hparams=False)
    audio_cfg = AudioConfig.from_hparams(hp)
    voc = FastDiffVocoder(hp)

    names, mels = [], []
    for fn in sorted(os.listdir(args.input)):
        path = os.path.join(args.input, fn)
        if fn.endswith(".npy"):
            mels.append(np.asarray(np.load(path), np.float32))
        elif fn.endswith(".wav"):
            wav, _ = audio_io.load_wav(path, target_sr=audio_cfg.sample_rate)
            _, mel = wav2mel_np(wav, audio_cfg)
            mels.append(mel.T)
        else:
            continue
        names.append(os.path.splitext(fn)[0])
    if not mels:
        print(f"no .npy/.wav inputs in {args.input}")
        return 1

    bv = BatchedVocoder.from_sampler(voc._sampler, voc.model_cfg.total_hop,
                                     max_batch=args.batch)

    t0 = time.time()
    wavs = bv.vocode(mels)  # default key: rbg on TPU (sampler.inference_key)
    total_audio = sum(len(w) for w in wavs) / audio_cfg.sample_rate
    dt = time.time() - t0
    print(f"| vocoded {len(wavs)} utterances ({total_audio:.1f}s audio) in "
          f"{dt:.1f}s (incl. compile) -> {total_audio / dt:.1f}x realtime agg")

    os.makedirs(args.out, exist_ok=True)
    for name, wav in zip(names, wavs):
        out_fn = os.path.join(args.out, f"{name}.wav")
        audio_io.save_wav(wav / max(1e-9, np.abs(wav).max()), out_fn,
                          audio_cfg.sample_rate)
    print(f"| wrote {len(wavs)} wavs -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
