"""TTS demo: precomputed acoustic-model mels -> FastDiff -> wav files.

The zero-subprocess equivalent of the reference's egs/demo_tts.py: point it
at a directory of ``.npy`` mels produced by any acoustic model (PortaSpeech,
FastSpeech 2, DiffSpeech, Tacotron, ...) and a FastDiff checkpoint.

    python scripts/demo_tts.py --config fastdiff_tpu/configs/ljspeech.yaml \
        --mel_dir infer_out --out_dir demo_out \
        --hparams 'vocoder_ckpt=checkpoints/.../model_ckpt_steps_X.ckpt,N=4'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastdiff_tpu.tts.infer import NpyMelSource, TTSPipeline
from fastdiff_tpu.utils.hparams import set_hparams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--mel_dir", required=True)
    parser.add_argument("--out_dir", default="demo_out")
    parser.add_argument("--hparams", default="")
    args = parser.parse_args()

    hparams = set_hparams(config=args.config, hparams_str=args.hparams,
                          print_hparams=False)
    source = NpyMelSource(hparams, args.mel_dir)
    pipeline = TTSPipeline(hparams, source)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in source.mel_paths:
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.out_dir, f"{name}.wav")
        pipeline.synthesize("", out_wav=out)
        print(f"| wrote {out}")


if __name__ == "__main__":
    main()
