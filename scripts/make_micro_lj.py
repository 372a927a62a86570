"""Build the micro-LJSpeech corpus from the reference's released GT wavs.

The image ships no LJSpeech dataset; the only real speech available is the
three ground-truth utterances the reference publishes for A/B listening
(reference: egs/audios/LJ001-000{1,2,3}_gt.wav, ~21 s total). This script
carves them into disjoint train / held-out regions so a real training run
can produce an honest audio-quality number on speech the model never saw:

- train: first ~80% of LJ001-0001 and LJ001-0003, plus all of LJ001-0002
- valid == test: the final ~20% tails of LJ001-0001 / LJ001-0003

Output layout matches the stage-1 pre-align contract (metadata_phone.csv
with item_name, wav_fn), so the ordinary binarizer CLI consumes it:

    python scripts/make_micro_lj.py
    python -m fastdiff_tpu.data.binarize --config fastdiff_tpu/configs/micro_lj.yaml
    python -m fastdiff_tpu.run --config fastdiff_tpu/configs/micro_lj.yaml \
        --exp_name micro_lj --reset
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastdiff_tpu.utils.audio_io import load_wav, save_wav

SRC_DIR = "/root/reference/egs/audios"
OUT_ROOT = "data/micro_lj"
SR = 22050
VAL_FRACTION = 0.20


def main():
    raw_dir = os.path.join(OUT_ROOT, "raw", "wavs")
    processed_dir = os.path.join(OUT_ROOT, "processed")
    os.makedirs(raw_dir, exist_ok=True)
    os.makedirs(processed_dir, exist_ok=True)

    rows = []

    def emit(item_name: str, wav):
        path = os.path.abspath(os.path.join(raw_dir, f"{item_name}.wav"))
        save_wav(wav, path, SR)
        rows.append({"item_name": item_name, "wav_fn": path})
        print(f"| {item_name}: {len(wav) / SR:.2f}s")

    for base, split_tail in (("LJ001-0001", True), ("LJ001-0002", False),
                             ("LJ001-0003", True)):
        wav, sr = load_wav(os.path.join(SRC_DIR, f"{base}_gt.wav"), target_sr=SR)
        assert sr == SR, f"unexpected sample rate {sr}"
        if split_tail:
            cut = int(len(wav) * (1.0 - VAL_FRACTION))
            # item names are chosen so the val items sort first: the
            # binarizer takes the first test_num sorted names as valid==test
            # (reference: vocoder_binarizer.py:48-58).
            emit(f"00-val-{base}", wav[cut:])
            emit(f"10-train-{base}", wav[:cut])
        else:
            emit(f"10-train-{base}", wav)

    meta_path = os.path.join(processed_dir, "metadata_phone.csv")
    with open(meta_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["item_name", "wav_fn"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"| wrote {meta_path} ({len(rows)} items)")


if __name__ == "__main__":
    main()
