"""Binarization CLI (stage 2): ``python -m fastdiff_tpu.data.binarize --config ...``

(reference: data_gen/tts/bin/binarize.py:9-20 — importlib dispatch on
``binarizer_cls``).
"""

from fastdiff_tpu.data.dataset import resolve_class
from fastdiff_tpu.utils.hparams import set_hparams


def main():
    hparams = set_hparams(print_hparams=False)
    cls = resolve_class(hparams.get(
        "binarizer_cls", "fastdiff_tpu.data.binarizer.VocoderBinarizer"))
    print(f"| binarizer: {cls.__name__}")
    cls(hparams).process()


if __name__ == "__main__":
    main()
