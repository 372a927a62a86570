"""Pre-align CLI (stage 1): ``python -m fastdiff_tpu.data.pre_align_cli --config ...``

(reference: data_gen/tts/bin/pre_align.py:9-20 — importlib dispatch on
``pre_align_cls``).
"""

from fastdiff_tpu.data.dataset import resolve_class
from fastdiff_tpu.utils.hparams import set_hparams


def main():
    hparams = set_hparams(print_hparams=False)
    cls = resolve_class(hparams.get(
        "pre_align_cls", "fastdiff_tpu.data.pre_align.VocoderPreAlign"))
    print(f"| pre-aligner: {cls.__name__}")
    cls(hparams).process()


if __name__ == "__main__":
    main()
