"""FastDiff-TPU: a TPU-native conditional diffusion vocoder framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Rongjiehuang/FastDiff (conditional diffusion mel->waveform vocoder with
Time-Aware Location-Variable Convolutions), built TPU-first:

- functional core (parameter pytrees + pure apply functions), thin host shell
- the reverse-diffusion loop as ``lax.scan`` (no per-step Python dispatch)
- the LVC op as batched MXU matmuls with an optional fused Pallas kernel
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (ICI collectives
  inserted by XLA), replacing the reference's NCCL DDP
  (reference: utils/trainer.py:442-477, utils/ddp_utils.py)

Nothing in this package is a translation of the reference's torch code; the
reference defines *what* (API surface, schedules, formats), not *how*.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API so ``import fastdiff_tpu`` stays dependency-light.

    Library users get the main entry points without deep imports:
        from fastdiff_tpu import FastDiffTask, Trainer, set_hparams, ...
    """
    lazy = {
        "set_hparams": ("fastdiff_tpu.utils.hparams", "set_hparams"),
        "ModelConfig": ("fastdiff_tpu.config", "ModelConfig"),
        "DiffusionConfig": ("fastdiff_tpu.config", "DiffusionConfig"),
        "AudioConfig": ("fastdiff_tpu.config", "AudioConfig"),
        "init_fastdiff": ("fastdiff_tpu.models.fastdiff", "init_fastdiff"),
        "fastdiff_apply": ("fastdiff_tpu.models.fastdiff", "fastdiff_apply"),
        "fuse_weight_norm": ("fastdiff_tpu.models.fastdiff", "fuse_weight_norm"),
        "FastDiffTask": ("fastdiff_tpu.training.task", "FastDiffTask"),
        "FastSpeech2Task": ("fastdiff_tpu.training.tts_task", "FastSpeech2Task"),
        "Trainer": ("fastdiff_tpu.training.trainer", "Trainer"),
        "get_vocoder_cls": ("fastdiff_tpu.vocoders.base", "get_vocoder_cls"),
        "BatchedVocoder": ("fastdiff_tpu.serving.batch_vocoder", "BatchedVocoder"),
        "ChunkedVocoder": ("fastdiff_tpu.serving.chunked_vocoder", "ChunkedVocoder"),
        "make_sampler": ("fastdiff_tpu.diffusion.sampler", "make_sampler"),
        "make_param_sampler": ("fastdiff_tpu.diffusion.sampler",
                               "make_param_sampler"),
        "load_torch_checkpoint": ("fastdiff_tpu.utils.ckpt_import",
                                  "load_torch_checkpoint"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'fastdiff_tpu' has no attribute '{name}'")
