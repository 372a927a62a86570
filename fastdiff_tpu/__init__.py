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
