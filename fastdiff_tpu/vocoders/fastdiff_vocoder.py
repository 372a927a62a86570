"""FastDiff as a registry vocoder: mel -> waveform via the diffusion sampler.

The library-level synthesis API the reference demonstrates in its notebook
(reference: egs/demo.ipynb: load ckpt -> schedule -> sampling_given_noise_
schedule), packaged behind the vocoder registry so TTS pipelines can select
it with ``vocoder: fastdiff`` the way the reference selects ``pwg``
(reference: vocoders/base_vocoder.py + modules/FastDiff/config/base.yaml:112).
Loads either a native framework checkpoint or a released torch checkpoint
(``vocoder_ckpt`` hparam).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import inference_key, make_param_sampler
from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                          init_fastdiff)
from fastdiff_tpu.vocoders.base import BaseVocoder, register_vocoder


@register_vocoder
class FastDiff(BaseVocoder):
    def __init__(self, hparams: dict = None):
        super().__init__(hparams)
        hp = self.hparams
        self.model_cfg = ModelConfig.from_hparams(hp)
        self.diff_cfg = DiffusionConfig.from_hparams(hp)
        self.hyperparams = schedules.compute_hyperparams_given_schedule(
            schedules.linear_beta_schedule(self.diff_cfg))
        self.params = fuse_weight_norm(self._load_params(hp))
        sched = schedules.resolve_noise_schedule(hp)
        constants = schedules.sampler_constants_for_schedule(
            sched, self.hyperparams)

        # params traced / apply_fn cached per config: reloading a checkpoint
        # or constructing a second vocoder reuses the compiled sampler.
        # Megakernel per the use_pallas_block policy (config.py docstring).
        from fastdiff_tpu.config import inference_model_config
        infer_cfg = inference_model_config(self.model_cfg, hp)
        psample = make_param_sampler(get_apply_fn(infer_cfg), constants)
        params = self.params

        def sampler(key, mel, audio_length):
            return psample(params, key, mel, audio_length)

        self._sampler = sampler
        # rbg on accelerators (r5h A/B: -0.18 ms/sampler), threefry on CPU
        self._key = inference_key(int(hp.get("seed", 1234)))
        # long-utterance chunking (0 = off): one compiled shape + O(1) memory
        chunk = int(hp.get("chunked_infer_frames", 0) or 0)
        self._chunked = None
        if chunk:
            from fastdiff_tpu.serving.chunked_vocoder import ChunkedVocoder
            self._chunked = ChunkedVocoder(self._sampler,
                                           hop_size=self.model_cfg.total_hop,
                                           chunk_frames=chunk)

    def _load_params(self, hp: dict):
        ckpt = hp.get("vocoder_ckpt", "")
        if ckpt and os.path.exists(ckpt):
            if ckpt.endswith(".pt") or ckpt.endswith(".ckpt"):
                try:
                    from fastdiff_tpu.utils.ckpt_import import load_torch_checkpoint
                    params = load_torch_checkpoint(ckpt, self.model_cfg)
                    return jax.tree_util.tree_map(jnp.asarray, params)
                except Exception:
                    pass
            from fastdiff_tpu.training.checkpoint import load_checkpoint
            target = init_fastdiff(jax.random.PRNGKey(0), self.model_cfg)
            state = load_checkpoint(ckpt, {"params": target})
            return jax.tree_util.tree_map(jnp.asarray, state["params"])
        print("| WARNING: no vocoder_ckpt given; FastDiff vocoder runs with "
              "random weights.")
        return init_fastdiff(jax.random.PRNGKey(0), self.model_cfg)

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        """mel (T, n_mels) -> waveform (T * hop,)."""
        mel = np.asarray(mel, dtype=np.float32)
        self._key, sub = jax.random.split(self._key)
        if self._chunked is not None:
            return self._chunked.vocode(mel, key=sub)
        hop = self.model_cfg.total_hop
        wav = self._sampler(sub, jnp.asarray(mel)[None], mel.shape[0] * hop)
        return np.asarray(wav)[0, :, 0]
