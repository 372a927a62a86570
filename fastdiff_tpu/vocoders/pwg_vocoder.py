"""PWG registry vocoder: mel -> waveform via the ParallelWaveGAN generator.

The reference's default ``vocoder: pwg`` (reference: vocoders/pwg.py:18-139):
loads a released generator checkpoint, draws a noise signal of the target
length and runs the generator conditioned on the mel. Optional spectral-
subtraction denoising mirrors vocoders/vocoder_utils.py:7-16.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.models.pwg import (PWGConfig, convert_pwg_state_dict,
                                     init_pwg, pwg_apply)
from fastdiff_tpu.vocoders.base import BaseVocoder, register_vocoder


@register_vocoder
class PWG(BaseVocoder):
    def __init__(self, hparams: dict = None):
        super().__init__(hparams)
        hp = self.hparams
        self.cfg = PWGConfig(
            aux_context_window=int(hp.get("aux_context_window", 2)),
            compute_dtype=str(hp.get("compute_dtype", "bfloat16")),
        )
        self.params = self._load(hp)
        cfg = self.cfg
        params = self.params
        self._apply = jax.jit(lambda n, m: pwg_apply(params, n, m, cfg))
        self._key = jax.random.PRNGKey(int(hp.get("seed", 1234)))

    def _load(self, hp: dict):
        ckpt = hp.get("vocoder_ckpt", "")
        if ckpt and os.path.exists(ckpt):
            import torch
            blob = torch.load(ckpt, map_location="cpu", weights_only=False)
            sd = blob.get("state_dict", blob)
            if "model" in sd:
                sd = sd["model"]
            if "generator" in sd:
                sd = sd["generator"]
            sd = {k[len("generator."):] if k.startswith("generator.") else k: v
                  for k, v in sd.items()}
            params = convert_pwg_state_dict(sd, self.cfg)
            print(f"| loaded PWG generator: {ckpt}")
            return jax.tree_util.tree_map(jnp.asarray, params)
        print("| WARNING: no vocoder_ckpt; PWG vocoder runs with random weights.")
        return init_pwg(jax.random.PRNGKey(0), self.cfg)

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        mel = jnp.asarray(np.asarray(mel, np.float32))[None, ...]   # (1,T,80)
        total = 1
        for s in self.cfg.upsample_scales:
            total *= s
        self._key, sub = jax.random.split(self._key)
        noise = jax.random.normal(sub, (1, mel.shape[1] * total, 1))
        wav = self._apply(noise, mel)
        return np.asarray(wav)[0, :, 0]
