"""Speaker-embedding extractor: log-mel -> 256-d d-vector.

Replaces the reference's resemblyzer VoiceEncoder dependency
(reference: data_gen/tts/base_binarizer.py:156-168), which is not available
in this image, with a native jax d-vector network:

    log-mel (T, n_mels) -> 3x [conv1d k=5 /2 + relu] -> temporal
    statistics pooling (mean ++ std) -> dense -> L2-normalized (256,)

Weights load from a native checkpoint (``spk_embed_ckpt`` hparam) when a
trained speaker-verification model is available; without one the network
runs with a fixed seeded initialization. Untrained random-projection
d-vectors still separate speakers usefully (they are random projections of
speaker-dependent spectral statistics — same-speaker utterances embed
closer than different-speaker ones; tested in tests/test_spk_and_cwt.py),
so multi-speaker binarization/conditioning works end-to-end and upgrades
transparently when a trained checkpoint is supplied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.ops import nn as fnn

EMBED_DIM = 256
_HIDDEN = 128


def init_spk_encoder(key=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(20260816)
    keys = jax.random.split(key, 4)
    return {
        "conv0": fnn.conv1d_init(keys[0], 80, _HIDDEN, 5),
        "conv1": fnn.conv1d_init(keys[1], _HIDDEN, _HIDDEN, 5),
        "conv2": fnn.conv1d_init(keys[2], _HIDDEN, _HIDDEN, 5),
        "proj": fnn.dense_init(keys[3], 2 * _HIDDEN, EMBED_DIM),
    }


@jax.jit
def spk_encoder_apply(params: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, T, n_mels) log-mel -> (B, 256) unit-norm embeddings."""
    x = mel
    for name in ("conv0", "conv1", "conv2"):
        x = fnn.conv1d(params[name], x, stride=2, padding=2, impl="lax")
        x = jax.nn.relu(x)
    mean = x.mean(axis=1)
    std = jnp.sqrt(x.var(axis=1) + 1e-5)
    stats = jnp.concatenate([mean, std], axis=-1)        # (B, 2H)
    emb = fnn.dense(params["proj"], stats)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


class SpeakerEncoder:
    """Stateful wrapper used by the binarizer (one instance per process)."""

    def __init__(self, ckpt_path: str = ""):
        self.params = init_spk_encoder()
        if ckpt_path:
            from fastdiff_tpu.training.checkpoint import load_checkpoint
            state = load_checkpoint(ckpt_path, {"params": self.params})
            self.params = state["params"]

    def embed(self, mel: np.ndarray) -> np.ndarray:
        """mel (T, n_mels) -> (256,) float32."""
        mel = np.asarray(mel, np.float32)
        if mel.shape[0] < 8:
            mel = np.pad(mel, ((0, 8 - mel.shape[0]), (0, 0)), mode="edge")
        emb = spk_encoder_apply(self.params, jnp.asarray(mel)[None])
        return np.asarray(emb)[0]


@functools.lru_cache(maxsize=2)
def get_speaker_encoder(ckpt_path: str = "") -> SpeakerEncoder:
    return SpeakerEncoder(ckpt_path)
