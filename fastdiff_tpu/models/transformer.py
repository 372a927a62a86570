"""Transformer building blocks for the TTS (text -> mel) models.

The TPU-native counterpart of the reference's NATSpeech layer library
(reference: modules/commons/common_layers.py — ``MultiheadAttention``:171,
``EncSALayer``:624, ``DecSALayer``:676, ``SinusoidalPositionalEmbedding``),
which its FastSpeech2-style tasks build on. Functional pytrees + pure apply,
NWC activations, masks as (B, T) float {0, 1}.

Layer = pre-LN self-attention + residual, then pre-LN conv-FFN
(k=9 conv -> relu -> k=9 conv in the FastSpeech tradition) + residual.
Attention is a single fused einsum pair on the MXU; padding positions are
masked with -inf before the softmax and zeroed after each block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.ops import nn as fnn


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def attention_init(key, dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(dim)
    return {
        "qkv": {"w": jax.random.normal(k1, (dim, 3 * dim)) * scale,
                "b": jnp.zeros((3 * dim,))},
        "out": {"w": jax.random.normal(k2, (dim, dim)) * scale,
                "b": jnp.zeros((dim,))},
    }


def ffn_init(key, dim: int, hidden: int, kernel_size: int = 9) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": fnn.conv1d_init(k1, dim, hidden, kernel_size),
        "conv2": fnn.conv1d_init(k2, hidden, dim, kernel_size),
    }


def encoder_layer_init(key, dim: int, ffn_hidden: int,
                       ffn_kernel: int = 9) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "ln1": layer_norm_init(dim),
        "attn": attention_init(k1, dim),
        "ln2": layer_norm_init(dim),
        "ffn": ffn_init(k2, dim, ffn_hidden, ffn_kernel),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Fairseq-style sinusoidal embedding table (common_layers.py
    SinusoidalPositionalEmbedding semantics): sin block then cos block."""
    half = dim // 2
    freq = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = np.arange(length)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2:
        emb = np.concatenate([emb, np.zeros((length, 1))], axis=1)
    return emb.astype(np.float32)


def self_attention(p: dict, x: jnp.ndarray, mask: jnp.ndarray,
                   heads: int) -> jnp.ndarray:
    """x (B, T, D), mask (B, T) 1=valid -> (B, T, D)."""
    b, t, d = x.shape
    dh = d // heads
    qkv = jnp.dot(x, p["qkv"]["w"], preferred_element_type=jnp.float32)
    qkv = qkv + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    out = jnp.dot(out, p["out"]["w"],
                  preferred_element_type=jnp.float32) + p["out"]["b"]
    return out


def conv_ffn(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = fnn.conv1d(p["conv1"], x)
    h = jax.nn.relu(h)
    return fnn.conv1d(p["conv2"], h)


def encoder_layer(p: dict, x: jnp.ndarray, mask: jnp.ndarray,
                  heads: int) -> jnp.ndarray:
    """Pre-LN self-attention + conv FFN with residuals; padding zeroed
    (EncSALayer behavior, common_layers.py:624-672)."""
    m = mask[..., None]
    h = layer_norm(p["ln1"], x)
    x = x + self_attention(p["attn"], h, mask, heads)
    x = x * m
    h = layer_norm(p["ln2"], x)
    x = x + conv_ffn(p["ffn"], h)
    return x * m


def transformer_stack(params_list, x, mask, heads: int):
    for p in params_list:
        x = encoder_layer(p, x, mask, heads)
    return x
