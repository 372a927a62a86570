"""FastDiff model: shape checks, and full forward parity against the
reference torch model with imported weights (the strongest correctness test
we can run without the released checkpoints)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.models.fastdiff import (diffusion_step_embedding,
                                          fastdiff_apply, init_fastdiff,
                                          num_params)
from fastdiff_tpu.utils.ckpt_import import convert_torch_state_dict
from tests.conftest import REFERENCE_DIR, requires_reference

SMALL = ModelConfig(inner_channels=8, cond_channels=16,
                    upsample_ratios=(4, 2, 2), kpnet_hidden_channels=8,
                    diffusion_step_embed_dim_in=16,
                    diffusion_step_embed_dim_mid=32,
                    diffusion_step_embed_dim_out=32,
                    compute_dtype="float32")


def test_forward_shapes():
    params = init_fastdiff(jax.random.PRNGKey(0), SMALL)
    b, frames = 2, 6
    t_audio = frames * SMALL.total_hop
    audio = jnp.zeros((b, t_audio, 1))
    mel = jnp.zeros((b, frames, SMALL.cond_channels))
    t = jnp.ones((b, 1))
    out = fastdiff_apply(params, audio, mel, t, SMALL)
    assert out.shape == (b, t_audio, 1)
    assert out.dtype == jnp.float32


def test_param_count_matches_reference_scale():
    """Full-size model must have the reference's ~15.3M parameters."""
    cfg = ModelConfig()
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    n = num_params(params)
    assert 15.2e6 < n < 15.5e6, n


def test_bf16_path_tracks_f32():
    """The bf16 compute path must stay close to the f32 reference path
    (same params): relative L2 error bounded, shapes/dtypes right."""
    import dataclasses
    cfg32 = dataclasses.replace(SMALL, compute_dtype="float32")
    cfg16 = dataclasses.replace(SMALL, compute_dtype="bfloat16")
    params = init_fastdiff(jax.random.PRNGKey(0), cfg32)
    rng = np.random.default_rng(5)
    b, frames = 2, 8
    audio = jnp.asarray(rng.standard_normal((b, frames * cfg32.total_hop, 1)),
                        jnp.float32)
    mel = jnp.asarray(rng.standard_normal((b, frames, cfg32.cond_channels)),
                      jnp.float32)
    t = jnp.full((b, 1), 500.0)
    out32 = np.asarray(fastdiff_apply(params, audio, mel, t, cfg32))
    out16 = np.asarray(fastdiff_apply(params, audio, mel, t, cfg16))
    assert out16.dtype == np.float32
    rel = np.linalg.norm(out16 - out32) / np.linalg.norm(out32)
    assert rel < 0.05, rel


def test_step_embedding_fractional():
    """The embedding must accept non-integer steps (util.py:197-207 produces
    fractional timesteps at inference)."""
    t = jnp.asarray([[3.25], [999.0]])
    emb = diffusion_step_embedding(t, 128)
    assert emb.shape == (2, 128)
    half = 64
    freqs = np.exp(np.log(10000.0) / (half - 1) * -np.arange(half))
    np.testing.assert_allclose(np.asarray(emb)[0, :half],
                               np.sin(3.25 * freqs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb)[0, half:],
                               np.cos(3.25 * freqs), rtol=1e-5, atol=1e-6)


def _patch_cuda_to_cpu(torch, monkeypatch):
    """The reference hardcodes .cuda() (util.py:68,91,427); run it on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


@requires_reference
@pytest.mark.parametrize("use_weight_norm", [True, False])
def test_forward_parity_with_reference(use_weight_norm, monkeypatch):
    """Import reference torch weights into our pytree; outputs must match."""
    torch = pytest.importorskip("torch")
    _patch_cuda_to_cpu(torch, monkeypatch)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from modules.FastDiff.module.FastDiff_model import FastDiff as TorchFastDiff

    torch.manual_seed(0)
    tmodel = TorchFastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=[4, 2, 2], lvc_layers_each_block=4, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3, dropout=0.0,
        diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
        diffusion_step_embed_dim_out=32, use_weight_norm=use_weight_norm)
    tmodel.eval()

    cfg = ModelConfig(
        inner_channels=8, cond_channels=16, upsample_ratios=(4, 2, 2),
        kpnet_hidden_channels=8, diffusion_step_embed_dim_in=16,
        diffusion_step_embed_dim_mid=32, diffusion_step_embed_dim_out=32,
        use_weight_norm=use_weight_norm, compute_dtype="float32")
    params = convert_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(7)
    b, frames = 2, 5
    t_audio = frames * cfg.total_hop
    audio = rng.standard_normal((b, t_audio, 1)).astype(np.float32)
    mel = rng.standard_normal((b, frames, 16)).astype(np.float32)
    tsteps = np.asarray([[17.0], [3.5]], dtype=np.float32)

    with torch.no_grad():
        want = tmodel((torch.from_numpy(audio.transpose(0, 2, 1)),
                       torch.from_numpy(mel.transpose(0, 2, 1)),
                       torch.from_numpy(tsteps))).numpy()

    got = fastdiff_apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(audio), jnp.asarray(mel), jnp.asarray(tsteps), cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=2e-4)


@requires_reference
def test_forward_parity_full_size_model(monkeypatch):
    """Same parity test at the real 15.3M-parameter configuration."""
    torch = pytest.importorskip("torch")
    _patch_cuda_to_cpu(torch, monkeypatch)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from modules.FastDiff.module.FastDiff_model import FastDiff as TorchFastDiff

    torch.manual_seed(1)
    tmodel = TorchFastDiff()
    tmodel.eval()

    cfg = ModelConfig(compute_dtype="float32")
    params = convert_torch_state_dict(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(11)
    b, frames = 1, 4
    t_audio = frames * cfg.total_hop
    audio = rng.standard_normal((b, t_audio, 1)).astype(np.float32)
    mel = rng.standard_normal((b, frames, 80)).astype(np.float32)
    tsteps = np.asarray([[412.7]], dtype=np.float32)

    with torch.no_grad():
        want = tmodel((torch.from_numpy(audio.transpose(0, 2, 1)),
                       torch.from_numpy(mel.transpose(0, 2, 1)),
                       torch.from_numpy(tsteps))).numpy()

    got = fastdiff_apply(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(audio), jnp.asarray(mel), jnp.asarray(tsteps), cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=5e-4)
