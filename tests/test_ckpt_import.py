"""Torch checkpoint file import: trainer envelope, weight-norm fusion, and
end-to-end equality with the live torch model."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.models.fastdiff import fastdiff_apply, fuse_weight_norm
from fastdiff_tpu.utils.ckpt_import import load_torch_checkpoint
from tests.conftest import REFERENCE_DIR, requires_reference

CFG = ModelConfig(inner_channels=8, cond_channels=16, upsample_ratios=(4, 2, 2),
                  kpnet_hidden_channels=8, diffusion_step_embed_dim_in=16,
                  diffusion_step_embed_dim_mid=32, diffusion_step_embed_dim_out=32,
                  compute_dtype="float32")


@requires_reference
@pytest.mark.parametrize("envelope", ["nested", "flat", "bare"])
def test_released_checkpoint_layouts(tmp_path, envelope, monkeypatch):
    """The three on-disk layouts the reference tolerates
    (utils/ckpt_utils.py:36-61, egs/demo.ipynb reads
    ckpt['state_dict']['model'])."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from modules.FastDiff.module.FastDiff_model import FastDiff as TorchFastDiff

    torch.manual_seed(3)
    tmodel = TorchFastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=[4, 2, 2], lvc_layers_each_block=4, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3, dropout=0.0,
        diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
        diffusion_step_embed_dim_out=32, use_weight_norm=True)
    tmodel.eval()
    sd = tmodel.state_dict()

    path = str(tmp_path / "model_ckpt_steps_500000.ckpt")
    if envelope == "nested":
        torch.save({"state_dict": {"model": sd}, "global_step": 500000}, path)
    elif envelope == "flat":
        torch.save({"state_dict": {f"model.{k}": v for k, v in sd.items()}},
                   path)
    else:
        torch.save(sd, path)

    params = load_torch_checkpoint(path, CFG)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 4 * CFG.total_hop, 1)).astype(np.float32)
    mel = rng.standard_normal((1, 4, 16)).astype(np.float32)
    t = np.asarray([[100.0]], np.float32)
    with torch.no_grad():
        want = tmodel((torch.from_numpy(audio.transpose(0, 2, 1)),
                       torch.from_numpy(mel.transpose(0, 2, 1)),
                       torch.from_numpy(t))).numpy()
    got = fastdiff_apply(params, jnp.asarray(audio), jnp.asarray(mel),
                         jnp.asarray(t), CFG)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=2e-4)

    # fused params must produce identical outputs
    fused = fuse_weight_norm(params)
    got_fused = fastdiff_apply(fused, jnp.asarray(audio), jnp.asarray(mel),
                               jnp.asarray(t), CFG)
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(got),
                               rtol=1e-5, atol=1e-6)
