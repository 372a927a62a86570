"""WaveNet alternative denoiser: shapes + parity of the mel upsampler and
full forward against the reference torch implementation."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.models.wavenet import (WaveNetConfig, init_wavenet,
                                         wavenet_apply)
from tests.conftest import REFERENCE_DIR, requires_reference

SMALL = WaveNetConfig(res_channels=8, skip_channels=8, num_res_layers=3,
                      dilation_cycle=2, noise_scale_embed_dim_in=16,
                      noise_scale_embed_dim_mid=32,
                      noise_scale_embed_dim_out=32, multiband=True,
                      cond_channels=16, compute_dtype="float32")


def test_wavenet_forward_shapes():
    params = init_wavenet(jax.random.PRNGKey(0), SMALL)
    b, frames = 2, 4
    length = frames * 64          # multiband: total upsample 8*8=64
    audio = jnp.zeros((b, length, 1))
    mel = jnp.zeros((b, frames, 16))
    t = jnp.ones((b, 1))
    out = wavenet_apply(params, audio, mel, t, SMALL)
    assert out.shape == (b, length, 1)


def test_wavenet_zero_out_conv_at_init():
    """The output projection is zero-initialized (WaveNet.py:28-37), so a
    fresh model must output exactly zero."""
    params = init_wavenet(jax.random.PRNGKey(0), SMALL)
    audio = jnp.ones((1, 128, 1))
    mel = jnp.ones((1, 2, 16))
    out = wavenet_apply(params, audio, mel, jnp.ones((1, 1)), SMALL)
    assert float(jnp.abs(out).max()) == 0.0


@requires_reference
def test_wavenet_parity_with_reference(monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from modules.FastDiff.module.WaveNet import WaveNet_vocoder

    torch.manual_seed(0)
    tmodel = WaveNet_vocoder(
        in_channels=1, res_channels=8, skip_channels=8, out_channels=1,
        num_res_layers=3, dilation_cycle=2, noise_scale_embed_dim_in=16,
        noise_scale_embed_dim_mid=32, noise_scale_embed_dim_out=32,
        multiband=True)
    tmodel.eval()

    import dataclasses
    cfg = dataclasses.replace(SMALL, cond_channels=80)  # reference hardcodes
    params = _convert_wavenet_state_dict(tmodel.state_dict(), cfg)          # 80 mel bands (WaveNet.py:65)

    rng = np.random.default_rng(3)
    b, frames = 1, 3
    length = frames * 64
    audio = rng.standard_normal((b, length, 1)).astype(np.float32)
    mel = rng.standard_normal((b, frames, 80)).astype(np.float32)
    t = np.asarray([[5.0]], dtype=np.float32)

    with torch.no_grad():
        want = tmodel((torch.from_numpy(audio.transpose(0, 2, 1)),
                       torch.from_numpy(mel.transpose(0, 2, 1)),
                       torch.from_numpy(t))).numpy()

    got = wavenet_apply(jax.tree_util.tree_map(jnp.asarray, params),
                        jnp.asarray(audio), jnp.asarray(mel), jnp.asarray(t),
                        cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=2e-4)


def _convert_wavenet_state_dict(sd, cfg):
    """Torch WaveNet state_dict -> our pytree (test-local; the generic
    importer only handles FastDiff)."""
    from fastdiff_tpu.utils.ckpt_import import (_conv_from_torch,
                                                _dense_from_torch)

    def convT2d(prefix):
        v = sd[f"{prefix}.weight_v"].detach().numpy()   # (1, 1, KH, KW)
        g = sd[f"{prefix}.weight_g"].detach().numpy()
        b = sd[f"{prefix}.bias"].detach().numpy()
        # flip both spatial dims, to (KH, KW, I=1, O=1)
        v = v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        return {"v": np.asarray(v, np.float32),
                "g": np.asarray(g, np.float32).reshape(()),
                "b": np.asarray(b, np.float32)}

    params = {
        "init_conv": _conv_from_torch(sd, "init_conv.0.conv", False),
        "fc_t1": _dense_from_torch(sd, "residual_layer.fc_t1"),
        "fc_t2": _dense_from_torch(sd, "residual_layer.fc_t2"),
        "final_conv": _conv_from_torch(sd, "final_conv.0.conv", False),
        "out_conv": _conv_from_torch(sd, "final_conv.2.conv", False),
        "blocks": [],
    }
    for n in range(cfg.num_res_layers):
        p = f"residual_layer.residual_blocks.{n}"
        params["blocks"].append({
            "fc_t": _dense_from_torch(sd, f"{p}.fc_t"),
            "dilated_conv": _conv_from_torch(sd, f"{p}.dilated_conv_layer.conv", False),
            "upsamplers": [convT2d(f"{p}.upsample_conv2d.{i}") for i in range(2)],
            "mel_conv": _conv_from_torch(sd, f"{p}.mel_conv.conv", False),
            "res_conv": _conv_from_torch(sd, f"{p}.res_conv", False),
            "skip_conv": _conv_from_torch(sd, f"{p}.skip_conv", False),
        })
    return params
