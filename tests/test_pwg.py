"""PWG generator: shapes + full forward parity vs the reference torch model."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.models.pwg import (PWGConfig, convert_pwg_diffusion_state_dict,
                                     convert_pwg_state_dict, init_pwg,
                                     init_pwg_diffusion, pwg_apply,
                                     pwg_diffusion_apply)
from tests.conftest import REFERENCE_DIR, requires_reference

SMALL = PWGConfig(layers=6, stacks=3, residual_channels=8, gate_channels=16,
                  skip_channels=8, aux_channels=10, aux_context_window=2,
                  upsample_scales=(4, 4), compute_dtype="float32")


def test_pwg_forward_shapes():
    params = init_pwg(jax.random.PRNGKey(0), SMALL)
    b, frames = 2, 6
    t = frames * 16
    noise = jnp.zeros((b, t, 1))
    mel = jnp.zeros((b, frames, 10))
    out = pwg_apply(params, noise, mel, SMALL)
    assert out.shape == (b, t, 1)


@requires_reference
def test_pwg_parity_with_reference():
    torch = pytest.importorskip("torch")
    from tests.conftest import stub_missing_modules
    stub_missing_modules("chardet", "librosa", "librosa.filters", "yaml")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from modules.parallel_wavegan.models.parallel_wavegan import \
        ParallelWaveGANGenerator

    torch.manual_seed(0)
    tmodel = ParallelWaveGANGenerator(
        layers=6, stacks=3, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]})
    tmodel.eval()

    params = convert_pwg_state_dict(tmodel.state_dict(), SMALL)

    rng = np.random.default_rng(5)
    b, frames = 1, 6
    t = frames * 16
    noise = rng.standard_normal((b, t, 1)).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)

    with torch.no_grad():
        # the reference edge-pads the mel by the context window host-side
        # (vocoders/pwg.py:88-95)
        c = np.pad(mel[0].T, ((0, 0), (2, 2)), "edge")[None]
        want = tmodel(torch.from_numpy(noise.transpose(0, 2, 1)),
                      torch.from_numpy(c.astype(np.float32))).numpy()

    got = pwg_apply(jax.tree_util.tree_map(jnp.asarray, params),
                    jnp.asarray(noise), jnp.asarray(mel), SMALL)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=2e-4)


def test_pwg_diffusion_forward_shapes():
    params = init_pwg_diffusion(jax.random.PRNGKey(0), SMALL)
    b, frames = 2, 6
    t = frames * 16
    x_t = jnp.zeros((b, t, 1))
    mel = jnp.zeros((b, frames, 10))
    steps = jnp.full((b, 1), 3.7, jnp.float32)     # fractional t supported
    out = pwg_diffusion_apply(params, x_t, mel, steps, SMALL)
    assert out.shape == (b, t, 1)


@requires_reference
def test_pwg_diffusion_parity_with_reference(monkeypatch):
    """Forward parity vs ParallelWaveGANGenerator_Diffusion — the vendored
    diffusion-conditioned PWG the reference never instantiates
    (parallel_wavegan.py:23-231; dead code there, working here)."""
    torch = pytest.importorskip("torch")
    from tests.conftest import stub_missing_modules
    stub_missing_modules("chardet", "librosa", "librosa.filters", "yaml")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    from modules.parallel_wavegan.models.parallel_wavegan import \
        ParallelWaveGANGenerator_Diffusion

    torch.manual_seed(0)
    tmodel = ParallelWaveGANGenerator_Diffusion(
        layers=6, stacks=3, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]})
    tmodel.eval()

    params = convert_pwg_diffusion_state_dict(tmodel.state_dict(), SMALL)

    rng = np.random.default_rng(7)
    b, frames = 1, 6
    t = frames * 16
    x_t = rng.standard_normal((b, t, 1)).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)
    steps = np.full((b, 1), 2.5, np.float32)

    with torch.no_grad():
        c = np.pad(mel[0].T, ((0, 0), (2, 2)), "edge")[None]
        want = tmodel(torch.from_numpy(x_t.transpose(0, 2, 1)),
                      c=torch.from_numpy(c.astype(np.float32)),
                      diffusion_steps=torch.from_numpy(steps)).numpy()

    got = pwg_diffusion_apply(jax.tree_util.tree_map(jnp.asarray, params),
                              jnp.asarray(x_t), jnp.asarray(mel),
                              jnp.asarray(steps), SMALL)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-3, atol=2e-4)
