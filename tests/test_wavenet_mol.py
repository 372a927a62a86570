"""MoL WaveNet family: mixture-math parity vs the reference torch code,
teacher-forced forward parity vs the reference WaveNet, and incremental
(ring-buffer scan) == parallel consistency."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.models.wavenet_mol import (MoLWaveNetConfig,
                                             convert_wavenet_state_dict,
                                             fold_with_overlap,
                                             init_wavenet_mol,
                                             wavenet_generate,
                                             wavenet_incremental_logits,
                                             wavenet_mol_apply,
                                             wavenet_mol_loss)
from fastdiff_tpu.ops import mixture
from tests.conftest import REFERENCE_DIR, requires_reference

SMALL = MoLWaveNetConfig(out_channels=6, layers=4, stacks=2,
                         residual_channels=8, gate_channels=16,
                         skip_channels=8, cin_channels=10,
                         upsample_scales=(4, 4))


def _import_reference_torch():
    import types
    torch = pytest.importorskip("torch")
    for m in ("chardet", "librosa", "librosa.filters", "yaml"):
        sys.modules.setdefault(m, types.ModuleType(m))
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return torch


@requires_reference
def test_mixture_losses_match_reference():
    torch = _import_reference_torch()
    from modules.wavenet_vocoder import mixture as tmix

    rng = np.random.default_rng(0)
    y_hat = rng.standard_normal((2, 9, 40)).astype(np.float32)  # (B, C, T)
    y = np.clip(rng.standard_normal((2, 40, 1)), -1, 1).astype(np.float32)

    want = tmix.discretized_mix_logistic_loss(
        torch.from_numpy(y_hat), torch.from_numpy(y), log_scale_min=-7.0)
    got = mixture.discretized_mix_logistic_loss(
        jnp.asarray(y_hat.transpose(0, 2, 1)), jnp.asarray(y[..., 0]),
        log_scale_min=-7.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    want_g = tmix.mix_gaussian_loss(
        torch.from_numpy(y_hat), torch.from_numpy(y), log_scale_min=-7.0)
    got_g = mixture.mix_gaussian_loss(
        jnp.asarray(y_hat.transpose(0, 2, 1)), jnp.asarray(y[..., 0]),
        log_scale_min=-7.0)
    np.testing.assert_allclose(float(got_g), float(want_g), rtol=1e-5)


def test_mol_sampling_statistics():
    """Single-component mixture with known (mu, s): sample moments match a
    logistic distribution (mean mu, std s*pi/sqrt(3))."""
    mu, log_s = 0.3, -3.0
    y = jnp.tile(jnp.asarray([5.0, mu, log_s]), (4000, 1))
    x = mixture.sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(0), y)
    s = np.exp(log_s)
    assert abs(float(x.mean()) - mu) < 0.01
    assert abs(float(x.std()) - s * np.pi / np.sqrt(3.0)) < 0.01

    yg = jnp.tile(jnp.asarray([5.0, mu, log_s]), (4000, 1))
    xg = mixture.sample_from_mix_gaussian(jax.random.PRNGKey(1), yg)
    assert abs(float(xg.mean()) - mu) < 0.01
    assert abs(float(xg.std()) - s) < 0.01


def test_mulaw_roundtrip():
    x = jnp.linspace(-0.99, 0.99, 101)
    np.testing.assert_allclose(np.asarray(mixture.inv_mulaw(mixture.mulaw(x))),
                               np.asarray(x), atol=1e-6)
    ids = mixture.mulaw_quantize(x)
    assert int(ids.min()) >= 0 and int(ids.max()) <= 255
    # nnmnkwii-compatible TRUNCATING quantizer (no +0.5): the roundtrip
    # carries up to a full companded bin of bias after expansion
    back = mixture.inv_mulaw_quantize(ids)
    assert float(jnp.abs(back - x).max()) < 0.05
    # quantizer center convention: silence maps to the AR seed id 127
    assert int(mixture.mulaw_quantize(jnp.zeros(()))) == 127


@requires_reference
def test_forward_parity_with_reference():
    torch = _import_reference_torch()
    from modules.wavenet_vocoder.wavenet import WaveNet

    torch.manual_seed(0)
    tmodel = WaveNet(out_channels=6, layers=4, stacks=2,
                     residual_channels=8, gate_channels=16,
                     skip_out_channels=8, kernel_size=3, cin_channels=10,
                     upsample_conditional_features=True,
                     upsample_params={"upsample_scales": [4, 4],
                                      "cin_channels": 10},
                     scalar_input=True, dropout=0.0)
    tmodel.eval()
    params = convert_wavenet_state_dict(tmodel.state_dict(), SMALL)

    rng = np.random.default_rng(3)
    b, frames = 1, 5
    t = frames * 16
    x = np.clip(rng.standard_normal((b, t, 1)), -1, 1).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 2, 1)),
                      c=torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

    got = wavenet_mol_apply(jax.tree_util.tree_map(jnp.asarray, params),
                            jnp.asarray(x), jnp.asarray(mel), SMALL)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-4, atol=2e-5)


def test_incremental_matches_parallel():
    """The ring-buffer scan must reproduce the parallel causal forward."""
    params = init_wavenet_mol(jax.random.PRNGKey(0), SMALL)
    rng = np.random.default_rng(5)
    b, frames = 2, 4
    t = frames * 16
    x = np.clip(rng.standard_normal((b, t, 1)), -1, 1).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)

    par = wavenet_mol_apply(params, jnp.asarray(x), jnp.asarray(mel), SMALL)
    inc = wavenet_incremental_logits(params, jnp.asarray(x),
                                     jnp.asarray(mel), SMALL)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(par),
                               rtol=1e-4, atol=1e-4)


def test_loss_and_generate_smoke():
    params = init_wavenet_mol(jax.random.PRNGKey(0), SMALL)
    rng = np.random.default_rng(9)
    wav = np.clip(rng.standard_normal((2, 64, 1)), -1, 1).astype(np.float32)
    mel = rng.standard_normal((2, 4, 10)).astype(np.float32)
    loss = wavenet_mol_loss(params, jnp.asarray(wav), jnp.asarray(mel), SMALL)
    assert np.isfinite(float(loss))

    out = wavenet_generate(params, jnp.asarray(mel[:1]), SMALL,
                           jax.random.PRNGKey(1), target=32, overlap=16)
    assert out.shape == (64,)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_ar_closed_loop_matches_teacher_forced():
    """r4 verdict item 7: the closed AR loop (ring buffers + feedback +
    output glue) at temperature -> 0 must agree with the parallel
    teacher-forced forward re-run on the sequence the AR loop generated.
    With deterministic (argmax-component-mean) output, wav[t] is a pure
    function of wav[<t], so re-deriving every step's output from
    ``wavenet_mol_apply`` on the shifted generated sequence must reproduce
    the generated waveform exactly — an off-by-one anywhere in the
    ring-buffer state machine or the feedback path breaks it (the
    "speech-shaped but never high-quality" blind spot, since the micro-LJ
    AR-MoL row demonstrates the pipeline, not near-copy-synthesis)."""
    from fastdiff_tpu.models.wavenet_mol import (upsample_cond,
                                                 wavenet_generate_batched)

    params = init_wavenet_mol(jax.random.PRNGKey(2), SMALL)
    rng = np.random.default_rng(11)
    b, frames = 2, 6
    mel = jnp.asarray(rng.standard_normal((b, frames, 10)), jnp.float32)
    cond = upsample_cond(params, mel, SMALL, jnp.float32)

    wav = wavenet_generate_batched(params, cond, SMALL,
                                   jax.random.PRNGKey(3),
                                   deterministic=True)     # (B, T)
    assert np.isfinite(np.asarray(wav)).all()
    # the AR loop is not degenerate (it produces varying output)
    assert float(jnp.std(wav)) > 0

    # teacher-forced reconstruction on the generated sequence: x_in[t] =
    # wav[t-1], x_in[0] = 0 (the AR loop's x0)
    x_in = jnp.pad(wav[:, :-1, None], ((0, 0), (1, 0), (0, 0)))
    logits_tf = wavenet_mol_apply(params, x_in, mel, SMALL)
    rederived = mixture.mix_logistic_mode(
        logits_tf, log_scale_min=SMALL.log_scale_min)
    np.testing.assert_allclose(np.asarray(rederived), np.asarray(wav),
                               rtol=1e-5, atol=1e-5)


def test_fold_shapes():
    c = jnp.arange(100, dtype=jnp.float32).reshape(1, 100, 1)
    folded = fold_with_overlap(c, target=20, overlap=10)
    assert folded.shape[1] == 40
    # fold i starts at i*(target+overlap)
    np.testing.assert_allclose(np.asarray(folded[1, 0, 0]), 30.0)


def test_onehot_categorical_variant():
    cfg = MoLWaveNetConfig(out_channels=32, layers=2, stacks=1,
                           residual_channels=8, gate_channels=16,
                           skip_channels=8, cin_channels=10,
                           upsample_scales=(4, 4), scalar_input=False)
    params = init_wavenet_mol(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 32, size=(1, 32))
    wav = np.eye(32, dtype=np.float32)[ids]
    mel = rng.standard_normal((1, 2, 10)).astype(np.float32)
    loss = wavenet_mol_loss(params, jnp.asarray(wav), jnp.asarray(mel), cfg)
    assert np.isfinite(float(loss))
    out = wavenet_generate(params, jnp.asarray(mel), cfg,
                           jax.random.PRNGKey(2), target=16, overlap=8)
    assert out.shape == (32,) and np.isfinite(out).all()


GLOBAL = MoLWaveNetConfig(out_channels=6, layers=4, stacks=2,
                          residual_channels=8, gate_channels=16,
                          skip_channels=8, cin_channels=10,
                          upsample_scales=(4, 4), gin_channels=5,
                          n_speakers=3)


@requires_reference
def test_global_conditioning_parity_with_reference():
    """Speaker-embedding global conditioning (reference wavenet.py:88-150,
    modules.py:148-152): id -> embedding -> per-block bias-free 1x1 into
    the gate pre-activation."""
    torch = _import_reference_torch()
    from modules.wavenet_vocoder.wavenet import WaveNet

    torch.manual_seed(1)
    tmodel = WaveNet(out_channels=6, layers=4, stacks=2,
                     residual_channels=8, gate_channels=16,
                     skip_out_channels=8, kernel_size=3, cin_channels=10,
                     gin_channels=5, n_speakers=3,
                     use_speaker_embedding=True,
                     upsample_conditional_features=True,
                     upsample_params={"upsample_scales": [4, 4],
                                      "cin_channels": 10},
                     scalar_input=True, dropout=0.0)
    tmodel.eval()
    params = convert_wavenet_state_dict(tmodel.state_dict(), GLOBAL)
    assert "embed_speakers" in params and "g_conv" in params["blocks"][0]

    rng = np.random.default_rng(7)
    b, frames = 2, 5
    t = frames * 16
    x = np.clip(rng.standard_normal((b, t, 1)), -1, 1).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)
    g = np.asarray([2, 0], np.int64)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 2, 1)),
                      c=torch.from_numpy(mel.transpose(0, 2, 1)),
                      g=torch.from_numpy(g[:, None])).numpy()

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    got = wavenet_mol_apply(jparams, jnp.asarray(x), jnp.asarray(mel),
                            GLOBAL, g=jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=2e-4, atol=2e-5)
    # and the conditioning must actually matter
    got0 = wavenet_mol_apply(jparams, jnp.asarray(x), jnp.asarray(mel),
                             GLOBAL, g=jnp.asarray([0, 0]))
    assert float(jnp.abs(got - got0).max()) > 1e-4


def test_global_conditioning_incremental_matches_parallel():
    params = init_wavenet_mol(jax.random.PRNGKey(2), GLOBAL)
    rng = np.random.default_rng(11)
    b, frames = 2, 4
    t = frames * 16
    x = np.clip(rng.standard_normal((b, t, 1)), -1, 1).astype(np.float32)
    mel = rng.standard_normal((b, frames, 10)).astype(np.float32)
    g = jnp.asarray([1, 2])

    par = wavenet_mol_apply(params, jnp.asarray(x), jnp.asarray(mel),
                            GLOBAL, g=g)
    inc = wavenet_incremental_logits(params, jnp.asarray(x),
                                     jnp.asarray(mel), GLOBAL, g=g)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(par),
                               rtol=1e-4, atol=1e-4)

    # raw-feature g (B, gin) bypasses the embedding table
    g_feat = jnp.asarray(rng.standard_normal((b, 5)), jnp.float32)
    out = wavenet_generate(params, jnp.asarray(mel[:1]), GLOBAL,
                           jax.random.PRNGKey(1), target=32, overlap=16,
                           g=g_feat[:1])
    assert out.shape == (64,) and np.isfinite(out).all()
