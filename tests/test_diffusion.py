"""Diffusion math: hyperparam tables, fractional timestep mapping, derived
schedules, loss and end-to-end sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import DiffusionConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.losses import theta_timestep_loss
from fastdiff_tpu.diffusion.sampler import sampling_given_noise_schedule


def _loop_oracle(beta):
    """Sequential-recurrence oracle for (alpha, sigma), following the
    semantics of util.py:365-390 step by step."""
    beta = np.asarray(beta, dtype=np.float64)
    alpha = 1.0 - beta
    sigma = beta.copy()
    for t in range(1, len(beta)):
        alpha[t] *= alpha[t - 1]
        sigma[t] *= (1 - alpha[t - 1]) / (1 - alpha[t])
    return np.sqrt(alpha), np.sqrt(sigma)


def test_hyperparams_match_loop_oracle():
    cfg = DiffusionConfig()
    beta = schedules.linear_beta_schedule(cfg)
    hp = schedules.compute_hyperparams_given_schedule(beta)
    alpha, sigma = _loop_oracle(beta)
    np.testing.assert_allclose(hp.alpha, alpha, rtol=1e-5)
    np.testing.assert_allclose(hp.sigma, sigma, rtol=1e-4)
    assert hp.T == 1000


def test_fractional_step_mapping():
    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    # exact table hits map to integer steps
    for t in (0, 1, 500, 999):
        got = schedules.map_noise_scale_to_time_step(float(hp.alpha[t]), hp.alpha)
        assert abs(got - t) < 1e-3, (t, got)
    # midpoints map to ~t+0.5
    mid = 0.5 * (hp.alpha[10] + hp.alpha[11])
    got = schedules.map_noise_scale_to_time_step(float(mid), hp.alpha)
    assert 10.4 < got < 10.6
    # out-of-range clamps
    assert schedules.map_noise_scale_to_time_step(1.0, hp.alpha) == 0.0
    assert schedules.map_noise_scale_to_time_step(0.0, hp.alpha) == float(hp.T - 1)


@pytest.mark.parametrize("n", [3, 4, 6, 8, 200, 1000])
def test_derived_schedule_table(n):
    sched = schedules.noise_schedule_for_steps(n)
    assert len(sched) == n
    assert (np.diff(sched) > 0).all()


def test_resolve_noise_schedule_fallbacks():
    assert len(schedules.resolve_noise_schedule({"noise_schedule": "", "N": 8})) == 8
    assert len(schedules.resolve_noise_schedule({"noise_schedule": "", "N": ""})) == 4
    explicit = schedules.resolve_noise_schedule(
        {"noise_schedule": [0.1, 0.2], "N": 8})
    np.testing.assert_allclose(explicit, [0.1, 0.2])


def test_sampler_constants_reverse_order():
    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    assert const.n_steps == 4
    # scan order: most-noisy (largest beta) first
    assert const.beta[0] == pytest.approx(7.0414e-01, rel=1e-4)
    assert (np.diff(const.steps) < 0).all()  # countdown in training steps


def test_theta_timestep_loss_decreases_for_identity_denoiser():
    """A denoiser that returns exactly the injected noise has zero loss."""
    cfg = DiffusionConfig(T=10)
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    alpha = jnp.asarray(hp.alpha)
    key = jax.random.PRNGKey(0)
    mel = jnp.zeros((2, 4, 8))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))

    # cheating oracle: recover z from (x_t, t) using the known x0
    def perfect_denoiser(x_t, mel_in, t):
        a = alpha[t.astype(jnp.int32)][..., None]
        return (x_t - a * audio) / jnp.sqrt(1 - a ** 2)

    loss = theta_timestep_loss(perfect_denoiser, key, mel, audio, alpha)
    assert float(loss) < 1e-10

    def zero_denoiser(x_t, mel_in, t):
        return jnp.zeros_like(x_t)

    loss0 = theta_timestep_loss(zero_denoiser, key, mel, audio, alpha)
    assert float(loss0) > 0.5  # E[z^2] = 1


def test_sampling_runs_and_shapes():
    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    def fake_denoiser(x, mel, t):
        return 0.1 * x

    mel = jnp.zeros((2, 4, 8))
    wav = sampling_given_noise_schedule(
        fake_denoiser, jax.random.PRNGKey(0), mel, const, audio_length=64)
    assert wav.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_sampling_accepts_rbg_key_and_inference_key_is_threefry_on_cpu():
    """The serving/CLI default key comes from ``inference_key`` (rbg typed
    keys on accelerators — the r5h A/B win; threefry on CPU so test goldens
    never move). The sampler must accept both key flavors: the impl rides
    the key through split()/normal() inside the scan."""
    from fastdiff_tpu.diffusion.sampler import inference_key

    # on the CPU test backend the helper returns plain threefry
    k = inference_key(7)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k)),
                                  np.asarray(jax.random.PRNGKey(7)))

    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    def fake_denoiser(x, mel, t):
        return 0.1 * x

    mel = jnp.zeros((1, 4, 8))
    wav = sampling_given_noise_schedule(
        fake_denoiser, jax.random.key(0, impl="rbg"), mel, const,
        audio_length=64)
    assert wav.shape == (1, 64, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_sampling_state_layouts_bit_identical():
    """The NCL (B, 1, L) scan state (the TPU layout fix, docs/PERF.md) must
    produce BIT-identical output to the (B, L, 1) state: same RNG draw
    order, elementwise updates, byte-exact boundary reshapes at C == 1."""
    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)

    def fake_denoiser(x, mel, t):
        assert x.shape[-1] == 1  # the model always sees (B, L, 1)
        return 0.1 * x + 0.01 * jnp.cumsum(x, axis=1)

    mel = jnp.zeros((2, 4, 8))
    outs = [sampling_given_noise_schedule(
        fake_denoiser, jax.random.PRNGKey(3), mel, const, audio_length=64,
        state_ncl=ncl) for ncl in (False, True)]
    assert outs[0].shape == outs[1].shape == (2, 64, 1)
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_sampling_denoises_toward_condition_free_signal():
    """With a perfect epsilon oracle for a fixed x0, sampling at N=1000 should
    recover something close to x0."""
    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(1000), hp)

    x0 = jnp.asarray(
        np.sin(np.linspace(0, 12 * np.pi, 256)).astype(np.float32))[None, :, None]
    alpha_table = jnp.asarray(hp.alpha)

    def oracle(x_t, mel, t):
        # epsilon consistent with x_t = a x0 + sqrt(1-a^2) z
        t_idx = jnp.clip(jnp.round(t), 0, hp.T - 1).astype(jnp.int32)
        a = alpha_table[t_idx][..., None]
        return (x_t - a * x0) / jnp.sqrt(jnp.maximum(1 - a ** 2, 1e-12))

    mel = jnp.zeros((1, 1, 8))
    wav = sampling_given_noise_schedule(
        oracle, jax.random.PRNGKey(0), mel, const, audio_length=256)
    err = float(jnp.sqrt(jnp.mean((wav - x0) ** 2)))
    assert err < 0.1, err


def test_sampling_last_step_adds_no_noise():
    """The final ancestral step must not add noise (reference util.py:228's
    ``i > 0`` guard).  Implemented by zeroing the last sigma inside the
    sampler (the full-length ``where(is_last, ...)`` select cost 0.23
    ms/sampler on TPU, docs/PERF.md r4b): two runs whose constants differ
    ONLY in sigma[-1] must be identical."""
    import dataclasses

    cfg = DiffusionConfig()
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(cfg))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    sig = np.asarray(const.sigma).copy()
    sig[-1] = 1e6
    const_poisoned = dataclasses.replace(const, sigma=jnp.asarray(sig))

    def fake_denoiser(x, mel, t):
        return 0.1 * x

    mel = jnp.zeros((1, 4, 8))
    outs = [sampling_given_noise_schedule(
        fake_denoiser, jax.random.PRNGKey(7), mel, c, audio_length=64)
        for c in (const, const_poisoned)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
