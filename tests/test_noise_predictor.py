"""BDDM noise predictor: shapes, loss finiteness/trainability, search loop."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import DiffusionConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.noise_predictor import (init_noise_predictor,
                                                    noise_predictor_apply,
                                                    phi_loss,
                                                    search_noise_schedule)


def _hp(t=400):
    return schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig(T=t)))


def test_predictor_bounds():
    params = init_noise_predictor(jax.random.PRNGKey(0), hidden=8, n_convs=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1024, 1)),
                    jnp.float32)
    beta_next = jnp.asarray([[0.1], [0.01]])
    delta_sq = jnp.asarray([[0.5], [0.02]])
    beta_est = noise_predictor_apply(params, x, beta_next, delta_sq)
    assert beta_est.shape == (2, 1)
    b = np.asarray(beta_est)
    assert (b > 0).all()
    assert (b <= np.minimum(np.asarray(beta_next), np.asarray(delta_sq))).all()


def test_phi_loss_finite_and_trainable():
    hp = _hp()
    alpha = jnp.asarray(hp.alpha)
    phi = init_noise_predictor(jax.random.PRNGKey(0), hidden=8, n_convs=3)
    rng = np.random.default_rng(0)
    mel = jnp.zeros((2, 4, 8))
    audio = jnp.asarray(rng.standard_normal((2, 1024, 1)) * 0.3, jnp.float32)

    def fake_denoiser(x, m, t):
        return 0.5 * x

    loss = phi_loss(phi, fake_denoiser, jax.random.PRNGKey(1), mel, audio,
                    alpha, tau=50)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: phi_loss(p, fake_denoiser,
                                        jax.random.PRNGKey(1), mel, audio,
                                        alpha, tau=50))(phi)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_search_produces_valid_schedule():
    hp = _hp()
    phi = init_noise_predictor(jax.random.PRNGKey(0), hidden=8, n_convs=3)
    mel = jnp.zeros((1, 4, 8))

    def fake_denoiser(x, m, t):
        return 0.1 * x

    sched = search_noise_schedule(phi, fake_denoiser, jax.random.PRNGKey(2),
                                  mel, hp, audio_length=1024, max_steps=6)
    assert 1 <= len(sched) <= 6
    assert (sched > 0).all()
    # usable downstream
    const = schedules.sampler_constants_for_schedule(sched, hp)
    assert const.n_steps == len(sched)
