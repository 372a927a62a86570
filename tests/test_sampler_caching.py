"""Param-traced sampler: two different states share ONE compiled executable.

Regression test for the round-1 recompile trap: ``make_sampler`` closes over
params and passes the closure as a static jit key, so every new state (EMA
snapshot, reloaded checkpoint) recompiled the full reverse process. The
serving-shaped path is ``make_param_sampler`` (params traced, compile cache
keyed on apply_fn identity + shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import make_param_sampler, make_sampler
from fastdiff_tpu.models.fastdiff import get_apply_fn, init_fastdiff

SMALL = ModelConfig(inner_channels=8, cond_channels=16,
                    upsample_ratios=(4, 2, 2), kpnet_hidden_channels=8,
                    diffusion_step_embed_dim_in=16,
                    diffusion_step_embed_dim_mid=32,
                    diffusion_step_embed_dim_out=32,
                    compute_dtype="float32")


def _constants(n=4):
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    return schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(n), hp)


def test_two_states_one_trace():
    const = _constants()
    traces = []
    base_apply = get_apply_fn(SMALL)

    def counting_apply(params, x, mel, t):
        traces.append(1)   # runs once per jit trace, not per call
        return base_apply(params, x, mel, t)

    sample = make_param_sampler(counting_apply, const)
    p1 = init_fastdiff(jax.random.PRNGKey(0), SMALL)
    p2 = init_fastdiff(jax.random.PRNGKey(1), SMALL)
    mel = jnp.zeros((1, 8, 16))
    key = jax.random.PRNGKey(42)
    hop = int(np.prod(SMALL.upsample_ratios))
    w1 = np.asarray(sample(p1, key, mel, 8 * hop))
    n_traces_after_first = len(traces)
    w2 = np.asarray(sample(p2, key, mel, 8 * hop))

    assert n_traces_after_first >= 1
    assert len(traces) == n_traces_after_first, (
        "second state retraced the sampler — params are not a traced arg")
    # different params through one executable must produce different audio
    assert not np.allclose(w1, w2)
    assert np.all(np.isfinite(w1)) and np.all(np.isfinite(w2))


def test_get_apply_fn_identity_stable():
    cfg_a = ModelConfig(inner_channels=8, cond_channels=16,
                        upsample_ratios=(4, 2, 2), kpnet_hidden_channels=8,
                        diffusion_step_embed_dim_in=16,
                        diffusion_step_embed_dim_mid=32,
                        diffusion_step_embed_dim_out=32,
                        compute_dtype="float32")
    assert get_apply_fn(cfg_a) is get_apply_fn(SMALL)          # equal cfgs
    assert get_apply_fn(ModelConfig()) is get_apply_fn(ModelConfig())


def test_param_sampler_matches_closure_sampler():
    const = _constants()
    params = init_fastdiff(jax.random.PRNGKey(0), SMALL)
    apply_fn = get_apply_fn(SMALL)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 16)),
                      jnp.float32)
    key = jax.random.PRNGKey(7)
    hop = int(np.prod(SMALL.upsample_ratios))
    w_closure = make_sampler(lambda x, m, t: apply_fn(params, x, m, t),
                             const)(key, mel, 8 * hop)
    w_param = make_param_sampler(apply_fn, const)(params, key, mel, 8 * hop)
    np.testing.assert_allclose(np.asarray(w_closure), np.asarray(w_param),
                               rtol=1e-6, atol=1e-6)


def test_task_test_sampler_shares_compile():
    """The trainer.test path: samplers from two states share the cache."""
    from fastdiff_tpu.training.task import FastDiffTask
    from fastdiff_tpu.utils.hparams import load_config_cascade

    hp = load_config_cascade("fastdiff_tpu/configs/base.yaml")
    hp.update(inner_channels=8, cond_channels=16, kpnet_hidden_channels=8,
              upsample_ratios=[4, 2, 2], diffusion_step_embed_dim_in=16,
              diffusion_step_embed_dim_mid=32, diffusion_step_embed_dim_out=32,
              audio_num_mel_bins=16, hop_size=16, N=4,
              binary_data_dir="/nonexistent")
    task = FastDiffTask(hp)
    const = task.sampler_constants()
    p1 = init_fastdiff(jax.random.PRNGKey(0), task.model_cfg)
    p2 = init_fastdiff(jax.random.PRNGKey(1), task.model_cfg)
    s1 = task.make_test_sampler({"params": p1}, const)
    s2 = task.make_test_sampler({"params": p2}, const)
    mel = jnp.zeros((1, 8, 16))
    key = jax.random.PRNGKey(0)

    from fastdiff_tpu.diffusion.sampler import _jitted_param_sample
    w1 = s1(key, mel, 8 * 16)
    misses_after_first = _jitted_param_sample._cache_size()
    w2 = s2(key, mel, 8 * 16)
    assert _jitted_param_sample._cache_size() == misses_after_first
    assert not np.allclose(np.asarray(w1), np.asarray(w2))
