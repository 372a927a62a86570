"""Mesh/sharding correctness: dp-sharded computation must equal the
single-device computation bit-for-bit (same rng), and sharding helpers
behave as documented."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fastdiff_tpu.config import MeshConfig
from fastdiff_tpu.parallel import mesh as meshlib


def test_make_mesh_default_spans_all_devices():
    mesh = meshlib.make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp",)


def test_make_mesh_shape_validation():
    import pytest
    with pytest.raises(ValueError):
        meshlib.make_mesh(MeshConfig(mesh_shape=(3,), mesh_axes=("dp",)))


def test_two_axis_mesh():
    mesh = meshlib.make_mesh(MeshConfig(mesh_shape=(4, 2),
                                        mesh_axes=("dp", "sp")))
    assert mesh.shape == {"dp": 4, "sp": 2}


def test_shard_batch_placement():
    mesh = meshlib.make_mesh()
    batch = {"a": np.zeros((16, 4), np.float32),   # divisible -> sharded
             "b": np.zeros((3, 4), np.float32)}    # not -> replicated
    out = meshlib.shard_batch(batch, mesh)
    assert out["a"].sharding.spec == P("dp")
    assert out["b"].sharding.spec == P()


def test_dp_sharded_loss_and_grads_match_unsharded():
    """A jitted loss+grad over a dp-sharded batch must equal the same
    computation with the batch replicated on one device: XLA's inserted
    collectives change the schedule, not the math."""
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import init_fastdiff, fastdiff_apply
    from fastdiff_tpu.diffusion.losses import theta_timestep_loss

    cfg = ModelConfig(inner_channels=8, cond_channels=16,
                      upsample_ratios=(4, 2, 2), kpnet_hidden_channels=8,
                      lvc_layers_each_block=1,
                      diffusion_step_embed_dim_in=16,
                      diffusion_step_embed_dim_mid=32,
                      diffusion_step_embed_dim_out=32,
                      compute_dtype="float32")
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    alpha = jnp.linspace(0.99, 0.1, 20)

    def loss_fn(p, mels, wavs, key):
        return theta_timestep_loss(
            lambda x, m, t: fastdiff_apply(p, x, m, t, cfg),
            key, mels, wavs, alpha)

    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal((8, 6, 16)), jnp.float32)
    wavs = jnp.asarray(rng.standard_normal((8, 6 * 16, 1)) * 0.3, jnp.float32)
    key = jax.random.PRNGKey(7)

    # unsharded (default placement)
    loss_ref, grads_ref = jax.jit(jax.value_and_grad(loss_fn))(
        params, mels, wavs, key)

    # dp-sharded batch over the 8-device mesh
    mesh = meshlib.make_mesh()
    mels_s = jax.device_put(mels, meshlib.batch_sharding(mesh))
    wavs_s = jax.device_put(wavs, meshlib.batch_sharding(mesh))
    params_r = meshlib.replicate(params, mesh)
    loss_s, grads_s = jax.jit(
        jax.value_and_grad(loss_fn),
        out_shardings=(meshlib.replicated(mesh), meshlib.replicated(mesh)),
    )(params_r, mels_s, wavs_s, key)

    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_s),
                    jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
