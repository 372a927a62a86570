"""Op-level parity: our NWC conv/dense primitives vs torch (independent oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fastdiff_tpu.ops import nn as fnn


def _to_jax_conv_params(tconv, weight_norm=False):
    """torch Conv1d (O, I, K) -> our (K, I, O) param dict."""
    if weight_norm:
        g = tconv.weight_g.detach().numpy()  # (O, 1, 1)
        v = tconv.weight_v.detach().numpy()  # (O, I, K)
        return {"v": jnp.asarray(v.transpose(2, 1, 0)),
                "g": jnp.asarray(g.reshape(-1)),
                "b": jnp.asarray(tconv.bias.detach().numpy())}
    w = tconv.weight.detach().numpy()
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),
            "b": jnp.asarray(tconv.bias.detach().numpy())}


def _to_jax_convT_params(tconv, weight_norm=False):
    """torch ConvTranspose1d (I, O, K) -> our flipped (K, I, O) dict."""
    if weight_norm:
        g = tconv.weight_g.detach().numpy()  # (I, 1, 1)
        v = tconv.weight_v.detach().numpy()  # (I, O, K)
        return {"v": jnp.asarray(v[:, :, ::-1].transpose(2, 0, 1).copy()),
                "g": jnp.asarray(g.reshape(-1)),
                "b": jnp.asarray(tconv.bias.detach().numpy())}
    w = tconv.weight.detach().numpy()
    return {"w": jnp.asarray(w[:, :, ::-1].transpose(2, 0, 1).copy()),
            "b": jnp.asarray(tconv.bias.detach().numpy())}


@pytest.mark.parametrize("k,dilation", [(1, 1), (3, 1), (3, 2), (3, 9), (7, 1), (5, 1)])
def test_conv1d_matches_torch(rng, k, dilation):
    b, t, cin, cout = 2, 64, 5, 7
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, cout, k, padding=dilation * ((k - 1) // 2),
                            dilation=dilation)
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    got = fnn.conv1d(_to_jax_conv_params(tconv), jnp.asarray(x), dilation=dilation)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_conv1d_weight_norm_matches_torch(rng):
    b, t, cin, cout, k = 2, 32, 4, 6, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k, padding=1))
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    got = fnn.conv1d(_to_jax_conv_params(tconv, weight_norm=True), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ratio", [2, 3, 4, 8])
def test_conv_transpose_matches_torch_and_upsamples_exactly(rng, ratio):
    """The reference's upsampler arithmetic (modules.py:163-166) must give an
    exact x{ratio} length increase."""
    b, t, c = 2, 16, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(
        c, c, kernel_size=ratio * 2, stride=ratio,
        padding=ratio // 2 + ratio % 2, output_padding=ratio % 2)
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    assert want.shape[-1] == t * ratio
    got = fnn.conv_transpose1d(
        _to_jax_convT_params(tconv), jnp.asarray(x), stride=ratio,
        torch_padding=ratio // 2 + ratio % 2, output_padding=ratio % 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_weight_norm_matches_torch(rng):
    b, t, c, ratio = 1, 8, 3, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    tconv = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(
        c, c, kernel_size=ratio * 2, stride=ratio, padding=ratio // 2,
        output_padding=0))
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    got = fnn.conv_transpose1d(
        _to_jax_convT_params(tconv, weight_norm=True), jnp.asarray(x),
        stride=ratio, torch_padding=ratio // 2, output_padding=0)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_dense_matches_torch(rng):
    lin = torch.nn.Linear(10, 20)
    x = rng.standard_normal((4, 10)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    params = {"w": jnp.asarray(lin.weight.detach().numpy().T),
              "b": jnp.asarray(lin.bias.detach().numpy())}
    got = fnn.dense(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_nearest_downsample_matches_torch_interpolate(rng, factor):
    b, t, c = 2, 64, 3
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 2, 1)), size=t // factor).numpy()
    got = fnn.nearest_downsample(jnp.asarray(x), factor)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want)


def test_leaky_relu_and_swish(rng):
    x = rng.standard_normal((8, 8)).astype(np.float32)
    want = torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    np.testing.assert_allclose(np.asarray(fnn.leaky_relu(jnp.asarray(x), 0.2)),
                               want, rtol=1e-6)
    want = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(np.asarray(fnn.swish(jnp.asarray(x))), want,
                               rtol=1e-5, atol=1e-6)


# --- NCL (time-in-lanes) twins: parity vs the torch-verified NWC ops -------

@pytest.mark.parametrize("k,dilation,cin,cout",
                         [(3, 1, 5, 7), (3, 4, 32, 32), (7, 1, 1, 32),
                          (7, 1, 32, 1), (1, 1, 32, 32)])
def test_conv1d_ncl_matches_nwc(rng, k, dilation, cin, cout):
    b, t = 2, 64
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, cout, k, padding=dilation * ((k - 1) // 2),
                            dilation=dilation)
    p = _to_jax_conv_params(tconv)
    want = fnn.conv1d(p, jnp.asarray(x), dilation=dilation)
    got = fnn.conv1d_ncl(p, jnp.asarray(x.transpose(0, 2, 1)),
                         dilation=dilation)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ratio", [4, 8])
def test_conv_transpose1d_ncl_matches_nwc(rng, ratio):
    b, t, c = 2, 16, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(
        c, c, kernel_size=ratio * 2, stride=ratio,
        padding=ratio // 2 + ratio % 2, output_padding=ratio % 2)
    p = _to_jax_convT_params(tconv)
    want = fnn.conv_transpose1d(
        p, jnp.asarray(x), stride=ratio,
        torch_padding=ratio // 2 + ratio % 2, output_padding=ratio % 2)
    got = fnn.conv_transpose1d_ncl(
        p, jnp.asarray(x.transpose(0, 2, 1)), stride=ratio,
        torch_padding=ratio // 2 + ratio % 2, output_padding=ratio % 2)
    assert got.shape == (b, c, t * ratio)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               np.asarray(want), rtol=1e-4, atol=1e-5)


def test_nearest_downsample_ncl_matches_nwc(rng):
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    want = fnn.nearest_downsample(jnp.asarray(x), 4)
    got = fnn.nearest_downsample_ncl(jnp.asarray(x.transpose(0, 2, 1)), 4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               np.asarray(want))


# --- batch-shape consistency of the TPU-tuned NCL formulations -------------
# The NCL ops pick different bit-exact formulations by (static) batch size:
# b == 1 -> selection-dot downsample + per-item dots; 2 <= b <= 8 ->
# merged-batch block-diagonal dots (kron(I_B, W)); b > 8 -> batched einsum.
# A batched call must equal the stack of per-item calls in every regime.

@pytest.mark.parametrize("b", [4, 8, 9])
def test_conv1d_ncl_batch_consistency(rng, b):
    x = rng.standard_normal((b, 32, 96)).astype(np.float32)
    p = {"w": jnp.asarray(rng.standard_normal((3, 32, 32)).astype(np.float32)
                          * 0.1),
         "b": jnp.asarray(rng.standard_normal((32,)).astype(np.float32))}
    xj = jnp.asarray(x)
    ref = jnp.concatenate([fnn.conv1d_ncl(p, xj[i:i + 1], dilation=2)
                           for i in range(b)])
    got = fnn.conv1d_ncl(p, xj, dilation=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("b", [4, 8, 9])
def test_conv_transpose1d_ncl_batch_consistency(rng, b):
    x = rng.standard_normal((b, 32, 64)).astype(np.float32)
    p = {"w": jnp.asarray(rng.standard_normal((8, 32, 32)).astype(np.float32)
                          * 0.1),
         "b": jnp.asarray(rng.standard_normal((32,)).astype(np.float32))}
    xj = jnp.asarray(x)
    ref = jnp.concatenate(
        [fnn.conv_transpose1d_ncl(p, xj[i:i + 1], stride=4, torch_padding=2)
         for i in range(b)])
    got = fnn.conv_transpose1d_ncl(p, xj, stride=4, torch_padding=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("stride,length", [(8, 96), (8, 100), (4, 128),
                                           (4, 7), (2, 64)])
def test_conv_transpose1d_ncl_dot_interleave_exact(rng, stride, length):
    """The DOT_INTERLEAVE selection-matmul phase interleave must be
    bit-exact vs the transpose+reshape interleave (0/1 scatter operand, one
    nonzero per output lane), including lengths with no valid lane group
    (g=0 falls back to the transpose path)."""
    k = 2 * stride
    p = {"w": jnp.asarray(
            rng.standard_normal((k, 6, 5)).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.standard_normal((5,)).astype(np.float32))}
    xj = jnp.asarray(rng.standard_normal((3, 6, length)).astype(np.float32))
    kw = dict(stride=stride, torch_padding=stride // 2 + stride % 2,
              output_padding=stride % 2)
    old = fnn.DOT_INTERLEAVE_MIN_B
    try:
        fnn.DOT_INTERLEAVE_MIN_B = 1
        got = fnn.conv_transpose1d_ncl(p, xj, **kw)
        fnn.DOT_INTERLEAVE_MIN_B = 99
        ref = fnn.conv_transpose1d_ncl(p, xj, **kw)
    finally:
        fnn.DOT_INTERLEAVE_MIN_B = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nearest_downsample_ncl_dot_path_exact(rng):
    # length divisible by 512 at b=1 exercises the selection-matmul path;
    # it must be bit-exact vs the strided slice (0/1 selection, one term)
    x = rng.standard_normal((1, 32, 1024)).astype(np.float32)
    xj = jnp.asarray(x)
    got = fnn.nearest_downsample_ncl(xj, 4)
    np.testing.assert_array_equal(np.asarray(got), x[:, :, ::4])
    # and the b>1 merged-2D slice path agrees with per-item calls
    xb = jnp.asarray(rng.standard_normal((4, 32, 1024)).astype(np.float32))
    ref = jnp.concatenate([fnn.nearest_downsample_ncl(xb[i:i + 1], 4)
                           for i in range(4)])
    np.testing.assert_array_equal(
        np.asarray(fnn.nearest_downsample_ncl(xb, 4)), np.asarray(ref))
