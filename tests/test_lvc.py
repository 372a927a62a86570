"""LVC op correctness: fast batched-matmul form vs a naive per-sample loop,
and vs the reference torch implementation when mounted."""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from fastdiff_tpu.ops.lvc import location_variable_convolution, lvc_gated_residual
from tests.conftest import REFERENCE_DIR, requires_reference


def naive_lvc(x, kernel, bias, hop):
    """Direct-definition oracle: out[b, l*hop+t, o] =
    bias[b,l,o] + sum_{k,i} x_pad[b, l*hop+t+k, i] * kernel[b,l,k,i,o]."""
    b, length, cin = x.shape
    _, frames, ksize, _, cout = kernel.shape
    pad = (ksize - 1) // 2
    x_pad = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = np.zeros((b, length, cout), dtype=np.float64)
    for bi in range(b):
        for l in range(frames):
            for t in range(hop):
                s = l * hop + t
                for o in range(cout):
                    acc = bias[bi, l, o]
                    for k in range(ksize):
                        for i in range(cin):
                            acc += x_pad[bi, s + k, i] * kernel[bi, l, k, i, o]
                    out[bi, s, o] = acc
    return out.astype(np.float32)


@pytest.mark.parametrize("hop,frames", [(4, 3), (8, 2)])
def test_lvc_matches_naive(rng, hop, frames):
    b, cin, cout, k = 2, 3, 5, 3
    length = frames * hop
    x = rng.standard_normal((b, length, cin)).astype(np.float32)
    kernel = rng.standard_normal((b, frames, k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((b, frames, cout)).astype(np.float32)
    want = naive_lvc(x, kernel, bias, hop)
    got = location_variable_convolution(jnp.asarray(x), jnp.asarray(kernel),
                                        jnp.asarray(bias), hop)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _load_reference_modules():
    """Import the reference's modules.py directly from its file path (oracle
    only; never vendored)."""
    path = os.path.join(REFERENCE_DIR, "modules/FastDiff/module/modules.py")
    spec = importlib.util.spec_from_file_location("ref_fastdiff_modules", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_fastdiff_modules"] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_reference
@pytest.mark.parametrize("hop,frames", [(8, 5), (64, 3), (256, 2)])
def test_lvc_matches_reference_torch(rng, hop, frames):
    torch = pytest.importorskip("torch")
    ref = _load_reference_modules()
    blk = ref.TimeAware_LVCBlock.__new__(ref.TimeAware_LVCBlock)

    b, cin, cout, k = 2, 4, 8, 3
    length = frames * hop
    x = rng.standard_normal((b, cin, length)).astype(np.float32)       # NCL
    kernel = rng.standard_normal((b, cin, cout, k, frames)).astype(np.float32)
    bias = rng.standard_normal((b, cout, frames)).astype(np.float32)
    want = blk.location_variable_convolution(
        torch.from_numpy(x), torch.from_numpy(kernel), torch.from_numpy(bias),
        1, hop).numpy()

    # convert layouts: x NCL->NWC, kernel (B,I,O,K,F)->(B,F,K,I,O), bias ->(B,F,O)
    got = location_variable_convolution(
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(kernel.transpose(0, 4, 3, 1, 2)),
        jnp.asarray(bias.transpose(0, 2, 1)), hop)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-4)


def test_lvc_gated_residual(rng):
    b, c, hop, frames = 1, 4, 8, 3
    length = hop * frames
    x = rng.standard_normal((b, length, c)).astype(np.float32)
    y_in = rng.standard_normal((b, length, c)).astype(np.float32)
    kernel = rng.standard_normal((b, frames, 3, c, 2 * c)).astype(np.float32)
    bias = rng.standard_normal((b, frames, 2 * c)).astype(np.float32)

    y = naive_lvc(y_in, kernel, bias, hop)
    want = x + 1.0 / (1.0 + np.exp(-y[..., :c])) * np.tanh(y[..., c:])
    got = lvc_gated_residual(jnp.asarray(x), jnp.asarray(y_in),
                             jnp.asarray(kernel), jnp.asarray(bias), hop)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
