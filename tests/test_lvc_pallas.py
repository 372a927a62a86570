"""Pallas LVC kernel: interpret-mode parity vs the XLA path on CPU.

The compiled kernel is exercised on real TPU by bench/profile runs; here the
kernel *logic* (tap construction, bias folding, gate, residual) is verified
in the Pallas interpreter so CI stays hardware-independent.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import fastdiff_tpu.ops.lvc_pallas as lvc_pallas
from fastdiff_tpu.ops.lvc import lvc_gated_residual


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("hop,frames", [(64, 16), (256, 8), (256, 24)])
def test_pallas_matches_xla(rng, interpret_pallas, hop, frames):
    b, c, k = 2, 32, 3
    length = frames * hop
    x = jnp.asarray(rng.standard_normal((b, length, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, length, c)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((b, frames, k, c, 2 * c)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, frames, 2 * c)), jnp.float32)
    want = lvc_gated_residual(x, y, ker, bias, hop)
    got = lvc_pallas.lvc_gated_pallas(x, y, ker, bias, hop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_small_hop_falls_back_to_xla(rng):
    """hop < 64 must route to the XLA path (identical results, no pallas)."""
    b, c, hop, frames = 1, 32, 8, 16
    length = frames * hop
    x = jnp.asarray(rng.standard_normal((b, length, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, length, c)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((b, frames, 3, c, 2 * c)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((b, frames, 2 * c)), jnp.float32)
    want = lvc_gated_residual(x, y, ker, bias, hop)
    got = lvc_pallas.lvc_gated_pallas(x, y, ker, bias, hop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_tile_frames_picker():
    assert lvc_pallas._pick_tile_frames(864, 256) % 8 == 0
    assert 864 % lvc_pallas._pick_tile_frames(864, 256) == 0
    assert lvc_pallas._pick_tile_frames(864, 64) % 8 == 0
    # frame counts with no multiple-of-8 divisor fall back to full
    assert lvc_pallas._pick_tile_frames(7, 256) == 7
