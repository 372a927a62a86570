"""Shared fixtures. Platform pinning happens in the root conftest.py."""

import os

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference implementation not mounted at /root/reference")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
