"""Root conftest: pin tests to a virtual 8-device CPU JAX platform.

The real-TPU session env sets JAX_PLATFORMS=axon; tests must run on CPU so
numerics are exact f32 and an 8-device mesh (for sharding tests) exists
without hardware. Some pytest plugin imports jax before this file runs, but
JAX selects its platform lazily at first backend use — overriding the config
here is still effective as long as no backend has been initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
