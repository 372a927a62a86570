# Convenience targets. Tests pin themselves to a virtual 8-device CPU mesh
# (root conftest.py); bench runs on the local accelerator.

.PHONY: test test-fast bench native lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_training.py

bench:
	python bench.py

native:
	python -c "from fastdiff_tpu.data.native_io import build_library; print(build_library(force=True))"

graft-check:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py
