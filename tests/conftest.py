"""Test conftest: run everything on the CPU backend with 8 virtual
devices so distributed (shard_map / Mesh) tests work without a TPU
slice (SURVEY.md §4 "Distributed" row). Must set env before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Oracle comparisons need exact f32 matmuls; production keeps the fast
# (bf16-pass) default, which is the right choice on the MXU.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: recompiles across pytest runs dominate
# wall time on this 1-core host; cache hits make reruns fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_pytest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
