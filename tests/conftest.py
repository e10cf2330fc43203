"""Test conftest: run everything on the CPU backend with 8 virtual
devices so distributed (shard_map / Mesh) tests work without a TPU
slice (SURVEY.md §4 "Distributed" row).

Note: this machine's sitecustomize registers the remote-tunneled axon
TPU backend in every interpreter and forces ``jax_platforms=axon,cpu``,
so plain env vars are not enough — the config must be updated after
import, before any computation.
"""

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pytest")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: recompiles across pytest runs dominate
# wall time on this 1-core host; cache hits make reruns fast.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
