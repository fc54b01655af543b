"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests
run on a simulated mesh, per SURVEY.md §4.4).

NOTE: this environment pre-imports jax in sitecustomize with
JAX_PLATFORMS=axon (a tunnelled TPU backend), so setting env vars here is
too late — the config must be updated through jax.config before the first
backend use. pytest.ini additionally blocks the jaxtyping auto-plugin.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-bound on CPU; cached
# executables make re-runs fast. The directory is keyed by host CPU
# fingerprint — XLA:CPU AOT results from a different machine can abort on
# load (see infinite_texture_gans_tpu.host_cache_fingerprint).
from infinite_texture_gans_tpu import host_cache_fingerprint

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_test_cache_" + host_cache_fingerprint()
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
