"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env before jax initializes — multi-chip sharding tests rely on
``--xla_force_host_platform_device_count=8`` (the TPU-less way to validate
mesh partitioning, per SURVEY.md §4).
"""

import os

# The machine profile pins JAX_PLATFORMS=axon (the remote-TPU tunnel); tests
# must run locally on CPU. The env var alone can be overridden by the site
# hook, so also force it through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-bound on one CPU core, so
# repeat runs (the common case for a CI-ish judge loop) drop from minutes
# to seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_lpt_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def np_rng():
    return np.random.default_rng(1234)
