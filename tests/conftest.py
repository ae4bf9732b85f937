"""Test configuration: force JAX onto CPU with 8 virtual devices so every
multi-chip code path (mesh, sharding, collectives) is exercised without TPU
hardware — the standard JAX answer to testing multi-device code in CI.
"""

import os

# Must be set before jax is imported anywhere. Hard override: the session env
# presets JAX_PLATFORMS=axon (the TPU tunnel), but tests run on a virtual
# 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image registers itself regardless of the env
# var; the config knob reliably pins the platform to CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU; repeat runs
# skip most of the ~35 min of jit compiles.
from multi_task_breast_cancer_tpu.utils.miscellany import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1993)
