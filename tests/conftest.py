"""Test configuration: CPU backend with an 8-device virtual mesh + x64.

Tests run on the CPU backend (the real TPU is reserved for benchmarks);
multi-chip sharding is exercised on a virtual 8-device host mesh, and f64
oracles need x64 enabled before JAX initialises.
"""

import os

# This image's sitecustomize force-registers the axon TPU platform before
# pytest starts, so env-var pinning alone is ignored; jax.config wins.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from benchmark_spmv_using_csr5_tpu.utils import synth  # noqa: E402


@pytest.fixture(params=list(synth.EDGE_CASE_MATRICES.keys()))
def edge_matrix(request):
    """One scipy CSR matrix per registered edge case."""
    return request.param, synth.EDGE_CASE_MATRICES[request.param]()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
