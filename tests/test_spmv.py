"""SpMV correctness: oracles vs scipy, CSR5 XLA executor vs oracles.

Mirrors the reference's end-to-end check (serial CSR reference then 1%%
relative comparison, CSR5_cuda/main.cu:336-384) but at unit-test tolerance:
f64 results must match scipy to ~1e-10, and the reference tolerance tier
(1e-2 relative) is asserted for f32.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu import (
    CSR5Config,
    build_csr5,
    coo_spmv,
    csr5_spmv_xla,
    csr_from_scipy,
    csr_spmm,
    csr_spmv,
)
from benchmark_spmv_using_csr5_tpu.ops.reference import csr_spmv_scan
from benchmark_spmv_using_csr5_tpu.utils import synth


def check_rel(y, y_ref, tol):
    """The reference's per-element relative check (main.cu:361-384)."""
    y = np.asarray(y)
    y_ref = np.asarray(y_ref)
    denom = np.maximum(np.abs(y_ref), 1e-30)
    bad = np.abs(y - y_ref) > tol * denom
    # absolute slack for near-zero reference entries
    bad &= np.abs(y - y_ref) > tol * max(1.0, np.abs(y_ref).max()) * 1e-6
    assert not bad.any(), f"{bad.sum()} of {y.size} rows off; worst " f"{np.abs(y - y_ref).max()}"


def test_csr_oracle_vs_scipy(edge_matrix):
    name, a_sp = edge_matrix
    x = synth.dense_x(a_sp.shape[1])
    y_ref = a_sp @ x
    csr = csr_from_scipy(a_sp)
    check_rel(csr_spmv(csr, x), y_ref, 1e-12)
    check_rel(csr_spmv_scan(csr, x), y_ref, 1e-9)
    check_rel(coo_spmv(csr.to_coo(), x), y_ref, 1e-12)


def test_alpha_scaling():
    a_sp = synth.random_csr(100, 80, 0.1)
    x = synth.dense_x(80)
    csr = csr_from_scipy(a_sp)
    check_rel(csr_spmv(csr, x, alpha=2.5), 2.5 * (a_sp @ x), 1e-12)


def test_csr5_xla_executor(edge_matrix):
    name, a_sp = edge_matrix
    x = synth.dense_x(a_sp.shape[1])
    y_ref = a_sp @ x
    a5 = build_csr5(csr_from_scipy(a_sp))
    check_rel(csr5_spmv_xla(a5, x), y_ref, 1e-10)


@pytest.mark.parametrize("sigma", [8, 16, 24, 32])
def test_csr5_xla_sigmas(sigma):
    a_sp = synth.power_law(600, 500, 8.0, seed=9)
    x = synth.dense_x(500)
    a5 = build_csr5(csr_from_scipy(a_sp), CSR5Config(sigma=sigma))
    check_rel(csr5_spmv_xla(a5, x), a_sp @ x, 1e-10)


def test_csr5_xla_f32_reference_tolerance():
    a_sp = synth.banded(2000, 27).astype(np.float32)
    x = synth.dense_x(2000, dtype=np.float32)
    a5 = build_csr5(csr_from_scipy(a_sp))
    # the reference's 1%-relative acceptance (main.cu:361-384)
    check_rel(csr5_spmv_xla(a5, x), (a_sp @ x).astype(np.float32), 1e-2)


def test_csr5_empty_matrix():
    a_sp = sp.csr_matrix((16, 16), dtype=np.float64)
    a5 = build_csr5(csr_from_scipy(a_sp))
    y = csr5_spmv_xla(a5, np.ones(16))
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_csr5_single_element():
    a_sp = sp.csr_matrix(([3.0], ([2], [5])), shape=(8, 8))
    a5 = build_csr5(csr_from_scipy(a_sp))
    x = np.arange(8, dtype=np.float64)
    check_rel(csr5_spmv_xla(a5, x), a_sp @ x, 1e-12)


def test_csr5_exact_tile_multiple():
    # nnz an exact multiple of omega*sigma: tail is a full tile
    cfg = CSR5Config(sigma=8)
    n = cfg.tile_nnz * 3
    rows = np.repeat(np.arange(n // 4), 4)
    cols = np.tile(np.arange(4), n // 4)
    a_sp = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n // 4, 8))
    a_sp.sum_duplicates()
    x = synth.dense_x(8)
    a5 = build_csr5(csr_from_scipy(a_sp), cfg)
    check_rel(csr5_spmv_xla(a5, x), a_sp @ x, 1e-12)


def test_spmm_oracle():
    a_sp = synth.random_csr(120, 90, 0.08)
    X = np.stack([synth.dense_x(90, seed=i) for i in range(8)], axis=1)
    csr = csr_from_scipy(a_sp)
    check_rel(csr_spmm(csr, X), a_sp @ X, 1e-12)


def test_transpose_spmv():
    a_sp = synth.random_csr(64, 80, 0.1)
    x = synth.dense_x(64)
    csr = csr_from_scipy(a_sp)
    check_rel(csr_spmv(csr, x, transpose=True), a_sp.T @ x, 1e-12)
