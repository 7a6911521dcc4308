"""fem_blocks generator (SuiteSparse cant/consph class, BASELINE
configs[1]): structure invariants + SpMV oracle parity."""

import numpy as np
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu import build_csr5, csr_from_scipy
from benchmark_spmv_using_csr5_tpu.ops.csr5_spmv import csr5_spmv_xla
from benchmark_spmv_using_csr5_tpu.utils import synth


def test_fem_blocks_structure():
    a = synth.fem_blocks(6000, block=3, neighbors=9, node_bandwidth=300)
    assert a.shape == (6000, 6000)
    rp = a.indptr
    lens = np.diff(rp)
    # interior rows: exactly neighbors * block nnz in runs of `block`
    interior = lens == 9 * 3
    assert interior.mean() > 0.8
    # uniform dense row blocks: the 3 rows of a node share one column set
    i = 600  # interior node
    c0 = a.indices[rp[3 * i] : rp[3 * i + 1]]
    c1 = a.indices[rp[3 * i + 1] : rp[3 * i + 2]]
    c2 = a.indices[rp[3 * i + 2] : rp[3 * i + 3]]
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(c1, c2)
    # columns come in runs of `block` consecutive (dense sub-blocks)
    runs = c0.reshape(-1, 3)
    np.testing.assert_array_equal(runs[:, 1], runs[:, 0] + 1)
    np.testing.assert_array_equal(runs[:, 2], runs[:, 0] + 2)
    # sorted, in-range, boundary rows clipped not wrapped
    assert (np.diff(c0) > 0).all()
    assert a.indices.min() >= 0 and a.indices.max() < 6000
    assert (np.sort(a.indices[rp[0] : rp[1]]) >= 0).all()


def test_fem_blocks_spmv_oracle():
    a = synth.fem_blocks(3000, block=3, neighbors=7, node_bandwidth=240)
    a_sp = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    x = np.random.default_rng(0).integers(1, 10, 3000).astype(np.float32)
    a5 = build_csr5(csr_from_scipy(a_sp))
    y = np.asarray(csr5_spmv_xla(a5, x))
    np.testing.assert_allclose(y, a_sp @ x, rtol=1e-6)


def test_fem_blocks_deterministic():
    a = synth.fem_blocks(900, neighbors=5, node_bandwidth=120, seed=3)
    b = synth.fem_blocks(900, neighbors=5, node_bandwidth=120, seed=3)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.data, b.data)
