"""Row-sliced CSR5 execution (ops/bigslice.py): the VMEM-cap lift.

Small matrices with an artificially tiny element cap force multi-slice
builds so the slicing/stitching logic is exercised end-to-end in
interpret mode against the scipy oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.ops.bigslice import (
    SlicedCSR5,
    _slice_bounds,
    build_csr5_sliced,
    should_slice,
    sliced_spmv,
)
from benchmark_spmv_using_csr5_tpu.utils import synth


def _spmv_check(a_sp, sl, alpha=1.0, atol=1e-4):
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=a_sp.shape[1]).astype(np.float32)
    y = np.asarray(sliced_spmv(sl, x, alpha=alpha, interpret=True))
    y_ref = alpha * (a_sp @ x)
    np.testing.assert_allclose(y, y_ref, atol=atol * max(1.0, np.abs(y_ref).max()))


def test_sliced_banded_matches_oracle():
    a = sp.csr_matrix(synth.banded(4000, 9, dtype=np.float32))
    sl = build_csr5_sliced(
        (a.indptr, a.indices, a.data, a.shape), elem_cap=3000
    )
    assert sl is not None and sl.num_slices >= 3
    assert sl.nnz == a.nnz
    _spmv_check(a, sl, alpha=1.0)
    _spmv_check(a, sl, alpha=0.5)


def test_sliced_single_slice_when_it_fits():
    a = sp.csr_matrix(synth.banded(1500, 5, dtype=np.float32))
    sl = build_csr5_sliced((a.indptr, a.indices, a.data, a.shape))
    assert sl is not None and sl.num_slices == 1
    _spmv_check(a, sl)


def test_sliced_with_empty_rows_and_ragged_tail():
    # rows 1000..1200 empty; boundary quanta see empty ranges
    a = sp.csr_matrix(synth.banded(2600, 7, dtype=np.float32)).tolil()
    a[1000:1200, :] = 0
    a = a.tocsr()
    a.eliminate_zeros()
    sl = build_csr5_sliced(
        (a.indptr, a.indices, a.data, a.shape), elem_cap=2000
    )
    assert sl is not None and sl.num_slices >= 2
    _spmv_check(a, sl)


def test_sliced_rejects_unsliceable():
    # every row touches both column extremes: no column window shrinks
    m = 256
    rows = np.repeat(np.arange(m), 2)
    cols = np.tile(np.array([0, 99_999]), m)
    a = sp.csr_matrix(
        (np.ones(2 * m, np.float32), (rows, cols)), shape=(m, 100_000)
    )
    sl = build_csr5_sliced(
        (a.indptr, a.indices, a.data, a.shape), elem_cap=50_000
    )
    assert sl is None


def test_slice_bounds_cover_all_rows():
    a = sp.csr_matrix(synth.scattered_band(3000, 4, 600, dtype=np.float32))
    bounds = _slice_bounds(
        a.indptr.astype(np.int64), a.indices, a.shape[0], 2500
    )
    assert bounds is not None
    assert bounds[0][0] == 0 and bounds[-1][1] == a.shape[0]
    for (r0, r1, c0, c1), (s0, _, _, _) in zip(bounds, bounds[1:]):
        assert r1 == s0  # contiguous, no gaps
    for r0, r1, c0, c1 in bounds:
        cs = a.indices[a.indptr[r0] : a.indptr[r1]]
        if cs.size:
            assert c0 <= cs.min() and cs.max() < c1
        assert (r1 - r0) + (c1 - c0) <= 2500 + 127  # page alignment slack


def test_should_slice_threshold():
    assert not should_slice(500_000, 500_000)
    assert should_slice(40_000_000, 40_000_000)


def test_sliced_spmm_matches_oracle():
    from benchmark_spmv_using_csr5_tpu.ops.bigslice import sliced_spmm

    a = sp.csr_matrix(synth.banded(3000, 9, dtype=np.float32))
    sl = build_csr5_sliced(
        (a.indptr, a.indices, a.data, a.shape), elem_cap=8000, num_rhs=4
    )
    assert sl is not None and sl.num_slices >= 2
    rng = np.random.default_rng(1)
    xm = rng.integers(1, 10, size=(a.shape[1], 4)).astype(np.float32)
    y = np.asarray(sliced_spmm(sl, xm, alpha=1.5, interpret=True))
    y_ref = 1.5 * (a @ xm)
    np.testing.assert_allclose(
        y, y_ref, atol=1e-4 * max(1.0, np.abs(y_ref).max())
    )
