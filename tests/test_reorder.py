"""Reordering (RCM bandwidth reduction) tests: correctness of the
permuted SpMV relation and actual page-locality improvement feeding the
CSR5 conversion."""

import numpy as np
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu import build_csr5
from benchmark_spmv_using_csr5_tpu.utils import reorder, synth


def _shuffled_banded(m=4000, bw=9, seed=5):
    """A banded matrix hidden behind a random symmetric permutation —
    the recoverable-locality case RCM exists for."""
    a = synth.banded(m, bw, dtype=np.float32)
    a = sp.csr_matrix((a + a.T) * 0.5)
    rng = np.random.default_rng(seed)
    shuf = rng.permutation(m)
    return a[shuf][:, shuf].tocsr()


def test_permuted_spmv_relation():
    a = _shuffled_banded()
    ap, perm = reorder.reorder_for_locality(a)
    x = synth.dense_x(a.shape[0], dtype=np.float32)
    y_direct = a @ x
    y_perm = ap @ x[perm]
    np.testing.assert_allclose(y_perm, y_direct[perm], rtol=1e-6)


def test_rcm_recovers_bandwidth():
    a = _shuffled_banded()
    ap, _ = reorder.reorder_for_locality(a)
    bw_before = reorder.bandwidth(a)
    bw_after = reorder.bandwidth(ap)
    assert bw_after < bw_before / 10  # shuffled band -> near-original band


def test_rcm_improves_page_plan():
    a = _shuffled_banded()
    a5_raw = build_csr5(a)
    ap, _ = reorder.reorder_for_locality(a)
    a5_rcm = build_csr5(ap)
    # scattered columns force a wide page plan; RCM restores a slab plan
    assert a5_rcm.pmax < a5_raw.pmax
    assert a5_rcm.pages_contig or a5_rcm.pmax <= 8
