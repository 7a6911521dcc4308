"""Format auto-selection tests (ops/select.py): one structural pass
picks DIA / HYB5 / CSR5 by the measured TPU crossovers."""

import numpy as np
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu import select_format, analyze_diagonals
from benchmark_spmv_using_csr5_tpu.utils import synth


def _host(a_sp):
    a = sp.csr_matrix(a_sp)
    return a.indptr, a.indices, a.shape


def test_banded_selects_dia():
    rp, ci, shape = _host(synth.banded(5000, 27, dtype=np.float32))
    assert select_format(rp, ci, shape) == "dia"


def test_tridiag_selects_dia():
    rp, ci, shape = _host(synth.banded(1000, 3, dtype=np.float32))
    assert select_format(rp, ci, shape) == "dia"


def test_powerlaw_selects_csr5():
    rp, ci, shape = _host(synth.power_law(3000, 3000, 6.0, dtype=np.float32))
    assert select_format(rp, ci, shape) == "csr5"


def test_scattered_band_selects_csr5():
    rp, ci, shape = _host(
        synth.scattered_band(4000, 10, 1500, dtype=np.float32)
    )
    assert select_format(rp, ci, shape) == "csr5"


def test_mixed_selects_hyb():
    # dense tridiagonal core + scattered noise: the HYB5 shape
    m = 4000
    band = sp.csr_matrix(synth.banded(m, 3, dtype=np.float32))
    rng = np.random.default_rng(0)
    noise = sp.random(
        m, m, density=0.001, format="csr", random_state=rng, dtype=np.float32
    )
    a = (band + noise).tocsr()
    rp, ci, shape = a.indptr, a.indices, a.shape
    st = analyze_diagonals(rp, ci, shape)
    assert not st.dia_ok  # noise spreads over too many diagonals
    assert st.dense_share > 0.5
    assert select_format(rp, ci, shape) == "hyb"


def test_stats_shape():
    a = sp.csr_matrix(synth.banded(1000, 5, dtype=np.float32))
    st = analyze_diagonals(a.indptr, a.indices, a.shape)
    assert st.ndiag == len(a.todia().offsets)
    assert st.dia_ok and st.nnz == a.nnz


def test_empty_matrix():
    rp = np.zeros(11, np.int64)
    ci = np.zeros(0, np.int64)
    assert select_format(rp, ci, (10, 10)) == "csr5"
