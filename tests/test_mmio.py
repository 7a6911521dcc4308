"""Matrix Market I/O tests: banner/field/symmetry handling per the
reference loader semantics (CSR5_cuda/main.cu:157-312)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.io as sio

from benchmark_spmv_using_csr5_tpu.utils import mmio, synth


def write_and_read(tmp_path, a_sp, name="t.mtx", **save_kw):
    path = tmp_path / name
    sio.mmwrite(str(path).removesuffix(".mtx"), a_sp, **save_kw)
    return mmio.read_mtx_csr(str(path))


def test_general_real(tmp_path):
    a_sp = synth.random_csr(50, 40, 0.1).tocoo()
    rp, ci, v, shape = write_and_read(tmp_path, a_sp)
    got = sp.csr_matrix((v, ci, rp), shape=shape)
    assert (got != a_sp.tocsr()).nnz == 0


def test_symmetric_expansion(tmp_path):
    d = np.array([[4.0, 1.0, 0.0], [1.0, 5.0, 2.0], [0.0, 2.0, 6.0]])
    a_sp = sp.coo_matrix(d)
    rp, ci, v, shape = write_and_read(tmp_path, a_sp, symmetry="symmetric")
    got = sp.csr_matrix((v, ci, rp), shape=shape).toarray()
    np.testing.assert_allclose(got, d)


def test_pattern(tmp_path):
    a_sp = sp.coo_matrix((np.ones(3), ([0, 1, 2], [2, 0, 1])), shape=(3, 3))
    path = tmp_path / "p.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("3 3 3\n1 3\n2 1\n3 2\n")
    rp, ci, v, shape = mmio.read_mtx_csr(str(path))
    got = sp.csr_matrix((v, ci, rp), shape=shape).toarray()
    np.testing.assert_allclose(got, a_sp.toarray())


def test_integer_field(tmp_path):
    path = tmp_path / "i.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write("% comment line\n")
        f.write("2 2 2\n1 1 7\n2 2 -3\n")
    rp, ci, v, shape = mmio.read_mtx_csr(str(path))
    np.testing.assert_allclose(v, [7.0, -3.0])


def test_complex_rejected(tmp_path):
    path = tmp_path / "c.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1.0 2.0\n")
    with pytest.raises(mmio.MatrixMarketError):
        mmio.read_mtx_csr(str(path))


def test_array_rejected(tmp_path):
    path = tmp_path / "a.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")
    with pytest.raises(mmio.MatrixMarketError):
        mmio.read_mtx_csr(str(path))


def test_skew_symmetric(tmp_path):
    path = tmp_path / "s.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric general\n")
    # malformed on purpose? no: proper skew file
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("3 3 2\n2 1 5.0\n3 2 -1.0\n")
    rp, ci, v, shape = mmio.read_mtx_csr(str(path))
    got = sp.csr_matrix((v, ci, rp), shape=shape).toarray()
    expect = np.array([[0, -5, 0], [5, 0, 1], [0, -1, 0]], dtype=float)
    np.testing.assert_allclose(got, expect)


def test_write_read_roundtrip(tmp_path):
    a_sp = synth.random_csr(30, 30, 0.1)
    path = tmp_path / "w.mtx"
    mmio.write_mtx(str(path), a_sp.indptr, a_sp.indices, a_sp.data, a_sp.shape)
    rp, ci, v, shape = mmio.read_mtx_csr(str(path))
    got = sp.csr_matrix((v, ci, rp), shape=shape)
    assert (got != a_sp).nnz == 0


def test_duplicates_kept(tmp_path):
    path = tmp_path / "d.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("2 2 3\n1 1 1.0\n1 1 2.0\n2 2 3.0\n")
    rp, ci, v, shape = mmio.read_mtx_csr(str(path))
    # parity: duplicates preserved, not summed (main.cu keeps insertion)
    assert len(v) == 3


def test_handle_lifecycle():
    from benchmark_spmv_using_csr5_tpu import AUTO_TUNED_SIGMA, Format, SpMVHandle

    a_sp = synth.random_csr(100, 100, 0.05)
    x = synth.dense_x(100)
    h = SpMVHandle(*a_sp.shape)
    h.inputCSR(a_sp.nnz, a_sp.indptr, a_sp.indices, a_sp.data)
    h.setSigma(AUTO_TUNED_SIGMA)
    h.setX(x)
    assert h.format == Format.CSR
    y_csr = np.asarray(h.spmv(1.0))
    h.asCSR5()
    assert h.format == Format.CSR5
    h.warmup()
    y5 = np.asarray(h.spmv(1.0))
    np.testing.assert_allclose(y5, a_sp @ x, rtol=1e-10)
    np.testing.assert_allclose(y_csr, a_sp @ x, rtol=1e-10)
    xm = np.stack([x, 2 * x], axis=1)
    ym = np.asarray(h.spmm(xm, alpha=0.5))
    np.testing.assert_allclose(ym, 0.5 * (a_sp @ xm), rtol=1e-10)
    h.asCSR()
    assert h.format == Format.CSR
    assert h.destroy() == 0
