"""Native runtime library tests: the C++ loader/golden-model must match
the pure-Python implementations (which mirror CSR5_cuda/main.cu:157-355).
"""

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.utils import mmio, nativelib, synth

pytestmark = pytest.mark.skipif(
    not nativelib.available(), reason="native toolchain unavailable"
)


def _assert_same_load(path):
    rp_n, ci_n, v_n, shape_n = nativelib.load_matrix_market(str(path))
    rp_p, ci_p, v_p, shape_p = mmio.read_mtx_csr(str(path))
    assert shape_n == tuple(shape_p)
    np.testing.assert_array_equal(rp_n, np.asarray(rp_p, np.int64))
    np.testing.assert_array_equal(ci_n, np.asarray(ci_p, np.int32))
    np.testing.assert_allclose(v_n, np.asarray(v_p, np.float64), rtol=1e-15)


def test_native_loader_general(tmp_path):
    a_sp = synth.random_csr(60, 45, 0.08, seed=3).tocoo()
    sio.mmwrite(str(tmp_path / "g"), a_sp)
    _assert_same_load(tmp_path / "g.mtx")


def test_native_loader_symmetric(tmp_path):
    d = synth.random_csr(40, 40, 0.1, seed=4)
    a_sp = (d + d.T).tocoo()
    sio.mmwrite(str(tmp_path / "s"), a_sp, symmetry="symmetric")
    _assert_same_load(tmp_path / "s.mtx")


def test_native_loader_pattern(tmp_path):
    path = tmp_path / "p.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "% comment\n3 4 3\n1 3\n2 1\n3 2\n"
    )
    _assert_same_load(path)


def test_native_loader_integer_skew(tmp_path):
    path = tmp_path / "k.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate integer skew-symmetric\n"
        "3 3 2\n2 1 5\n3 2 -7\n"
    )
    rp, ci, v, shape = nativelib.load_matrix_market(str(path))
    got = sp.csr_matrix((v, ci, rp), shape=shape).toarray()
    exp = np.array([[0, -5, 0], [5, 0, 7], [0, -7, 0]], dtype=float)
    np.testing.assert_allclose(got, exp)


def test_native_loader_errors(tmp_path):
    bad = tmp_path / "bad.mtx"
    bad.write_text("%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1 1\n")
    with pytest.raises(ValueError, match="complex"):
        nativelib.load_matrix_market(str(bad))
    with pytest.raises(ValueError, match="cannot open"):
        nativelib.load_matrix_market(str(tmp_path / "missing.mtx"))


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_native_golden_spmv(dtype):
    a_sp = synth.random_csr(300, 250, 0.03, seed=5).astype(dtype)
    x = synth.dense_x(250, dtype=dtype)
    y = nativelib.csr_spmv_serial(
        a_sp.indptr.astype(np.int64), a_sp.indices, a_sp.data, x, alpha=1.5
    )
    rtol = 1e-12 if dtype == np.float64 else 1e-5
    np.testing.assert_allclose(y, 1.5 * (a_sp @ x), rtol=rtol)


def test_native_tile_ptr_matches_python():
    from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5

    a_sp = synth.power_law(800, 700, 7.0, seed=9).astype(np.float32)
    a5 = build_csr5(a_sp)
    T = a5.config.tile_nnz
    p = a5.num_tiles
    tp = nativelib.tile_partition_pointer(a_sp.indptr.astype(np.int64), p, T)
    assert tp is not None
    np.testing.assert_array_equal(tp, np.asarray(a5.tile_ptr))


def test_native_tile_transpose_matches_numpy():
    rng = np.random.default_rng(3)
    for p, sig, om, dt in [
        (7, 24, 128, np.int32),
        (3, 16, 128, np.float32),
        (5, 8, 128, np.float64),
        (4, 32, 128, np.uint16),
    ]:
        flat = rng.integers(0, 1000, p * om * sig).astype(dt)
        out = nativelib.tile_transpose(flat, p, sig, om)
        assert out is not None
        np.testing.assert_array_equal(out, flat.reshape(p, om, sig).swapaxes(1, 2))


def test_native_pack_col16_matches_numpy():
    rng = np.random.default_rng(4)
    p, sig, om = 6, 16, 128
    c16 = rng.integers(0, 65536, p * om * sig).astype(np.uint16)
    out = nativelib.pack_col16(c16, p, sig, om)
    assert out is not None
    c32 = c16.reshape(p, om, sig).astype(np.int64)
    s2 = sig // 2
    ref = (
        (c32[:, :, :s2] | (c32[:, :, s2:] << 16))
        .astype(np.uint32)
        .view(np.int32)
        .swapaxes(1, 2)
    )
    np.testing.assert_array_equal(out, ref)


def test_native_descriptor_matches_host():
    import scipy.sparse as sp

    from benchmark_spmv_using_csr5_tpu.ops import convert as C

    for name, a, sigma in [
        ("banded", synth.banded(900, 9), 24),
        ("powerlaw_empty", synth.power_law(700, 600, 8.0, seed=11), 16),
        ("long_row", sp.csr_matrix(
            (np.ones(20000, np.float32),
             (np.zeros(20000, np.int64), np.arange(20000))),
            shape=(50, 20000)), 16),
        ("two_words", synth.power_law(500, 400, 6.0, seed=7), 36),
    ]:
        a = sp.csr_matrix(a).astype(np.float32)
        m = a.shape[0]
        row_ptr = np.asarray(a.indptr, np.int64)
        omega, tpb = 128, 8
        T = sigma * omega
        p_pad = -(-max(1, -(-a.nnz // T)) // tpb) * tpb
        heads = np.zeros(p_pad * T, dtype=bool)
        heads[row_ptr[:-1][np.diff(row_ptr) > 0]] = True
        heads[np.arange(p_pad) * T] = True
        bf_h, yo_h, so_h, ns_h = C._descriptor(heads, p_pad, sigma, omega)
        nd = nativelib.descriptor(row_ptr, p_pad, sigma, omega)
        assert nd is not None
        for got, want, fname in zip(
            nd, (bf_h, yo_h, so_h, ns_h),
            ("bit_flag", "y_offset", "seg_offset", "nseg"),
        ):
            np.testing.assert_array_equal(got, want, err_msg=f"{name}:{fname}")

        bounds = np.arange(p_pad + 1, dtype=np.int64) * T
        tile_ptr = np.clip(
            np.searchsorted(row_ptr, bounds, side="right") - 1, 0, m
        )
        empty = (np.diff(row_ptr) == 0).astype(np.int64)
        e_prefix = np.zeros(m + 1, np.int64)
        np.cumsum(empty, out=e_prefix[1:])
        start = tile_ptr[:-1]
        stop = np.minimum(tile_ptr[1:], m - 1)
        dirty = (e_prefix[stop + 1] - e_prefix[np.minimum(start + 1, m)]) > 0
        eop_h, eo_h = C._empty_offsets(
            row_ptr, heads, dirty, tile_ptr[:-1], ns_h, p_pad, T
        )
        eop, eo = nativelib.empty_offsets(
            row_ptr, tile_ptr[:-1], dirty, nd[3], p_pad, T
        )
        np.testing.assert_array_equal(eop, eop_h, err_msg=name)
        np.testing.assert_array_equal(eo, eo_h, err_msg=name)
