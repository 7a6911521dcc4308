"""Double-single (df64) CSR5 SpMV vs the scipy f64 oracle.

The reference's default dtype is double (CSR5_cuda/Makefile:4); here the
TPU answer is the error-free-transformation kernel (ops/csr5_df64.py).
Values are random non-dyadic f64 so plain f32 arithmetic visibly loses
precision; the documented bound is O(row_nnz * 2^-44) relative.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.ops.csr5_df64 import (
    build_df64,
    df64_combine,
    df64_spmv,
    df64_supported,
    split_f64,
)
from benchmark_spmv_using_csr5_tpu.utils import synth


def _f64_values(a_sp, seed=0):
    rng = np.random.default_rng(seed)
    a = a_sp.astype(np.float64)
    # non-dyadic magnitudes spanning ~6 decades: f32 keeps ~7 digits,
    # df64 must keep ~13
    a.data = rng.uniform(0.1, 1.0, a.nnz) * 10.0 ** rng.integers(
        -3, 4, a.nnz
    )
    return a


def _tile_scale(a_sp, x, d):
    """Per-row structural denominator: the segmented prefix-diff method
    (ours AND the reference's) carries absolute error proportional to
    the enclosing TILE's |a||x| mass — a 1-nnz row colocated with large
    values in its tile legitimately sees that amplification. Returns
    max(row |A||x|, largest tile mass among the row's tiles)."""
    T = d.a5.sigma * 128
    prods = np.abs(a_sp.data) * np.abs(x)[a_sp.indices]
    nt = -(-len(prods) // T)
    pad = np.zeros(nt * T)
    pad[: len(prods)] = prods
    tile_mass = pad.reshape(nt, T).sum(axis=1)
    rp = a_sp.indptr
    t0 = np.minimum(rp[:-1] // T, nt - 1)
    t1 = np.minimum(np.maximum(rp[1:] - 1, rp[:-1]) // T, nt - 1)
    row_tile = np.maximum(tile_mass[t0], tile_mass[t1])
    row = np.abs(a_sp).dot(np.abs(x))
    return np.maximum(np.maximum(row, row_tile), 1e-300)


def _check(a_sp, alpha=1.0, bound=1e-9):
    """Structural bound ~tile_nnz * 2^-44 (~1.4e-10 at sigma=24) with
    margin; typical rows must sit at the plain ds bound (median check).
    The comparative guarantee (df64 >= 3 digits beyond f32) is
    test_df64_banded_beats_f32."""
    d = build_df64((a_sp.indptr, a_sp.indices, a_sp.data, a_sp.shape))
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0, a_sp.shape[1])
    yh, yl = df64_spmv(d, x, alpha=alpha, interpret=True)
    y = df64_combine(yh, yl)
    y_ref = alpha * (a_sp @ x)
    scale = np.maximum(np.abs(a_sp).dot(np.abs(x)) * abs(alpha), 1e-300)
    rel = np.abs(y - y_ref) / scale
    rel_struct = np.abs(y - y_ref) / (_tile_scale(a_sp, x, d) * abs(alpha))
    assert rel_struct.max() < bound, rel_struct.max()
    assert np.median(rel) < 1e-12  # typical rows sit at the ds bound
    return y, y_ref, scale


def test_df64_banded_beats_f32():
    a = _f64_values(sp.csr_matrix(synth.banded(3000, 9)))
    y, y_ref, scale = _check(a)
    # the f32 kernel on the same data is ~6 decimal digits; df64 ~13
    from benchmark_spmv_using_csr5_tpu import build_csr5, csr5_spmv

    a32 = a.astype(np.float32)
    a5 = build_csr5((a32.indptr, a32.indices, a32.data, a32.shape))
    x = np.random.default_rng(1).uniform(-1.0, 1.0, a.shape[1])
    y32 = np.asarray(
        csr5_spmv(a5, x.astype(np.float32), backend="xla")
    ).astype(np.float64)
    rel32 = (np.abs(y32 - y_ref) / scale).max()
    rel64 = (np.abs(y - y_ref) / scale).max()
    assert rel64 < rel32 * 1e-3  # at least 3 decimal digits better
    assert rel32 > 1e-9  # the data genuinely stresses f32


def test_df64_alpha():
    a = _f64_values(sp.csr_matrix(synth.banded(1200, 5)), seed=3)
    _check(a, alpha=2.5)


def test_df64_empty_rows_powerlaw():
    a = _f64_values(synth.power_law(900, 900, 6.0), seed=5)
    _check(a)


def test_df64_scattered_tier1():
    a = _f64_values(synth.scattered_band(1500, 8, 700), seed=7)
    _check(a)


def test_df64_split_accuracy():
    """hi + lo carries ~49 bits of v (24 + 24 + the implicit sign gap);
    the representation bound is ~2^-48 relative, not exact f64."""
    rng = np.random.default_rng(0)
    v = rng.standard_normal(1000) * 10.0 ** rng.integers(-30, 30, 1000)
    hi, lo = split_f64(v)
    rel = np.abs((hi.astype(np.float64) + lo.astype(np.float64)) - v) / np.abs(v)
    assert rel.max() <= 2.0**-45
    # and lo really is the f32 rounding of the residual
    assert np.abs(lo).max() <= np.abs(v).max() * 2.0**-23


def test_df64_supported_gate():
    a = _f64_values(sp.csr_matrix(synth.banded(500, 5)))
    d = build_df64((a.indptr, a.indices, a.data, a.shape))
    assert df64_supported(d)


def test_df64_error_model_decade_spread():
    # the measured error model (module docstring, round 4):
    # rel_err(row) ~ K * 2^-48 * |tile running prefix| / |row sum|,
    # K <= ~2^8. Pin worst/median on a 7-decade mixed-sign matrix.
    rng = np.random.default_rng(0)
    m = 2000
    a = sp.csr_matrix(synth.banded(m, 27, dtype=np.float64))
    a.data = (
        rng.uniform(0.1, 1.0, a.nnz)
        * 10.0 ** rng.integers(-3, 4, a.nnz)
        * np.where(rng.uniform(size=a.nnz) < 0.5, -1.0, 1.0)
    )
    x = rng.uniform(0.1, 1.0, m) * 10.0 ** rng.integers(-3, 4, m)
    d = build_df64((a.indptr, a.indices, a.data, a.shape))
    y = df64_combine(*df64_spmv(d, x, interpret=True))
    y_ref = a @ x
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-300)
    # amplification per row: tile running-prefix scale / |row sum|
    T = d.a5.config.tile_nnz
    prod = a.data * x[a.indices]
    rows = np.repeat(np.arange(m), np.diff(a.indptr))
    amp = np.zeros(m)
    for t in range(-(-a.nnz // T)):
        seg = prod[t * T : (t + 1) * T]
        pref = np.abs(np.cumsum(seg))
        r = rows[t * T : (t + 1) * T]
        uniq = np.unique(r)
        scale = np.maximum.reduceat(pref, np.searchsorted(r, uniq))
        np.maximum.at(amp, uniq, scale)
    pred = amp / np.maximum(np.abs(y_ref), 1e-300) * 2.0**-48
    mask = rel > 0
    assert (rel[mask] <= np.maximum(pred[mask], 2.0**-48) * 2**9).all()
    assert np.median(rel) < 1e-12
