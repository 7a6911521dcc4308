"""On-chip smoke sweep over odd static shapes (round 5).

Mosaic LOWERING failures are invisible to the interpret-mode test suite
(example.mtx crashed the Pallas path for a whole round at B=1 before the
B>=8 pass-2 gate). This sweep compiles + checks every kernel family on
the real chip across the small/odd static configurations the bench never
hits: tiny tile counts (B in 1/2/4/8), every sigma, all gather tiers,
aligned window mode, SpMM, df64, DIA/HYB, and a forced multi-slice
bigslice build. Each case reports PASS/FAIL(+error); exit 1 on any FAIL.
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import (
    csr5_spmm_pallas,
    csr5_spmv_pallas,
    pallas_spmm_supported,
    pallas_supported,
)
from benchmark_spmv_using_csr5_tpu.utils import synth

FAILED = []


def _check(name, fn):
    try:
        rel = fn()
    except Exception as e:  # noqa: BLE001 — report and continue
        FAILED.append(name)
        print(f"[{name}] FAIL: {type(e).__name__}: {str(e)[:160]}",
              file=sys.stderr, flush=True)
        return
    ok = rel <= 0.01
    if not ok:
        FAILED.append(name)
    print(f"[{name}] {'PASS' if ok else 'FAIL'} rel={rel:.1e}",
          file=sys.stderr, flush=True)


def _rel(y, y_ref):
    y = np.asarray(y, np.float64)
    y_ref = np.asarray(y_ref, np.float64)
    den = np.maximum(np.abs(y_ref), 1e-30)
    r = np.abs(y - y_ref) / den
    r[np.abs(y - y_ref) < 1e-6 * max(1.0, np.abs(y_ref).max())] = 0.0
    return float(r.max()) if r.size else 0.0


def spmv_case(name, a_sp, cfg=None, win_mode="auto", rhs=1):
    a_sp = sp.csr_matrix(a_sp).astype(np.float32)
    rng = np.random.default_rng(0)

    def run():
        a5 = build_csr5(
            (a_sp.indptr, a_sp.indices, a_sp.data, a_sp.shape),
            cfg, win_mode=win_mode,
        )
        if rhs > 1:
            if not pallas_spmm_supported(a5, rhs):
                print(f"[{name}] gated off (expected for this shape)",
                      file=sys.stderr, flush=True)
                return 0.0
            x = rng.integers(1, 10, (a_sp.shape[1], rhs)).astype(np.float32)
            y = csr5_spmm_pallas(a5, jnp.asarray(x))
            return _rel(y, a_sp @ x)
        if not pallas_supported(a5):
            print(f"[{name}] gated off (expected for this shape)",
                  file=sys.stderr, flush=True)
            return 0.0
        x = rng.integers(1, 10, a_sp.shape[1]).astype(np.float32)
        y = csr5_spmv_pallas(a5, jnp.asarray(x))
        return _rel(y, a_sp @ x)

    _check(name, run)


def main():
    # tiny tile counts: B = 1 / 2 / 4 / 8 across sigmas (the pass-2
    # batching boundary) and both window modes
    for m, tag in ((40, "B1"), (700, "B4"), (1500, "B8")):
        for sig in (8, 16, 24, 32):
            spmv_case(f"banded{tag}_s{sig}", synth.banded(m, 9),
                      CSR5Config(sigma=sig))
    spmv_case("alignedB4_s16", synth.banded(700, 9),
              CSR5Config(sigma=16), win_mode="aligned")
    spmv_case("alignedB64_s24", synth.banded(60_000, 27),
              CSR5Config(sigma=24), win_mode="aligned")
    # gather tiers at small scale
    spmv_case("tier1_small_s16", synth.scattered_band(2000, 12, 1800),
              CSR5Config(sigma=16))
    spmv_case("tier2_small_s8", synth.power_law(3000, 3000, 8.0),
              CSR5Config(sigma=8))
    spmv_case("fasttrack_small", synth.single_dense_row(64, 8192))
    spmv_case("fem_small", synth.fem_blocks(6000, neighbors=9,
                                            node_bandwidth=600))
    # SpMM at small B and odd R
    for rhs in (2, 5, 8):
        spmv_case(f"spmmB4_r{rhs}", synth.banded(700, 9),
                  CSR5Config(sigma=16), rhs=rhs)
    spmv_case("spmm_aligned_r4", synth.banded(1500, 9),
              CSR5Config(sigma=16), win_mode="aligned", rhs=4)

    # df64 tiny + small (B below/at the batched gate)
    from benchmark_spmv_using_csr5_tpu.ops.csr5_df64 import (
        build_df64, df64_combine, df64_spmv, df64_supported, split_f64,
    )

    for m, tag in ((40, "B1"), (1500, "B8"), (20000, "B64")):
        def run_df64(m=m):
            a = sp.csr_matrix(synth.banded(m, 9, dtype=np.float64))
            rng = np.random.default_rng(1)
            a.data = rng.uniform(0.1, 1.0, a.nnz) * 10.0 ** rng.integers(
                -1, 2, a.nnz
            )
            d = build_df64((a.indptr, a.indices, a.data, a.shape))
            assert df64_supported(d)
            x = rng.uniform(-1, 1, a.shape[1])
            xh, xl = split_f64(x)
            y = df64_combine(
                *[np.asarray(v) for v in
                  df64_spmv(d, (jnp.asarray(xh), jnp.asarray(xl)))]
            )
            return _rel(y, a @ x)

        _check(f"df64_{tag}", run_df64)

    # DIA / HYB tiny
    from benchmark_spmv_using_csr5_tpu.ops.dia import build_dia, dia_spmv
    from benchmark_spmv_using_csr5_tpu.ops.hyb import build_hyb, hyb_spmv

    def run_dia():
        a = sp.csr_matrix(synth.banded(3000, 3, dtype=np.float32))
        d = build_dia((a.indptr, a.indices, a.data, a.shape))
        x = np.random.default_rng(0).integers(1, 10, 3000).astype(np.float32)
        return _rel(dia_spmv(d, jnp.asarray(x)), a @ x)

    _check("dia_tiny", run_dia)

    def run_hyb():
        band = sp.csr_matrix(synth.banded(4000, 9, dtype=np.float32))
        rng = np.random.default_rng(3)
        noise = sp.csr_matrix(
            (np.ones(8000, np.float32),
             (rng.integers(0, 4000, 8000), rng.integers(0, 4000, 8000))),
            shape=(4000, 4000),
        )
        a = (band + noise).tocsr()
        h = build_hyb((a.indptr, a.indices, a.data, a.shape))
        x = rng.integers(1, 10, 4000).astype(np.float32)
        return _rel(hyb_spmv(h, jnp.asarray(x)), a @ x)

    _check("hyb_tiny", run_hyb)

    # forced multi-slice bigslice on the real chip (tiny elem cap)
    from benchmark_spmv_using_csr5_tpu.ops.bigslice import (
        build_csr5_sliced, sliced_spmv,
    )

    def run_sliced():
        a = sp.csr_matrix(synth.banded(40_000, 9, dtype=np.float32))
        sl = build_csr5_sliced(
            (a.indptr, a.indices, a.data, a.shape),
            CSR5Config(sigma=16), elem_cap=40_000,
        )
        assert sl is not None and sl.num_slices >= 2, sl
        x = np.random.default_rng(0).integers(1, 10, 40_000).astype(
            np.float32
        )
        return _rel(sliced_spmv(sl, jnp.asarray(x)), a @ x)

    _check("bigslice_multi", run_sliced)

    print(
        f"smoke: {'ALL PASS' if not FAILED else 'FAILURES: ' + ','.join(FAILED)}",
        file=sys.stderr, flush=True,
    )
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
