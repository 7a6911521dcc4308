"""Round-5 df64 perf decomposition (VERDICT r04 #4), one TPU process.

1. Full df64 kernel baseline (banded500k, non-dyadic decade-spread
   values), min-of-3 device loops.
2. VPU-op ablation via monkeypatched double-single primitives — the
   memory traffic and kernel structure stay identical, only the ds
   arithmetic collapses, so the deltas attribute time to mul / add /
   window phases (numerics are wrong in the ablated variants; only the
   times are read):
     - cheap-mul: _ds_mul_pair -> (vh*xh, 0)         [~12 ops -> 1]
     - cheap-add: _ds_add -> (ah+bh, al+bl)          [~11 ops -> 2]
     - both
3. Stream floor reference: the f32 kernel on the hi plane (same
   structure, 8 B/elem vs df64's 12 B/elem + doubled x/y).
4. Accuracy escape check (the "direct per-row masked-sum" 2^-53
   candidate): HOST numpy double-single per-row sequential sums in
   element order — the best-ordered ds summation possible. If even that
   cannot beat ~2^-48, the escape is closed: the bound is the ds
   REPRESENTATION (hi+lo of a sum carries ~48-49 bits), not the kernel's
   summation order.
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops import csr5_df64 as D
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def _matrix(m=500_000, bw=27, seed=0):
    a = sp.csr_matrix(synth.banded(m, bw, dtype=np.float64))
    rng = np.random.default_rng(seed)
    a.data = rng.uniform(0.1, 1.0, a.nnz) * 10.0 ** rng.integers(-1, 2, a.nnz)
    return a


def _time_df64(d, xh_d, xl_d, runs=100):
    fn = lambda ops, xx: D.df64_spmv(ops[0], (xx, ops[1]))[0]  # noqa: E731
    return time_spmv_device_loop(fn, xh_d, runs, operands=(d, xl_d))


def main():
    a = _matrix()
    m, n = a.shape
    nnz = a.nnz
    x64 = np.random.default_rng(1).uniform(-1.0, 1.0, n)
    y_ref = a @ x64
    xh, xl = D.split_f64(x64)
    xh_d, xl_d = jnp.asarray(xh), jnp.asarray(xl)

    d = D.build_df64((a.indptr, a.indices, a.data, a.shape))
    assert D.df64_supported(d)

    def acc(dd):
        y = D.df64_combine(
            *[np.asarray(v) for v in D.df64_spmv(dd, (xh_d, xl_d))]
        )
        return float(
            (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
        )

    rel0 = acc(d)
    ms0 = _time_df64(d, xh_d, xl_d)
    met = perf.spmv_metrics(m, nnz, ms0, 8, n=n)
    print(
        f"[full]      {ms0:.4f} ms  {met.pct_of_roofline:.1f}% of f64 "
        f"model  maxrel={rel0:.1e}",
        file=sys.stderr, flush=True,
    )

    # --- ablations (times only; numerics intentionally wrong) ----------
    real_mul, real_add = D._ds_mul_pair, D._ds_add

    def cheap_mul(vh, vl, xh_, xl_):
        return vh * xh_, jnp.zeros_like(vh)

    def cheap_add(ah, al, bh, bl):
        return ah + bh, al + bl

    for tag, mul, add in (
        ("cheap-mul", cheap_mul, real_add),
        ("cheap-add", real_mul, cheap_add),
        ("cheap-both", cheap_mul, cheap_add),
    ):
        D._ds_mul_pair, D._ds_add = mul, add
        # the kernel resolves the primitives from module globals at trace
        # time; clearing jit caches forces a retrace under the patch
        jax.clear_caches()
        ms = _time_df64(d, xh_d, xl_d)
        print(f"[{tag:10s}] {ms:.4f} ms  (delta {ms0 - ms:+.4f})",
              file=sys.stderr, flush=True)
    D._ds_mul_pair, D._ds_add = real_mul, real_add
    jax.clear_caches()

    # --- f32 stream/structure reference --------------------------------
    a5 = build_csr5((a.indptr, a.indices, a.data.astype(np.float32), a.shape))
    ms32 = time_spmv_device_loop(
        lambda a_, x_: K.csr5_spmv_pallas(a_, x_), xh_d, 200, operands=a5
    )
    print(f"[f32-ref]   {ms32:.4f} ms  (df64 = {ms0 / ms32:.2f}x f32)",
          file=sys.stderr, flush=True)

    # --- host ds order-oracle: can ANY summation order reach 2^-53? ----
    # per-row sequential ds accumulation of exact two-prod products,
    # in element order (numpy, f32 ds arithmetic)
    sm = sp.csr_matrix(
        (a.data[: 40 * 28], a.indices[: 40 * 28], a.indptr[: 41]),
        shape=(40, n),
    )  # 40 rows is plenty for the error statistic
    vh32, vl32 = D.split_f64(sm.data)
    rel_best = 0.0
    for r in range(40):
        lo, hi = sm.indptr[r], sm.indptr[r + 1]
        if lo == hi:
            continue
        sh = sl_ = np.float32(0.0)
        for k in range(lo, hi):
            c = sm.indices[k]
            ph, pl_ = _host_ds_mul(
                np.float32(vh32[k]), np.float32(vl32[k]),
                np.float32(xh[c]), np.float32(xl[c]),
            )
            sh, sl_ = _host_ds_add(sh, sl_, ph, pl_)
        y = np.float64(sh) + np.float64(sl_)
        ref = float(sm[r].toarray() @ x64)
        rel_best = max(rel_best, abs(y - ref) / max(abs(ref), 1e-300))
    print(
        f"[order-oracle] best-case per-row sequential ds sums: "
        f"maxrel={rel_best:.2e}  (2^-53 = 1.1e-16, 2^-48 = 3.6e-15)",
        file=sys.stderr, flush=True,
    )


def _host_ds_add(ah, al, bh, bl):
    f32 = np.float32
    s = f32(ah + bh)
    bb = f32(s - ah)
    e = f32(f32(ah - f32(s - bb)) + f32(bh - bb))
    tl = f32(al + bl)
    bb2 = f32(tl - al)
    te = f32(f32(al - f32(tl - bb2)) + f32(bl - bb2))
    e = f32(e + tl)
    s2 = f32(s + e)
    e2 = f32(e - f32(s2 - s))
    e2 = f32(e2 + te)
    s3 = f32(s2 + e2)
    return s3, f32(e2 - f32(s3 - s2))


def _host_ds_mul(vh, vl, xh_, xl_):
    f32 = np.float32
    p = f32(vh * xh_)
    t = f32(vh * f32(4097.0))
    hh = f32(t - f32(t - vh))
    hl = f32(vh - hh)
    t2 = f32(xh_ * f32(4097.0))
    gh = f32(t2 - f32(t2 - xh_))
    gl = f32(xh_ - gh)
    e = f32(f32(f32(f32(hh * gh) - p) + f32(hh * gl) + f32(hl * gh)) + f32(hl * gl))
    e = f32(e + f32(f32(vh * xl_) + f32(vl * xh_) + f32(vl * xl_)))
    s = f32(p + e)
    return s, f32(e - f32(s - p))


if __name__ == "__main__":
    main()
