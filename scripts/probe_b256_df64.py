"""Two follow-ups to the B=128 rematch, one TPU process:

1. B=256 on the primary (needs the SMEM meta budget raised past 262 KB
   — probe-only monkeypatch; production keeps 160 KB unless this wins).
2. df64 B sweep 32/64/128: the session-2 shakedown measured df64 at
   1.040 ms vs round-3's 0.952 — weather, or does the df64 kernel (its
   pass 2 is the per-tile scalar loop, no batched window pass) prefer a
   smaller block?
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.ops import csr5_df64 as D
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def main():
    a = synth.banded(500_000, 27, dtype=np.float32)
    m, n = a.shape
    nnz = len(a.data)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=n).astype(np.float32)
    y_ref = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape) @ x
    xd = jnp.asarray(x)

    orig_smem_budget = K._SMEM_META_BUDGET
    K._SMEM_META_BUDGET = 288 * 1024  # probe-only override
    for B in (128, 256):
        cfg = CSR5Config(sigma=24, tiles_per_block=B)
        a5 = build_csr5((a.indptr, a.indices, a.data, a.shape), cfg)
        eff = K._effective_block(B, a5.pmax, a5.num_tiles)
        y = np.asarray(K.csr5_spmv_pallas(a5, xd))
        rel = float(
            (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
        )
        ms = time_spmv_device_loop(
            lambda a_, x_: K.csr5_spmv_pallas(a_, x_), xd, 200, operands=a5
        )
        met = perf.spmv_metrics(m, nnz, ms, 4, n=n)
        print(
            f"[spmv] B={B} (eff {eff}): {ms:.4f} ms  "
            f"{met.pct_of_roofline:.2f}%  maxrel={rel:.1e} "
            f"{'PASS' if rel <= 0.01 else 'FAIL'}",
            file=sys.stderr,
            flush=True,
        )
    K._SMEM_META_BUDGET = orig_smem_budget  # restore for the df64 sweep

    vals = (a.data.astype(np.float64) * 1.000000001) + 1e-9
    a_sp64 = sp.csr_matrix((vals, a.indices, a.indptr), shape=a.shape)
    x64 = x.astype(np.float64)
    y_ref64 = a_sp64 @ x64
    xh, xl = D.split_f64(x64)
    xh_d, xl_d = jnp.asarray(xh), jnp.asarray(xl)
    for B in (32, 64, 128):
        cfg = CSR5Config(sigma=24, tiles_per_block=B)
        d = D.build_df64((a.indptr, a.indices, vals, a.shape), cfg)
        assert D.df64_supported(d), B
        y = D.df64_combine(*[np.asarray(v) for v in D.df64_spmv(d, (xh_d, xl_d))])
        rel = float(
            (np.abs(y - y_ref64) / np.maximum(np.abs(y_ref64), 1e-30)).max()
        )
        fn = lambda ops, xx: D.df64_spmv(ops[0], (xx, ops[1]))[0]  # noqa: E731
        ms = time_spmv_device_loop(fn, xh_d, 100, operands=(d, xl_d))
        met = perf.spmv_metrics(m, nnz, ms, 8, n=n)
        print(
            f"[df64] B={B}: {ms:.4f} ms  {met.pct_of_roofline:.2f}% (f64 "
            f"model)  maxrel={rel:.1e} {'PASS' if rel <= 0.01 else 'FAIL'}",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
