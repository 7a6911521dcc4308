"""tiles_per_block (B) rematch on the batched-pass-2 kernel.

The round-1 sweep (B=32 optimal, NOTES.md) predates the batched window
pass 2, whose per-block fixed costs (the (B,128)@(128,128) carry matmul,
the (1,sigma)@(sigma,B*G*128) window matmul, the (B,128) wrap/diff ops)
amortize over B — so the optimum may have moved. One process, real TPU,
min-of-5 x 200-iter device loops per point (bench/harness.py rules).

Usage: python scripts/probe_bsweep.py [B ...]   # default 8 16 32 64 128
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config, compute_sigma
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import (
    csr5_spmv_pallas,
    pallas_supported,
)
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64, 128]
    a = synth.banded(500_000, 27, dtype=np.float32)
    m, n = a.shape
    nnz = len(a.data)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=n).astype(np.float32)
    a_sp = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    y_ref = a_sp @ x
    xd = jnp.asarray(x)
    csr = (a.indptr, a.indices, a.data, a.shape)
    sigma = compute_sigma(m, nnz)
    print(f"banded500k m={m} nnz={nnz} sigma={sigma}", file=sys.stderr)

    for B in bs:
        cfg = CSR5Config(sigma=sigma, tiles_per_block=B)
        a5 = build_csr5(csr, cfg)
        assert pallas_supported(a5), B
        y = np.asarray(csr5_spmv_pallas(a5, xd))
        rel = float(
            (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
        )
        ms = time_spmv_device_loop(
            lambda a_, x_: csr5_spmv_pallas(a_, x_), xd, 200, operands=a5
        )
        met = perf.spmv_metrics(m, nnz, ms, 4, n=n)
        print(
            f"B={B:4d}: {ms:.4f} ms  {met.pct_of_roofline:.2f}% roofline  "
            f"maxrel={rel:.1e} {'PASS' if rel <= 0.01 else 'FAIL'}",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
