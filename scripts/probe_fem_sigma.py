"""fem3block600k sigma sweep (round 5): the heuristic picks sigma=32
(63 nnz/row); the tier-1 gather dominates (~34 scattered pages/tile), so
check whether the scattered-tier sigma=8 re-tune also applies to this
block-structured class. One TPU process, interleaved."""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def main():
    a = sp.csr_matrix(synth.fem_blocks(600_000))
    m, n = a.shape
    nnz = a.nnz
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, n).astype(np.float32)
    y_ref = a @ x
    xd = jnp.asarray(x)
    csr = (a.indptr, a.indices, a.data, a.shape)
    for sig in (8, 16, 24, 32):
        a5 = build_csr5(csr, CSR5Config(sigma=sig), value_dtype="auto")
        if not K.pallas_supported(a5):
            print(f"[fem] sigma={sig}: unsupported (pmax={a5.pmax})",
                  file=sys.stderr, flush=True)
            continue
        y = np.asarray(K.csr5_spmv_pallas(a5, xd))
        rel = float(
            (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
        )
        ms = time_spmv_device_loop(
            lambda a_, x_: K.csr5_spmv_pallas(a_, x_), xd, 100, operands=a5
        )
        met = perf.spmv_metrics(m, nnz, ms, 4, n=n)
        print(
            f"[fem] sigma={sig}: {ms:.4f} ms  {met.pct_of_roofline:.1f}%  "
            f"pmax={a5.pmax} contig={a5.pages_contig} packed="
            f"{a5.col_packed is not None}  maxrel={rel:.1e} "
            f"{'PASS' if rel <= 0.01 else 'FAIL'}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
