"""TPU probe: DIA SpMM vs CSR5 SpMM on the spmm8 bench matrix.

The spmm8_banded500k case times the CSR5 multi-rhs kernel (2.20 ms,
BENCH_r02 = exactly 8x the SpMV: no amortization, VERDICT weak #4). The
banded matrix is DIA-selectable, and the round-2 streamed-x DIA SpMM
shares the diagonal value stream across all rhs — measure the gap the
format selector can deliver for the SpMM case.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmark_spmv_using_csr5_tpu.bench.harness import (
        time_spmv_device_loop,
    )
    from benchmark_spmv_using_csr5_tpu.ops.dia import (
        build_dia,
        dia_spmm,
        dia_spmm_supported,
    )
    from benchmark_spmv_using_csr5_tpu.ops.select import select_format
    from benchmark_spmv_using_csr5_tpu.utils import synth

    print(f"backend={jax.default_backend()}", flush=True)
    a = synth.banded(500_000, 27, dtype=np.float32)
    R = 8
    rng = np.random.default_rng(0)
    xm = rng.integers(1, 10, (a.shape[1], R)).astype(np.float32)
    y_ref = a @ xm

    fmt = select_format(a.indptr, a.indices, a.shape)
    print(f"select_format -> {fmt}", flush=True)

    t0 = time.perf_counter()
    d = build_dia((a.indptr, a.indices, a.data, a.shape))
    print(
        f"build_dia: {time.perf_counter() - t0:.2f}s, ndiag={d.ndiag}, "
        f"spmm_supported={dia_spmm_supported(d, R)}",
        flush=True,
    )
    xd = jnp.asarray(xm)
    y = np.asarray(dia_spmm(d, xd))
    rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
    ms = time_spmv_device_loop(
        lambda d_, x_: dia_spmm(d_, x_), xd, 100, operands=d
    )
    flops = 2 * a.nnz * R
    print(
        f"dia spmm8: {ms:.4f} ms  {flops / (ms * 1e-3) / 1e9:.1f} GFLOPS  "
        f"rel={rel:.1e}  (csr5 spmm8 BENCH_r02: 2.20 ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
