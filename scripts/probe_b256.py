"""B=256 probe: does doubling past 128 keep paying?

Needs the SMEM meta budget raised ((256*2)*128*4 = 262 KB > the 160 KB
default); the probe monkeypatches the constant to find out whether
Mosaic accepts it and whether the time improves before any production
constant changes. One process, real TPU.
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth

K._SMEM_META_BUDGET = 288 * 1024  # probe-only override


def main():
    a = synth.banded(500_000, 27, dtype=np.float32)
    m, n = a.shape
    nnz = len(a.data)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=n).astype(np.float32)
    y_ref = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape) @ x
    xd = jnp.asarray(x)
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
            f"B={B} (eff {eff}): {ms:.4f} ms  {met.pct_of_roofline:.2f}%  "
            f"maxrel={rel:.1e} {'PASS' if rel <= 0.01 else 'FAIL'}",
            file=sys.stderr,
            flush=True,
        )


if __name__ == "__main__":
    main()
