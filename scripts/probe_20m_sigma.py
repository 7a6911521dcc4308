"""Sigma sweep for the row-sliced banded20M case (TPU).

banded20M (nnz/row = 6) lands at sigma=8 via the reference heuristic and
measured 64.3% of roofline on the sliced path; banded500k (nnz/row 28,
sigma=24) hits 80%. Does a larger sigma (fewer tiles, more rows/tile,
wider windows) help the low-nnz/row regime?

Run (TPU, single user):  python scripts/probe_20m_sigma.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops import bigslice
from benchmark_spmv_using_csr5_tpu.utils import synth


def main():
    print(f"devices: {jax.devices()}", flush=True)
    a = synth.banded(20_000_000, 5, dtype=np.float32)
    x = synth.dense_x(a.shape[1], dtype=np.float32)
    xd = jnp.asarray(x)
    y_head = (a[:256] @ x).astype(np.float32)
    gb = (a.shape[0] + 1 + a.nnz) * 4 / 1e9 + (2 * a.nnz + a.shape[0]) * 4 / 1e9
    for sigma in (8, 16, 24):
        t0 = time.time()
        sl = bigslice.build_csr5_sliced(
            (a.indptr, a.indices, a.data, a.shape), CSR5Config(sigma=sigma)
        )
        conv_s = time.time() - t0
        if sl is None:
            print(f"sigma={sigma}: sliced build rejected", flush=True)
            continue
        y = np.asarray(bigslice.sliced_spmv(sl, xd)[:256])
        rel = float(np.abs(y - y_head).max() / max(1e-30, np.abs(y_head).max()))
        ms = time_spmv_device_loop(
            lambda s_, x_: bigslice.sliced_spmv(s_, x_), xd, 100, operands=sl
        )
        print(
            f"sigma={sigma}: {ms:.3f} ms  {gb / (ms * 1e-3):.0f} GB/s "
            f"({gb / (ms * 1e-3) / 8.19:.1f}% roofline)  slices="
            f"{sl.num_slices}  conv={conv_s:.0f}s  rel={rel:.1e}",
            flush=True,
        )
        del sl


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
