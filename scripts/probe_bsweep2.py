"""Cross-sweep after the B=128 discovery: sigma x B on the primary, and
B sensitivity of the other case classes (tier-1 scatband, tier-2
powerlaw, SpMM). One process, real TPU.

Usage: python scripts/probe_bsweep2.py
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.config import CSR5Config, compute_sigma
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def run(name, a, sigma, B, num_rhs=1, num_run=200):
    m, n = a.shape
    nnz = len(a.data)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=(n, num_rhs) if num_rhs > 1 else n).astype(
        np.float32
    )
    a_sp = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    y_ref = a_sp @ x
    cfg = CSR5Config(sigma=sigma, tiles_per_block=B)
    a5 = build_csr5((a.indptr, a.indices, a.data, a.shape), cfg)
    xd = jnp.asarray(x)
    if num_rhs > 1:
        assert K.pallas_spmm_supported(a5, num_rhs), (name, B)
        fn = K.csr5_spmm_pallas
    else:
        assert K.pallas_supported(a5), (name, B)
        fn = K.csr5_spmv_pallas
    y = np.asarray(fn(a5, xd))
    rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
    ms = time_spmv_device_loop(
        lambda a_, x_: fn(a_, x_), xd, num_run, operands=a5
    )
    met = perf.spmv_metrics(m, nnz, ms, 4, num_rhs=num_rhs, n=n)
    packed = a5.col_packed is not None
    print(
        f"[{name}] s{sigma} B{B}{'p' if packed else ''}: {ms:.4f} ms  "
        f"{met.pct_of_roofline:.2f}%  maxrel={rel:.1e} "
        f"{'PASS' if rel <= 0.01 else 'FAIL'}",
        file=sys.stderr,
        flush=True,
    )


def main():
    b500 = synth.banded(500_000, 27, dtype=np.float32)
    # sigma x B on the primary (packing auto-engages at sigma%16==0)
    for sigma in (16, 24, 32):
        for B in (64, 128):
            run("banded500k", b500, sigma, B)
    b2m = synth.banded(2_000_000, 27, dtype=np.float32)
    run("banded2M", b2m, 24, 32, num_run=100)
    run("banded2M", b2m, 24, 128, num_run=100)
    del b2m
    scat = synth.scattered_band(300_000, 16, 6000, dtype=np.float32)
    run("scatband300k", scat, 8, 32, num_run=100)
    run("scatband300k", scat, 8, 128, num_run=100)
    pl = synth.power_law(200_000, 200_000, 8.0, dtype=np.float32)
    run("powerlaw200k", pl, 8, 32, num_run=50)
    run("powerlaw200k", pl, 8, 128, num_run=50)
    run("spmm8_banded500k", b500, 24, 32, num_rhs=8, num_run=50)
    run("spmm8_banded500k", b500, 24, 128, num_rhs=8, num_run=50)


if __name__ == "__main__":
    main()
