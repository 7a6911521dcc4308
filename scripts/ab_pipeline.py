"""A/B: committed (git HEAD) kernel vs working-tree kernel, interleaved.

Runs on the real TPU. Snapshots the HEAD version of ops/csr5_kernel.py
into ops/_csr5_kernel_baseline.py (gitignored), builds each matrix once,
then times both kernels back-to-back within one process so the
session-level device-speed variance (NOTES.md, +-10%) cancels.

Usage: edit ops/csr5_kernel.py (uncommitted), then
  python scripts/ab_pipeline.py
"""

import pathlib
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH: that breaks axon discovery

_REPO = pathlib.Path(__file__).resolve().parents[1]
_BASE = _REPO / "benchmark_spmv_using_csr5_tpu/ops/_csr5_kernel_baseline.py"
_BASE.write_bytes(
    subprocess.check_output(
        ["git", "-C", str(_REPO), "show",
         "HEAD:benchmark_spmv_using_csr5_tpu/ops/csr5_kernel.py"]
    )
)

from benchmark_spmv_using_csr5_tpu.config import CSR5Config, compute_sigma
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as newk
from benchmark_spmv_using_csr5_tpu.ops import _csr5_kernel_baseline as oldk
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import synth

import scipy.sparse as sp


def bench_case(name, a, num_rhs=1, num_run=200):
    m, n = a.shape
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=(n, num_rhs) if num_rhs > 1 else n).astype(
        np.float32
    )
    a_sp = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    y_ref = a_sp @ x
    a5 = build_csr5(
        (a.indptr, a.indices, a.data, a.shape),
        CSR5Config(sigma=compute_sigma(m, len(a.data))),
    )
    xd = jnp.asarray(x)
    if num_rhs > 1:
        fns = {"old": oldk.csr5_spmm_pallas, "new": newk.csr5_spmm_pallas}
    else:
        fns = {"old": oldk.csr5_spmv_pallas, "new": newk.csr5_spmv_pallas}

    for tag, fn in fns.items():
        y = np.asarray(fn(a5, xd))
        rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
        ok = float(rel.max()) <= 0.01
        ms = time_spmv_device_loop(lambda a_, x_: fn(a_, x_), xd, num_run, operands=a5)
        print(
            f"[{name}] {tag}: {ms:.4f} ms  maxrel={float(rel.max()):.2e} "
            f"{'PASS' if ok else 'FAIL'}",
            file=sys.stderr,
            flush=True,
        )


def main():
    cases = [
        ("banded500k", synth.banded(500_000, 27, dtype=np.float32), 1, 200),
        (
            "scatband300k",
            synth.scattered_band(300_000, 16, 6000, dtype=np.float32),
            1,
            100,
        ),
        (
            "powerlaw200k",
            synth.power_law(200_000, 200_000, 8.0, dtype=np.float32),
            1,
            50,
        ),
        ("spmm8_banded500k", synth.banded(500_000, 27, dtype=np.float32), 8, 50),
    ]
    for name, a, rhs, runs in cases:
        bench_case(name, a, num_rhs=rhs, num_run=runs)


if __name__ == "__main__":
    main()
