"""A/B: committed (git rev) kernel vs working-tree kernel, interleaved.

Runs on the real TPU. Snapshots the baseline-rev versions of
ops/csr5_kernel.py AND its data-format producers (ops/convert.py,
models/formats.py) into gitignored ``_*_baseline.py`` modules (imports
rewritten to point at each other), so the old kernel runs against an
old-converter CSR5Matrix even when the working tree changed the
conversion format. Each side builds its own a5; both are timed
back-to-back within one process so the session-level device-speed
variance (NOTES.md, +-10%) cancels.

Usage: edit the ops (uncommitted), then
  python scripts/ab_pipeline.py [baseline-rev]   # default HEAD
"""

import pathlib
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH: that breaks axon discovery

_REPO = pathlib.Path(__file__).resolve().parents[1]
_PKG = _REPO / "benchmark_spmv_using_csr5_tpu"


_BASE_REV = sys.argv[1] if len(sys.argv) > 1 else "HEAD"


def _snapshot(head_rel: str, base_name: str, rewrites) -> None:
    src = subprocess.check_output(
        ["git", "-C", str(_REPO), "show",
         f"{_BASE_REV}:benchmark_spmv_using_csr5_tpu/{head_rel}"]
    ).decode()
    for old, new in rewrites:
        src = src.replace(old, new)
    (_PKG / "ops" / base_name).write_text(src)


# snapshot the whole HEAD data path: formats -> convert -> kernel
# (formats.py sits in ops/ for the snapshot: its `..config` import still
# resolves to the package config from there)
_snapshot("models/formats.py", "_formats_baseline.py", [])
_snapshot(
    "ops/convert.py", "_convert_baseline.py",
    [("from ..models.formats import", "from ._formats_baseline import")],
)
_snapshot(
    "ops/csr5_kernel.py", "_csr5_kernel_baseline.py",
    [("from ..models.formats import", "from ._formats_baseline import")],
)

from benchmark_spmv_using_csr5_tpu.config import CSR5Config, compute_sigma
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as newk
from benchmark_spmv_using_csr5_tpu.ops import _csr5_kernel_baseline as oldk
from benchmark_spmv_using_csr5_tpu.ops import _convert_baseline as oldconvert
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
    csr = (a.indptr, a.indices, a.data, a.shape)
    cfg = CSR5Config(sigma=compute_sigma(m, len(a.data)))
    # each kernel version gets a matrix built by ITS OWN converter
    a5s = {"old": oldconvert.build_csr5(csr, cfg), "new": build_csr5(csr, cfg)}
    xd = jnp.asarray(x)
    if num_rhs > 1:
        fns = {"old": oldk.csr5_spmm_pallas, "new": newk.csr5_spmm_pallas}
    else:
        fns = {"old": oldk.csr5_spmv_pallas, "new": newk.csr5_spmv_pallas}

    for tag, fn in fns.items():
        a5 = a5s[tag]
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
