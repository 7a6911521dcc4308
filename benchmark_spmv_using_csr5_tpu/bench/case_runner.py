"""Single-benchmark-case runner: ``python -m ...bench.case_runner NAME``.

Prints ONE JSON line with the case's metrics. bench.py runs each case in
a subprocess with its own timeout so a hung TPU tunnel (observed once:
a bench run produced no output for 1100 s) can cost at most one case,
never the whole round benchmark.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _suite():
    from ..utils import synth

    return {
        "banded500k": (lambda: synth.banded(500_000, 27, dtype=np.float32), 1, 200),
        # moderate locality: random columns within a 6k band exercises the
        # tier-1 masked page unroll (page span > contig cap, < 64)
        "scatband300k": (
            lambda: synth.scattered_band(300_000, 16, 6000, dtype=np.float32),
            1,
            100,
        ),
        "powerlaw200k": (
            lambda: synth.power_law(200_000, 200_000, 8.0, dtype=np.float32),
            1,
            50,
        ),
        "spmm8_banded500k": (lambda: synth.banded(500_000, 27, dtype=np.float32), 8, 50),
        "banded2M": (lambda: synth.banded(2_000_000, 27, dtype=np.float32), 1, 100),
    }


def _run_csr5_case(name: str) -> dict:
    from .harness import run_benchmark

    make, rhs, num_run = _suite()[name]
    a = make()
    res = run_benchmark(
        name, a.indptr, a.indices, a.data, a.shape, num_run=num_run, num_rhs=rhs
    )
    print(res.report(), file=sys.stderr)
    return {
        "name": name,
        "gflops": round(res.gflops, 2),
        "pct_roofline": round(res.pct_of_roofline, 2),
        "spmv_ms": round(res.spmv_ms, 4),
        "nnz_per_sec": res.nnz_per_sec,
        "backend": res.backend,
        "check_ok": bool(res.check_ok),
    }


def _run_dia_case() -> dict:
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ..ops.dia import build_dia, dia_spmv
    from ..utils import synth
    from ..utils.perf import get_bytes
    from .harness import time_spmv_device_loop

    a = sp.csr_matrix(synth.banded(500_000, 3, dtype=np.float32))
    d = build_dia((a.indptr, a.indices, a.data, a.shape))
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, a.shape[1]).astype(np.float32)
    xd = jnp.asarray(x)
    y = np.asarray(dia_spmv(d, xd))
    y_ref = a @ x
    rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
    ms = time_spmv_device_loop(
        lambda d_, x_: dia_spmv(d_, x_), xd, 400, operands=d
    )
    gb = get_bytes(a.shape[0], a.nnz, 4, 4) / 1e9
    out = {
        "name": "dia_tridiag500k",
        "spmv_ms": round(ms, 4),
        "pct_roofline": round(gb / (ms * 1e-3) / 8.19, 2),
        "gflops": round(2 * a.nnz / (ms * 1e-3) / 1e9, 2),
        "check_ok": rel <= 0.01,
        "backend": "dia_pallas",
    }
    print(
        f"[dia_tridiag500k] {ms:.4f} ms, {out['pct_roofline']}% of HBM "
        f"roofline (reference byte model), maxrel={rel:.1e}",
        file=sys.stderr,
    )
    return out


def _parent_watchdog() -> None:
    """Exit if the parent bench.py dies (e.g. a driver timeout killed it):
    an orphaned case would otherwise keep holding the single-user TPU and
    hang every subsequent benchmark attempt."""
    import os
    import threading
    import time

    def watch():
        while True:
            if os.getppid() == 1:
                os._exit(3)
            time.sleep(5)

    threading.Thread(target=watch, daemon=True).start()


def main() -> int:
    _parent_watchdog()
    name = sys.argv[1]
    if name == "dia_tridiag500k":
        out = _run_dia_case()
    else:
        out = _run_csr5_case(name)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
