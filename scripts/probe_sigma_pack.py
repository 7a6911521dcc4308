"""TPU sweep: sigma x packed-column-plane on the primary bench case.

VERDICT r2 weak #1: the auto-heuristic picks sigma=24 for banded500k
(~28 nnz/row), which disables the packed column plane (gated to
sigma %% 16 == 0), while NOTES round-1 session 3 recorded sigma=16/32
with col_packed as a 5-8%% win over unpacked at the same sigma — but the
same session's sigma sweep recorded s24 0.282 < s16 0.362. The two
claims cannot both pick the heuristic, so measure the full grid once on
the real chip: sigma in {16, 24, 32} x {packed, raw}, exact checks, plus
the spmm8 case at the winner.

Usage: python scripts/probe_sigma_pack.py [--spmm]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmark_spmv_using_csr5_tpu.config import CSR5Config
    from benchmark_spmv_using_csr5_tpu.bench.harness import (
        time_spmv_device_loop,
    )
    from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
    from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import (
        csr5_spmv_pallas,
        pallas_supported,
    )
    from benchmark_spmv_using_csr5_tpu.utils import synth
    from benchmark_spmv_using_csr5_tpu.utils.perf import get_bytes

    print(f"backend={jax.default_backend()}", flush=True)
    a = synth.banded(500_000, 27, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, a.shape[1]).astype(np.float32)
    xd = jnp.asarray(x)
    y_ref = a @ x
    gb = get_bytes(a.shape[0], a.nnz, 4, 4) / 1e9

    results = {}
    for sig in (16, 24, 32):
        for mode in ("auto", "raw"):
            t0 = time.perf_counter()
            a5 = build_csr5(
                (a.indptr, a.indices, a.data, a.shape), CSR5Config(sigma=sig)
            )
            packed = a5.col_packed is not None
            if mode == "raw" and packed:
                a5 = a5.replace(col_packed=None)
                packed = False
            if mode == "raw" and not packed and (sig, False) in results:
                continue  # raw == auto for this sigma
            conv = time.perf_counter() - t0
            if not pallas_supported(a5):
                print(f"s{sig} {mode}: unsupported", flush=True)
                continue
            y = np.asarray(csr5_spmv_pallas(a5, xd))
            rel = float(
                (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
            )
            ms = time_spmv_device_loop(
                lambda m_, x_: csr5_spmv_pallas(m_, x_), xd, 200, operands=a5
            )
            pct = gb / (ms * 1e-3) / 8.19
            key = (sig, packed)
            if key in results:
                continue
            results[key] = ms
            print(
                f"s{sig:2d} packed={int(packed)}: {ms:.4f} ms  "
                f"{pct:6.2f}% roofline  rel={rel:.1e}  conv={conv:.2f}s",
                flush=True,
            )

    best = min(results, key=results.get)
    print(f"BEST: sigma={best[0]} packed={best[1]} {results[best]:.4f} ms")


if __name__ == "__main__":
    main()
