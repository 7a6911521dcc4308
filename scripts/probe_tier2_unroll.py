"""Sweep FORI_PAGE_UNROLL (tier-2 pages per fori iteration) on the TPU.

The tier-2 scattered gather is bound by the per-iteration scalar-load ->
dynamic-row-load latency chain (~40 ns/iter, NOTES.md), not by VPU
throughput. Unrolling U pages per body shares the column decode across
the U pages and overlaps U independent load chains; powerlaw200k floors
at 7.1 ms with U=1 and cnt_max ~190 pages/tile, so a latency win here is
a direct multiplier on the adversarial case.

In-process sweep (one tunnel session, interleaved A/B semantics):
validates each variant against scipy then times the device loop.

Run (TPU, single user):  python scripts/probe_tier2_unroll.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark_spmv_using_csr5_tpu import build_csr5, csr_from_scipy
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as ck
from benchmark_spmv_using_csr5_tpu.utils import synth


def main():
    print(f"devices: {jax.devices()}", flush=True)
    a_sp = synth.power_law(200_000, 200_000, 8.0, dtype=np.float32)
    a5 = build_csr5(csr_from_scipy(a_sp))
    assert ck.pallas_supported(a5)
    print(f"pmax={a5.pmax} sigma={a5.config.sigma}", flush=True)
    x = synth.dense_x(a_sp.shape[1], dtype=np.float32)
    xd = jnp.asarray(x)
    y_ref = a_sp @ x

    results = {}
    for U in (1, 2, 4, 8):
        ck.FORI_PAGE_UNROLL = U
        ck._csr5_spmv_pallas_jit.clear_cache()
        y = np.asarray(ck.csr5_spmv_pallas(a5, xd)[:256])
        rel = float(
            np.abs(y - y_ref[:256]).max()
            / max(1e-30, np.abs(y_ref[:256]).max())
        )
        ms = time_spmv_device_loop(
            lambda a_, x_: ck.csr5_spmv_pallas(a_, x_), xd, 50, operands=a5
        )
        results[U] = ms
        print(f"U={U}: {ms:.3f} ms  rel={rel:.1e}", flush=True)

    best = min(results, key=results.get)
    print(
        f"best U={best} ({results[best]:.3f} ms vs U=1 {results[1]:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
