"""Probe the DIA m=2M regression (VERDICT r1 weak item 6 / NOTES item 6).

banded27@500k runs 0.264 ms (beats CSR5); banded27@2M measured 1.80 ms vs
an expected ~1.06 (4x the 500k time) and CSR5's 1.19. Hypotheses:

H1 chunk geometry: more grid steps at 2M (122 vs 31) — sweep CHUNK_ROWS.
H2 strided value fetch: the (nd, m_pad/128, 128) layout makes each grid
   step DMA nd=27 separate 64 KB slices strided m_pad*4 = 8 MB apart;
   the interleaved (m_pad/128, nd, 128) layout (build_dia
   layout="interleaved") fetches ONE contiguous block per step. Stride
   grows with m, matching the size-dependent regression.

Run (TPU, single user):  python scripts/probe_dia_2m.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.ops import dia as dia_mod
from benchmark_spmv_using_csr5_tpu.utils import synth


def bench(m, bw, chunk, layout):
    import scipy.sparse as sp

    old = dia_mod.CHUNK_ROWS
    dia_mod.CHUNK_ROWS = chunk
    try:
        a = sp.csr_matrix(synth.banded(m, bw, dtype=np.float32))
        d = dia_mod.build_dia(
            (a.indptr, a.indices, a.data, a.shape), layout=layout
        )
        assert d is not None and dia_mod.dia_supported(d)
        x = jnp.asarray(synth.dense_x(m, dtype=np.float32))
        y = np.asarray(dia_mod.dia_spmv(d, x)[:64])
        y_ref = (a @ np.asarray(x))[:64]
        rel = float(
            np.abs(y - y_ref).max() / max(1e-30, np.abs(y_ref).max())
        )
        ms = time_spmv_device_loop(
            lambda d_, x_: dia_mod.dia_spmv(d_, x_), x, 200, operands=d
        )
        gb = d.ndiag * d.m_pad * 4 / 1e9
        print(
            f"{layout:12s} m={m} bw={bw} chunk={chunk}: {ms:.3f} ms "
            f"({gb / (ms * 1e-3):.0f} GB/s val-stream) rel={rel:.1e}",
            flush=True,
        )
        return ms
    finally:
        dia_mod.CHUNK_ROWS = old


if __name__ == "__main__":
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    for chunk in (16384, 32768, 65536):
        bench(2_000_000, 27, chunk, "diag")
    bench(500_000, 27, 16384, "diag")
    for chunk in (16384, 65536):
        bench(2_000_000, 27, chunk, "interleaved")
    bench(500_000, 27, 16384, "interleaved")
    print(f"total {time.time() - t0:.0f}s", flush=True)
