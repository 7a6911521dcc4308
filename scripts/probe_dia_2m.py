"""Probe the DIA m=2M regression (VERDICT r1 weak item 6 / NOTES item 6).

banded27@500k runs 0.264 ms (beats CSR5); banded27@2M measured 1.80 ms vs
an expected ~1.06 (4x the 500k time) and CSR5's 1.19. Hypotheses:

H1 chunk geometry: more grid steps at 2M (122 vs 31) — sweep CHUNK_ROWS.
H2 strided value fetch: the (nd, m_pad/128, 128) layout makes each grid
   step DMA nd=27 separate 64 KB slices strided m_pad*4 = 8 MB apart;
   an interleaved (m_pad/128, nd, 128) layout fetches ONE contiguous
   block per step. Stride grows with m, matching the size-dependent
   regression.

Run (TPU, single user):  python scripts/probe_dia_2m.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.ops import dia as dia_mod
from benchmark_spmv_using_csr5_tpu.utils import synth

LANES = 128


def bench_current(m, bw, chunk):
    import scipy.sparse as sp

    old = dia_mod.CHUNK_ROWS
    dia_mod.CHUNK_ROWS = chunk
    try:
        a = sp.csr_matrix(synth.banded(m, bw, dtype=np.float32))
        d = dia_mod.build_dia((a.indptr, a.indices, a.data, a.shape))
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
            f"current m={m} bw={bw} chunk={chunk}: {ms:.3f} ms "
            f"({gb / (ms * 1e-3):.0f} GB/s val-stream) rel={rel:.1e}",
            flush=True,
        )
        return ms
    finally:
        dia_mod.CHUNK_ROWS = old


# ---- H2: interleaved value layout (one contiguous block per step) -----


def _dia_kernel_il(val_ref, x_ref, o_ref, *, offsets, pad_l, C):
    """val_ref: (C//LANES, nd, LANES) interleaved block."""
    i = pl.program_id(0)
    R = C // LANES
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    acc = jnp.zeros((R, LANES), jnp.float32)
    for k, off in enumerate(offsets):
        s = off + pad_l
        q, sh = divmod(s, LANES)
        base = i * R + q
        if sh == 0:
            xs = x_ref[pl.ds(base, R), :]
        else:
            a = x_ref[pl.ds(base, R), :]
            b = x_ref[pl.ds(base + 1, R), :]
            xs = jnp.where(
                lanes < LANES - sh,
                pltpu.roll(a, LANES - sh, axis=1),
                pltpu.roll(b, LANES - sh, axis=1),
            )
        acc = acc + val_ref[:, k, :].astype(jnp.float32) * xs
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "chunk"))
def dia_spmv_interleaved(data_il, x, offsets, chunk):
    nd = len(offsets)
    m_pad = data_il.shape[0] * LANES
    C = chunk
    pad_l = -(-max(0, -min(offsets)) // LANES) * LANES
    n = x.shape[0]
    pad_r_elems = max(n, m_pad + max(max(offsets), 0)) + LANES
    x_rows = pad_l // LANES + -(-pad_r_elems // LANES)
    xp = jnp.zeros(x_rows * LANES, jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (pad_l,))
    x2d = xp.reshape(x_rows, LANES)
    kernel = functools.partial(
        _dia_kernel_il, offsets=offsets, pad_l=pad_l, C=C
    )
    y2d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.float32),
        grid=(m_pad // C,),
        in_specs=[
            pl.BlockSpec(
                (C // LANES, nd, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C // LANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=dia_mod._VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * m_pad,
            bytes_accessed=nd * m_pad * 4 + 2 * m_pad * 4,
            transcendentals=0,
        ),
    )(data_il, x2d)
    return y2d.reshape(-1)


def bench_interleaved(m, bw, chunk):
    import scipy.sparse as sp

    old = dia_mod.CHUNK_ROWS
    dia_mod.CHUNK_ROWS = chunk
    try:
        a = sp.csr_matrix(synth.banded(m, bw, dtype=np.float32))
        d = dia_mod.build_dia((a.indptr, a.indices, a.data, a.shape))
    finally:
        dia_mod.CHUNK_ROWS = old
    assert d is not None
    # (nd, m_pad) -> (m_pad/128, nd, 128) interleaved
    data_il = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(d.data).reshape(d.ndiag, d.m_pad // LANES, LANES)
            .transpose(1, 0, 2)
        )
    )
    x = jnp.asarray(synth.dense_x(m, dtype=np.float32))
    y = np.asarray(
        dia_spmv_interleaved(data_il, x, d.offsets, chunk)[:64]
    )
    y_ref = (a @ np.asarray(x))[:64]
    rel = float(np.abs(y - y_ref).max() / max(1e-30, np.abs(y_ref).max()))
    ms = time_spmv_device_loop(
        lambda dd, x_: dia_spmv_interleaved(dd, x_, d.offsets, chunk),
        x,
        200,
        operands=data_il,
    )
    gb = d.ndiag * d.m_pad * 4 / 1e9
    print(
        f"interleaved m={m} bw={bw} chunk={chunk}: {ms:.3f} ms "
        f"({gb / (ms * 1e-3):.0f} GB/s val-stream) rel={rel:.1e}",
        flush=True,
    )
    return ms


if __name__ == "__main__":
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    for chunk in (16384, 32768, 65536):
        bench_current(2_000_000, 27, chunk)
    bench_current(500_000, 27, 16384)
    for chunk in (16384, 65536):
        bench_interleaved(2_000_000, 27, chunk)
    bench_interleaved(500_000, 27, 16384)
    print(f"total {time.time() - t0:.0f}s", flush=True)
