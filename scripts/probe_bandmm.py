"""TPU probe for the MXU band-block SpMM kernel design (ops/bandmm.py).

Questions answered on the real chip before committing to a design:
1. Does a LANE-dim dynamic slice at 128-aligned offsets lower in Mosaic
   (x window read straight from a (Rp, nx) VMEM plane)?
2. What does the per-block (Rp,K)@(128,K)^T matmul + (128,K) stream cost
   at nblk ~ 3900 grid steps — is the projected ~1 ms for spmm8 real?
3. Fallback: page-stacked x layout + K/128 accumulated matmuls.

Matrix: banded500k bw=27 (the spmm8 bench case), R=8.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from benchmark_spmv_using_csr5_tpu.bench.harness import (
        time_spmv_device_loop,
    )
    from benchmark_spmv_using_csr5_tpu.utils import synth
    from benchmark_spmv_using_csr5_tpu.utils.hostmem import arena_take

    print(f"backend={jax.default_backend()}", flush=True)
    LANES = 128
    m = 500_000
    a = synth.banded(m, 27, dtype=np.float32)
    R, Rp = 8, 8
    K = 384
    nblk = -(-m // LANES)
    m_pad = nblk * LANES

    # --- host-side dense band-block fill --------------------------------
    t0 = time.perf_counter()
    rp, ci, v = a.indptr, a.indices, a.data
    starts = rp[np.minimum(np.arange(nblk) * LANES, m)].astype(np.int64)
    ends = rp[np.minimum(np.arange(1, nblk + 1) * LANES, m)].astype(np.int64)
    cmin = np.full(nblk, 0, np.int64)
    ne = np.flatnonzero(ends > starts)
    cmin[ne] = np.minimum.reduceat(ci, starts[ne])
    cmax = np.zeros(nblk, np.int64)
    cmax[ne] = np.maximum.reduceat(ci, starts[ne])
    c0 = np.clip((cmin >> 7) << 7, 0, None)
    span = int((cmax - c0 + 1).max())
    assert span <= K, span
    nx_pages = int((c0.max() + K) // LANES)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    dense = arena_take((m_pad, K), np.float32, "bb:dense")
    flat_idx = rows * K + (ci - c0[rows >> 7])
    dense.reshape(-1)[flat_idx] = v
    # SMEM whole arrays must be WIDE: a (nblk, 1) tall shape crashes the
    # Mosaic compiler at nblk ~ 3900 (bisected 2026-08-19); (1, nblk) works
    c0p = np.zeros((1, nblk), np.int32)
    c0p[0, :] = c0 >> 7
    print(f"fill: {time.perf_counter() - t0:.2f}s  K={K} nx_pages={nx_pages}",
          flush=True)

    dense_d = jnp.array(dense)
    meta_d = jnp.array(c0p)
    rng = np.random.default_rng(0)
    xm = rng.integers(1, 10, (m, R)).astype(np.float32)
    y_ref = a @ xm

    # --- variant A: lane-dim dynamic slice, one matmul per block --------
    def kern_a(meta_ref, a_ref, xt_ref, out_ref):
        c0l = meta_ref[0, pl.program_id(0)] * LANES
        xw = xt_ref[:, pl.ds(c0l, K)]  # (Rp, K) lane-dim dynamic slice
        out_ref[:] = jax.lax.dot_general(
            xw, a_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def call_a(meta, dense, xt):
        return pl.pallas_call(
            kern_a,
            out_shape=jax.ShapeDtypeStruct((Rp, m_pad), jnp.float32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((LANES, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rp, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * nblk * LANES * K * Rp,
                bytes_accessed=m_pad * K * 4,
                transcendentals=0,
            ),
        )(meta, dense, xt)

    # x^T padded to (Rp, nx_pages*128)
    nx_pad = nx_pages * LANES
    xt = np.zeros((Rp, nx_pad), np.float32)
    xt[:R, :m] = xm.T
    xt_d = jnp.array(xt)

    @jax.jit
    def spmm_a(ops, xt):
        meta, dense = ops
        return call_a(meta, dense, xt)

    try:
        y = np.asarray(spmm_a((meta_d, dense_d), xt_d))[:R, :m].T
        err = float(np.abs(y - y_ref).max())
        print(f"A lane-ds: maxerr={err}", flush=True)
        if err == 0.0:
            ms = time_spmv_device_loop(
                lambda ops, x_: spmm_a(ops, x_), xt_d, 100,
                operands=(meta_d, dense_d),
            )
            gbs = m_pad * K * 4 / 1e9 / (ms * 1e-3)
            print(f"A lane-ds: {ms:.4f} ms  {gbs:.0f} GB/s dense stream  "
                  f"({2 * a.nnz * R / (ms * 1e-3) / 1e9:.0f} GFLOPS)", flush=True)
    except Exception as e:
        print(f"A lane-ds FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- variant B: page-stacked x, K/128 accumulated matmuls -----------
    def kern_b(meta_ref, a_ref, xt_ref, out_ref):
        c0p = meta_ref[0, pl.program_id(0)]
        acc = jnp.zeros((Rp, LANES), jnp.float32)
        for j in range(K // LANES):
            xw = xt_ref[pl.ds((c0p + j) * Rp, Rp), :]
            a_sub = a_ref[:, j * LANES : (j + 1) * LANES]
            acc = acc + jax.lax.dot_general(
                xw, a_sub, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[:] = acc

    def call_b(meta, dense, xpg):
        return pl.pallas_call(
            kern_b,
            out_shape=jax.ShapeDtypeStruct((Rp, m_pad), jnp.float32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((LANES, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rp, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * nblk * LANES * K * Rp,
                bytes_accessed=m_pad * K * 4,
                transcendentals=0,
            ),
        )(meta, dense, xpg)

    xpg = np.ascontiguousarray(
        xt.reshape(Rp, nx_pages, LANES).transpose(1, 0, 2)
    ).reshape(nx_pages * Rp, LANES)
    xpg_d = jnp.array(xpg)

    @jax.jit
    def spmm_b(ops, xpg):
        meta, dense = ops
        return call_b(meta, dense, xpg)

    try:
        y = np.asarray(spmm_b((meta_d, dense_d), xpg_d))[:R, :m].T
        err = float(np.abs(y - y_ref).max())
        print(f"B paged: maxerr={err}", flush=True)
        if err == 0.0:
            ms = time_spmv_device_loop(
                lambda ops, x_: spmm_b(ops, x_), xpg_d, 100,
                operands=(meta_d, dense_d),
            )
            gbs = m_pad * K * 4 / 1e9 / (ms * 1e-3)
            print(f"B paged: {ms:.4f} ms  {gbs:.0f} GB/s dense stream  "
                  f"({2 * a.nnz * R / (ms * 1e-3) / 1e9:.0f} GFLOPS)", flush=True)
    except Exception as e:
        print(f"B paged FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
