"""Ablation profiling of the CSR5 Pallas kernel on real TPU.

Times kernel variants with stages disabled to find where the 4.4 ms on
banded500k goes. Run: python scripts/profile_kernel.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from benchmark_spmv_using_csr5_tpu import build_csr5, csr_from_scipy  # noqa: E402
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K  # noqa: E402
from benchmark_spmv_using_csr5_tpu.utils import synth  # noqa: E402

LANES = 128


def _force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps * 1e3


def make_variant(a5, stages):
    """stages: set of enabled stage names among {gather, scan, window, accum}."""
    cfg = a5.config
    p, B, sigma = a5.num_tiles, cfg.tiles_per_block, cfg.sigma
    pmax, capw = a5.pmax, a5.capw
    n_pad, m_pad = a5.n_pad, a5.m_pad
    mw = K._meta_width(pmax)
    G = capw // LANES

    def kernel(alpha_ref, meta_hbm, col_ref, val_ref, wsub_ref, wlane_ref,
               x_ref, y_ref, meta_smem, meta_sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        cp = pltpu.make_async_copy(
            meta_hbm.at[pl.ds(i * B, B), :], meta_smem, meta_sem)
        cp.start()
        cp.wait()
        alpha = alpha_ref[0]

        for b in range(B):
            col = col_ref[pl.ds(b * sigma, sigma), :]
            val = val_ref[pl.ds(b * sigma, sigma), :] * alpha

            if "gather" in stages:
                lane = col & (LANES - 1)
                page_of = col >> 7
                cnt = meta_smem[b, 1]

                def page_body(k, acc):
                    pid = meta_smem[b, K.META_HDR + k]
                    xrow = x_ref[pl.ds(pid, 1), :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(xrow, (sigma, LANES)), lane, axis=1)
                    return acc + jnp.where(page_of == pid, g, 0.0)

                xg = jax.lax.fori_loop(
                    0, cnt, page_body, jnp.zeros((sigma, LANES), jnp.float32))
                prod = val * xg
            else:
                prod = val + jnp.float32(1e-30) * col.astype(jnp.float32)

            if "scan" in stages:
                pv = K._inclusive_scan(prod, axis=0, size=sigma)
                lane_tot = pv[sigma - 1: sigma, :]
                lane_incl = K._inclusive_scan(lane_tot, axis=1, size=LANES)
                lane_excl = lane_incl - lane_tot
                P = pv + lane_excl
            else:
                P = prod

            rs = meta_smem[b, 0]
            if "window" in stages:
                a_off = rs & (LANES - 1)
                w_groups = []
                for g in range(G):
                    wl = wlane_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                    ws = wsub_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                    R1 = jnp.take_along_axis(
                        P, jnp.broadcast_to(wl, (sigma, LANES)), axis=1)
                    w_groups.append(K._taa_sub8(R1, ws, sigma))
                W_end = jnp.concatenate(w_groups, axis=0)
                rolled = pltpu.roll(W_end, 1, axis=1)
                down = pltpu.roll(W_end, 1, axis=0)
                W_prev = jnp.where(
                    K._lane_iota(W_end.shape) == 0,
                    pltpu.roll(down, 1, axis=1), rolled)
                d_idx = K._sub_iota(W_end.shape) * LANES + K._lane_iota(W_end.shape)
                W_prev = jnp.where(d_idx - 1 >= a_off, W_prev, 0.0)
                W2 = jnp.where(d_idx >= a_off, W_end - W_prev, 0.0)
            else:
                W2 = P[0:1, :] if G == 1 else jnp.concatenate(
                    [P[g: g + 1, :] for g in range(G)], axis=0)

            if "accum" in stages:
                by = rs >> 7
                y_ref[pl.ds(by, G), :] += W2
            else:
                y_ref[pl.ds(0, G), :] = W2

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.float32),
        grid=(p // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, capw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, capw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m_pad // LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((B, mw), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=K._VMEM_BUDGET + 16 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * sigma * LANES,
            bytes_accessed=p * sigma * LANES * 8 + (m_pad + n_pad) * 4,
            transcendentals=0,
        ),
    )

    meta = jnp.asarray(K.build_meta_plane(a5))

    @jax.jit
    def run(x):
        x_pad = jnp.zeros(n_pad, jnp.float32).at[: a5.n].set(x)
        x2d = x_pad.reshape(n_pad // LANES, LANES)
        col2d = a5.col_idx_tiles.reshape(p * sigma, LANES)
        val2d = a5.val_tiles.reshape(p * sigma, LANES)
        return call(jnp.ones(1, jnp.float32), meta, col2d, val2d,
                    a5.win_sub, a5.win_lane, x2d)

    return run


def main():
    print("building matrix...", flush=True)
    a_sp = synth.banded(500_000, 27, dtype=np.float32)
    t0 = time.perf_counter()
    a5 = build_csr5(csr_from_scipy(a_sp))
    print(f"convert {time.perf_counter()-t0:.1f}s  p={a5.num_tiles} "
          f"sigma={a5.sigma} capw={a5.capw} pmax={a5.pmax} "
          f"B={a5.config.tiles_per_block}", flush=True)
    x = jnp.asarray(synth.dense_x(a_sp.shape[1], dtype=np.float32))

    variants = [
        ("full", {"gather", "scan", "window", "accum"}),
        ("no-gather", {"scan", "window", "accum"}),
        ("no-scan", {"gather", "window", "accum"}),
        ("no-window", {"gather", "scan", "accum"}),
        ("no-accum", {"gather", "scan", "window"}),
        ("stream-only", set()),
    ]
    nnz_bytes = a5.num_tiles * a5.sigma * 128 * 8
    for name, stages in variants:
        try:
            run = make_variant(a5, stages)
            ms = timeit(run, x)
            gbps = nnz_bytes / ms / 1e6
            print(f"{name:12s} {ms:8.3f} ms   {gbps:7.1f} GB/s(stream)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
