"""Ablation profiling of the CSR5 Pallas kernel v2 on real TPU.

Stage-toggled variants of the production kernel, timed with the CSE-proof
device loop. Run: python scripts/profile_kernel.py [sigma] [B]
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

from benchmark_spmv_using_csr5_tpu import CSR5Config, build_csr5  # noqa: E402
from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K  # noqa: E402
from benchmark_spmv_using_csr5_tpu.utils import synth  # noqa: E402

LANES = 128


def _force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def device_loop_time(fn, x, iters=30):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(x, k):
        def body(_, carry):
            acc, xx = carry
            out = fn(xx)
            acc = acc + out.ravel()[0]
            return acc, x + acc * 0.0

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
        return acc

    _force(run(x, iters))
    t0 = time.perf_counter()
    _force(run(x, iters))
    t_full = time.perf_counter() - t0
    _force(run(x, 1))
    t0 = time.perf_counter()
    _force(run(x, 1))
    t_one = time.perf_counter() - t0
    return max(t_full - t_one, 1e-9) / (iters - 1) * 1e3


def make_variant(a5, stages, B=None):
    cfg = a5.config
    p, sigma = a5.num_tiles, cfg.sigma
    B = B or cfg.tiles_per_block
    pmax, capw = a5.pmax, a5.capw
    n_pad, m_pad = a5.n_pad, a5.m_pad
    mw = K._meta_width(pmax)
    G = capw // LANES

    def kernel(meta_ref, col_ref, val_ref, win_ref, x_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        lt_s = (
            jax.lax.broadcasted_iota(jnp.int32, (sigma, sigma), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (sigma, sigma), 0)
        ).astype(jnp.float32)
        ltx = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        ).astype(jnp.float32)

        for b in range(B):
            col = col_ref[pl.ds(b * sigma, sigma), :]
            val = val_ref[pl.ds(b * sigma, sigma), :]

            if "gather" in stages:
                lane = col & (LANES - 1)
                page_of = col >> 7
                xg = jnp.zeros((sigma, LANES), jnp.float32)
                for k in range(pmax):
                    pid = meta_ref[b, K.META_HDR + k]
                    xrow = x_ref[pl.ds(pid, 1), :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(xrow, (sigma, LANES)), lane, axis=1
                    )
                    xg = xg + jnp.where(page_of == pid, g, 0.0)
                prod = val * xg
            else:
                prod = val + 1e-30 * col.astype(jnp.float32)

            if "scan" in stages:
                pv = jax.lax.dot_general(
                    lt_s, prod, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                lane_tot = pv[sigma - 1 : sigma, :]
                lane_excl = jax.lax.dot_general(
                    lane_tot, ltx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                pv = prod
                lane_excl = prod[0:1, :]
            lane_excl_b = jnp.broadcast_to(lane_excl, (8, LANES))

            rs = meta_ref[b, 0]
            if "window" in stages:
                a_off = rs & (LANES - 1)
                w_groups = []
                for g in range(G):
                    wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                    ws = wm & 0xFFFF
                    wl = wm >> 16
                    R1 = jnp.take_along_axis(
                        pv, jnp.broadcast_to(wl, (sigma, LANES)), axis=1
                    )
                    wv = K._taa_sub8(R1, ws, sigma)
                    cl = jnp.take_along_axis(
                        lane_excl_b, jnp.broadcast_to(wl, (8, LANES)), axis=1
                    )[0:1]
                    w_groups.append(wv + cl)
                W_end = (
                    w_groups[0] if G == 1 else jnp.concatenate(w_groups, axis=0)
                )
                rolled = pltpu.roll(W_end, 1, axis=1)
                if G > 1:
                    down = pltpu.roll(W_end, 1, axis=0)
                    W_prev = jnp.where(
                        K._lane_iota(W_end.shape) == 0,
                        pltpu.roll(down, 1, axis=1),
                        rolled,
                    )
                else:
                    W_prev = rolled
                d_idx = K._sub_iota(W_end.shape) * LANES + K._lane_iota(W_end.shape)
                W_prev = jnp.where(d_idx - 1 >= a_off, W_prev, 0.0)
                W2 = jnp.where(d_idx >= a_off, W_end - W_prev, 0.0)
            else:
                # consume all of pv so nothing is DCE'd
                W2 = sum(
                    pv[v * 8 : v * 8 + 8, :] for v in range(sigma // 8)
                )[0:G] + lane_excl_b[0:G]
                if G > 1 and W2.shape[0] < G:
                    W2 = jnp.concatenate(
                        [W2] + [W2[0:1]] * (G - W2.shape[0]), axis=0
                    )

            if "accum" in stages:
                by = rs >> 7
                y_ref[pl.ds(by, G), :] += W2
            else:
                y_ref[pl.ds(0, G), :] += W2

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.float32),
        grid=(p // B,),
        in_specs=[
            pl.BlockSpec((B, mw), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B, capw), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m_pad // LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=K._VMEM_BUDGET + 16 * 1024 * 1024
        ),
    )

    meta = K.build_meta_plane(a5)
    col2d = a5.col_idx_tiles.reshape(p * sigma, LANES)
    val2d = a5.val_tiles.reshape(p * sigma, LANES)

    def run(x2d):
        return call(meta, col2d, val2d, a5.win_map, x2d)

    return run


def main():
    sigma = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    B = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print("building matrix...", flush=True)
    a_sp = synth.banded(500_000, 27, dtype=np.float32).tocsr()
    t0 = time.perf_counter()
    a5 = build_csr5(
        (a_sp.indptr, a_sp.indices, a_sp.data, a_sp.shape),
        CSR5Config(sigma=sigma, tiles_per_block=B or 32),
    )
    print(
        f"convert {time.perf_counter()-t0:.1f}s  p={a5.num_tiles} "
        f"sigma={a5.sigma} capw={a5.capw} pmax={a5.pmax} "
        f"B={a5.config.tiles_per_block}",
        flush=True,
    )
    x = jnp.zeros(a5.n_pad + LANES, jnp.float32).at[: a5.n].set(
        jnp.asarray(synth.dense_x(a_sp.shape[1], dtype=np.float32))
    )
    x2d = x.reshape(-1, LANES)

    variants = [
        ("full", {"gather", "scan", "window", "accum"}),
        ("no-gather", {"scan", "window", "accum"}),
        ("no-scan", {"gather", "window", "accum"}),
        ("no-window", {"gather", "scan", "accum"}),
        ("stream-only", set()),
    ]
    nnz_bytes = a5.num_tiles * a5.sigma * 128 * 8
    roof = nnz_bytes / 819e9 * 1e3
    print(f"roofline(819GB/s) = {roof*1e3:.0f} us", flush=True)
    for name, stages in variants:
        try:
            run = make_variant(a5, stages, B)
            ms = device_loop_time(run, x2d)
            gbps = nnz_bytes / ms / 1e6
            print(f"{name:12s} {ms:8.3f} ms   {gbps:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
