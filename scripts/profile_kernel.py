"""Ablation profiling of the CSR5 Pallas kernel v3 on real TPU.

Variants of the production (scratch-accumulator) kernel with stages
swapped, timed with the CSE-proof device loop. Every variant routes its
result through the window gather + y scratch so nothing is DCE'd.

Run: python scripts/profile_kernel.py
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


def device_loop_time(fn, x, iters=200, samples=3):
    """min-of-samples long device loop: the tunnel adds +-2 ms jitter per
    dispatch, so short loops and single samples are garbage (NOTES.md)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(x, k):
        def body(_, carry):
            acc, xx = carry
            out = fn(xx)
            acc = acc + out.ravel()[0] + out.ravel()[1234]
            # 1e-30 scale: real data dependency XLA cannot fold away
            return acc, x + acc * 1e-30

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), x))
        return acc

    def sample(k):
        best = float("inf")
        _force(run(x, k))  # compile/warm
        for _ in range(samples):
            t0 = time.perf_counter()
            _force(run(x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = sample(iters)
    t_one = sample(1)
    return max(t_full - t_one, 1e-9) / (iters - 1) * 1e3


def make_variant(a5, *, gather=True, scan="mxu", window=True, B=None):
    cfg = a5.config
    p, sigma = a5.num_tiles, cfg.sigma
    B = B or K._effective_block(cfg.tiles_per_block, a5.pmax, p)
    pmax, capw = a5.pmax, a5.capw
    n_pad, m_pad = a5.n_pad, a5.m_pad
    mw = K._meta_width(pmax)
    G = capw // LANES

    def kernel(meta_ref, col_ref, val_ref, win_ref, x_ref, out_ref, y_ref, sem):
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

            if gather:
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

            if scan == "mxu":
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
            elif scan == "mxu-default":
                pv = jax.lax.dot_general(
                    lt_s, prod, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                lane_tot = pv[sigma - 1 : sigma, :]
                lane_excl = jax.lax.dot_general(
                    lane_tot, ltx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif scan == "roll":
                # per-vreg scan8 + carry chain, cross-lane log-roll
                sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
                parts = []
                carry = jnp.zeros((1, LANES), jnp.float32)
                for v in range(sigma // 8):
                    s = prod[v * 8 : (v + 1) * 8, :]
                    for sh in (1, 2, 4):
                        s = s + jnp.where(
                            sub8 >= sh, pltpu.roll(s, sh, axis=0), 0.0
                        )
                    s = s + jnp.broadcast_to(carry, (8, LANES))
                    carry = s[7:8, :]
                    parts.append(s)
                pv = jnp.concatenate(parts, axis=0)
                lane_tot = carry
                li = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                t = lane_tot
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    t = t + jnp.where(li >= sh, pltpu.roll(t, sh, axis=1), 0.0)
                lane_excl = t - lane_tot
            else:  # none
                pv = prod
                lane_excl = prod[0:1, :]
            lane_excl_b = jnp.broadcast_to(lane_excl, (8, LANES))

            rs = meta_ref[b, 0]
            if window:
                a_off = rs & (LANES - 1)
                w_groups = []
                for g in range(G):
                    wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                    ws = wm & 0xFFFF
                    wl = (wm >> 16) & (K.LANES - 1)
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
                # fold all pv rows + win data so DMAs and reads survive DCE
                acc8 = jnp.zeros((8, LANES), jnp.float32)
                for v in range(sigma // 8):
                    acc8 = acc8 + pv[v * 8 : (v + 1) * 8, :]
                wsum = jnp.zeros((1, LANES), jnp.float32)
                for g in range(G):
                    wsum = wsum + win_ref[
                        pl.ds(b, 1), pl.ds(g * LANES, LANES)
                    ].astype(jnp.float32)
                W2 = acc8[0:G] + jnp.broadcast_to(wsum, (G, LANES)) * 1e-30
                W2 = W2 + lane_excl_b[0:G]

            by = rs >> 7
            y_ref[pl.ds(by, G), :] += W2

        @pl.when(i == pl.num_programs(0) - 1)
        def _flush():
            cp = pltpu.make_async_copy(y_ref, out_ref, sem)
            cp.start()
            cp.wait()

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
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((m_pad // LANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
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
    print("building matrix...", flush=True)
    a_sp = synth.banded(500_000, 27, dtype=np.float32).tocsr()

    def build(sigma, tpb=32):
        return build_csr5(
            (a_sp.indptr, a_sp.indices, a_sp.data, a_sp.shape),
            CSR5Config(sigma=sigma, tiles_per_block=tpb),
        )

    a5 = build(24)
    print(
        f"p={a5.num_tiles} sigma={a5.sigma} capw={a5.capw} pmax={a5.pmax}",
        flush=True,
    )
    nnz_bytes = a5.num_tiles * a5.sigma * 128 * 8
    print(f"roofline(819GB/s) = {nnz_bytes/819e9*1e6:.0f} us", flush=True)

    def xfor(a5v):
        xx = jnp.zeros(a5v.n_pad + LANES, jnp.float32).at[: a5v.n].set(
            jnp.asarray(synth.dense_x(a_sp.shape[1], dtype=np.float32))
        )
        return xx.reshape(-1, LANES)

    x2d = xfor(a5)
    cases = [
        ("full (mxu scans)", dict()),
        ("scan=mxu-default", dict(scan="mxu-default")),
        ("scan=roll", dict(scan="roll")),
        ("scan=none", dict(scan="none")),
        ("no-window", dict(window=False)),
        ("no-gather", dict(gather=False)),
        ("stream-only", dict(gather=False, scan="none", window=False)),
        ("B=8", dict(B=8)),
        ("B=32 explicit", dict(B=32)),
    ]
    for name, kw in cases:
        try:
            run = make_variant(a5, **kw)
            ms = device_loop_time(run, x2d)
            print(
                f"{name:18s} {ms:8.3f} ms   {nnz_bytes/ms/1e6:7.1f} GB/s",
                flush=True,
            )
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    for sig in (16, 32):
        try:
            a5v = build(sig)
            runv = make_variant(a5v)
            ms = device_loop_time(runv, xfor(a5v))
            nb = a5v.num_tiles * a5v.sigma * 128 * 8
            print(
                f"full sigma={sig:2d}     {ms:8.3f} ms   {nb/ms/1e6:7.1f} GB/s",
                flush=True,
            )
        except Exception as e:
            print(f"sigma={sig} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
