"""Bisect why the real CSR5 kernel streams at 150 GB/s while the bare
probe kernel hits 798 GB/s. Adds real-kernel features one at a time."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
LANES = 128
HDR = 8


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


P, SIGMA, B, PMAX, CAPW = 4576, 24, 32, 4, 256
MW = 128
G = CAPW // LANES
MROWS = 4096  # y rows (m_pad/128)
NP1 = 3908 + 1  # x rows


def make(level):
    """level: 0=bare stream+gather, 1=+whole-y out w/ static RMW,
    2=+win input, 3=+dyn-offset y RMW, 4=+window extraction, 5=+scan."""

    def kernel(*refs):
        if level >= 2:
            meta_ref, col_ref, val_ref, win_ref, x_ref, y_ref = refs
        else:
            meta_ref, col_ref, val_ref, x_ref, y_ref = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        if level >= 5:
            lt_s = (
                jax.lax.broadcasted_iota(jnp.int32, (SIGMA, SIGMA), 1)
                <= jax.lax.broadcasted_iota(jnp.int32, (SIGMA, SIGMA), 0)
            ).astype(jnp.float32)
            ltx = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            ).astype(jnp.float32)

        for b in range(B):
            col = col_ref[pl.ds(b * SIGMA, SIGMA), :]
            val = val_ref[pl.ds(b * SIGMA, SIGMA), :]
            lane = col & (LANES - 1)
            page_of = col >> 7
            xg = jnp.zeros((SIGMA, LANES), jnp.float32)
            for k in range(PMAX):
                pid = meta_ref[b, HDR + k]
                xrow = x_ref[pl.ds(pid, 1), :]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(xrow, (SIGMA, LANES)), lane, axis=1
                )
                xg = xg + jnp.where(page_of == pid, g, 0.0)
            prod = val * xg

            if level >= 5:
                pv = jax.lax.dot_general(
                    lt_s, prod, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                lane_tot = pv[SIGMA - 1 : SIGMA, :]
                lane_excl = jax.lax.dot_general(
                    lane_tot, ltx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                pv = prod
                lane_excl = prod[0:1]
            lane_excl_b = jnp.broadcast_to(lane_excl, (8, LANES))

            if level >= 4:
                rs = meta_ref[b, 0]
                a_off = rs & (LANES - 1)
                w_groups = []
                for g in range(G):
                    wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                    ws = wm & 0xFFFF
                    wl = (wm >> 16) & 127  # wrap-flag bits live at 23/24
                    R1 = jnp.take_along_axis(
                        pv, jnp.broadcast_to(wl, (SIGMA, LANES)), axis=1
                    )
                    idx8 = jnp.broadcast_to(ws & 7, (8, LANES))
                    out = jnp.zeros((1, LANES), jnp.float32)
                    for c in range(SIGMA // 8):
                        chunk = R1[c * 8 : (c + 1) * 8, :]
                        gg = jnp.take_along_axis(chunk, idx8, axis=0)[0:1]
                        out = jnp.where((ws >> 3) == c, gg, out)
                    cl = jnp.take_along_axis(
                        lane_excl_b, jnp.broadcast_to(wl, (8, LANES)), axis=1
                    )[0:1]
                    w_groups.append(out + cl)
                W_end = jnp.concatenate(w_groups, axis=0)
                rolled = pltpu.roll(W_end, 1, axis=1)
                down = pltpu.roll(W_end, 1, axis=0)
                li = jax.lax.broadcasted_iota(jnp.int32, W_end.shape, 1)
                si = jax.lax.broadcasted_iota(jnp.int32, W_end.shape, 0)
                W_prev = jnp.where(li == 0, pltpu.roll(down, 1, axis=1), rolled)
                d_idx = si * LANES + li
                W_prev = jnp.where(d_idx - 1 >= a_off, W_prev, 0.0)
                W2 = jnp.where(d_idx >= a_off, W_end - W_prev, 0.0)
            else:
                W2 = sum(pv[v * 8 : v * 8 + 8] for v in range(SIGMA // 8))[0:G]
                W2 = jnp.concatenate([W2, W2], axis=0)[:G] + lane_excl_b[0:G]
            if level >= 4 and level >= 2:
                pass
            if level >= 3:
                rs3 = meta_ref[b, 0]
                y_ref[pl.ds(rs3 >> 7, G), :] += W2
            else:
                y_ref[pl.ds(0, G), :] += W2

    in_specs = [
        pl.BlockSpec((B, MW), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B * SIGMA, LANES), lambda i: (i, 0)),
        pl.BlockSpec((B * SIGMA, LANES), lambda i: (i, 0)),
    ]
    if level >= 2:
        in_specs.append(pl.BlockSpec((B, CAPW), lambda i: (i, 0)))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    if level >= 1:
        out_shape = jax.ShapeDtypeStruct((MROWS, LANES), jnp.float32)
        out_spec = pl.BlockSpec((MROWS, LANES), lambda i: (0, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((8, LANES), jnp.float32)
        out_spec = pl.BlockSpec((8, LANES), lambda i: (0, 0))

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(P // B,),
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
    )

    rng = np.random.default_rng(0)
    first = rng.integers(0, NP1 - 1 - PMAX, size=P)
    meta = np.zeros((P, MW), np.int32)
    meta[:, 0] = np.minimum(np.arange(P) * 100 % (MROWS * 128 - CAPW), MROWS * 128 - CAPW)
    meta[:, 1] = 3
    for k in range(PMAX):
        meta[:, HDR + k] = np.minimum(first + k, NP1 - 2) if k < 3 else NP1 - 1
    cols = (
        first[:, None, None] * 128
        + rng.integers(0, 3 * 128, size=(P, SIGMA, LANES))
    ).astype(np.int32)
    win = (
        rng.integers(0, SIGMA, size=(P, CAPW)).astype(np.int32)
        | (rng.integers(0, LANES, size=(P, CAPW)).astype(np.int32) << 16)
    )
    metad = jnp.asarray(meta)
    cold = jnp.asarray(cols.reshape(P * SIGMA, LANES))
    vald = jnp.asarray(rng.standard_normal((P * SIGMA, LANES)).astype(np.float32))
    wind = jnp.asarray(win)

    if level >= 2:
        fn = lambda x: call(metad, cold, vald, wind, x)  # noqa: E731
    else:
        fn = lambda x: call(metad, cold, vald, x)  # noqa: E731
    return fn


def main():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((NP1, LANES)).astype(np.float32))
    nbytes = P * SIGMA * LANES * 8
    names = [
        "0 bare (small out)",
        "1 +whole-y out",
        "2 +win input",
        "3 +dyn y RMW",
        "4 +window extract",
        "5 +mxu scans (full)",
    ]
    for lvl, name in enumerate(names):
        try:
            fn = make(lvl)
            ms = device_loop_time(fn, x)
            print(f"{name:24s} {ms:8.3f} ms  {nbytes/ms/1e6:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
