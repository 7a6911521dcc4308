"""Probe kernel-v2 building blocks on the real TPU.

1. SMEM blocked input via BlockSpec index_map
2. MXU matmul (sigma,sigma)@(sigma,128) prefix-scan inside Pallas
3. static masked page-unroll gather cost vs fori_loop
Timing: device fori_loop around the pallas call (dispatch floor ~1.5ms).
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
LANES = 128


def _force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def device_loop_time(call_fn, args, iters=30):
    """ms per call via on-device sequential loop (subtracts 1-iter run).

    The last arg is perturbed by a zero-scaled function of the previous
    iteration's output so XLA cannot CSE the repeated calls.
    """

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(args, k):
        *rest, last = args

        def body(_, carry):
            acc, lastc = carry
            out = call_fn(*rest, lastc)
            acc = acc + out.ravel()[0]
            return acc, last + acc.astype(last.dtype) * 0

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), last))
        return acc

    _force(run(args, iters))
    t0 = time.perf_counter()
    _force(run(args, iters))
    t_full = time.perf_counter() - t0
    _force(run(args, 1))
    t0 = time.perf_counter()
    _force(run(args, 1))
    t_one = time.perf_counter() - t0
    return max(t_full - t_one, 1e-9) / (iters - 1) * 1e3


# ---- 1. SMEM blocked input ------------------------------------------------
def probe_smem_block():
    B, MW, G = 32, 128, 64

    def kernel(meta_ref, o_ref):
        o_ref[0, 0] = jnp.float32(meta_ref[0, 0] + meta_ref[B - 1, 1])

    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid=(G,),
            in_specs=[pl.BlockSpec((B, MW), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
        )
        meta = jnp.arange(G * B * MW, dtype=jnp.int32).reshape(G * B, MW)
        out = jax.jit(lambda m: call(m))(meta)
        v = float(np.asarray(jax.device_get(out))[0, 0])
        exp = float(meta[(G - 1) * B, 0] + meta[G * B - 1, 1])
        print(f"SMEM blocked input: OK (last step val {v}, expect {exp})",
              flush=True)
        return True
    except Exception as e:
        print(f"SMEM blocked input: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False


# ---- 2. MXU prefix matmul --------------------------------------------------
def probe_mxu_scan(sigma=24):
    def kernel(a_ref, lt_ref, o_ref):
        prod = a_ref[:]
        lt = lt_ref[:]
        pv = jax.lax.dot_general(
            lt, prod, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = pv

    try:
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((sigma, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        a = jnp.ones((sigma, LANES), jnp.float32)
        lt = jnp.tril(jnp.ones((sigma, sigma), jnp.float32))
        out = np.asarray(jax.device_get(jax.jit(lambda a, lt: call(a, lt))(a, lt)))
        ok = np.allclose(out[:, 0], np.arange(1, sigma + 1))
        print(f"MXU ({sigma},{sigma})@({sigma},128) scan: "
              f"{'OK' if ok else 'WRONG VALUES'}", flush=True)
        return ok
    except Exception as e:
        print(f"MXU scan: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


# ---- 3. gather strategies over a realistic tile stream ---------------------
def gather_kernel_variant(mode, P, SIGMA, PMAX, B):
    HDR = 8
    MW = 128

    def kernel(meta_ref, col_ref, val_ref, x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        tot = jnp.zeros((8, LANES), jnp.float32)
        for b in range(B):
            col = col_ref[pl.ds(b * SIGMA, SIGMA), :]
            val = val_ref[pl.ds(b * SIGMA, SIGMA), :]
            lane = col & (LANES - 1)
            page_of = col >> 7
            if mode == "unroll":
                acc = jnp.zeros((SIGMA, LANES), jnp.float32)
                for k in range(PMAX):
                    pid = meta_ref[b, HDR + k]
                    xrow = x_ref[pl.ds(pid, 1), :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(xrow, (SIGMA, LANES)), lane, axis=1)
                    acc = acc + jnp.where(page_of == pid, g, 0.0)
            elif mode == "fori":
                cnt = meta_ref[b, 1]

                def body(k, a):
                    pid = meta_ref[b, HDR + k]
                    xrow = x_ref[pl.ds(pid, 1), :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(xrow, (SIGMA, LANES)), lane, axis=1)
                    return a + jnp.where(page_of == pid, g, 0.0)

                acc = jax.lax.fori_loop(
                    0, cnt, body, jnp.zeros((SIGMA, LANES), jnp.float32))
            else:  # none
                acc = jnp.float32(1.0)
            prod = val * acc
            for v in range(SIGMA // 8):  # consume every row (defeat DCE)
                tot = tot + prod[v * 8 : v * 8 + 8, :]
        o_ref[:] += tot

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec((B, MW), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B * SIGMA, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B * SIGMA, LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def probe_gather(sigma=24, pmax=4, B=32, p=4576):
    rng = np.random.default_rng(0)
    npages = 4000
    # realistic banded tile: 3 consecutive pages per tile
    first = rng.integers(0, npages - pmax, size=p)
    meta = np.zeros((p, 128), np.int32)
    meta[:, 0] = 0
    meta[:, 1] = 3
    for k in range(pmax):
        meta[:, 8 + k] = np.minimum(first + k, npages - 1) if k < 3 else npages
    cols = (first[:, None, None] * 128
            + rng.integers(0, 3 * 128, size=(p, sigma, LANES))).astype(np.int32)
    x = rng.standard_normal((npages + 1, LANES)).astype(np.float32)
    vals = rng.standard_normal((p * sigma, LANES)).astype(np.float32)

    metad = jnp.asarray(meta)
    cold = jnp.asarray(cols.reshape(p * sigma, LANES))
    vald = jnp.asarray(vals)
    xd = jnp.asarray(x)

    nbytes = p * sigma * LANES * 8
    for mode in ("none", "unroll", "fori"):
        try:
            call = gather_kernel_variant(mode, p, sigma, pmax, B)
            ms = device_loop_time(lambda m, c, v, x: call(m, c, v, x),
                                  (metad, cold, vald, xd))
            print(f"gather[{mode:7s}] pmax={pmax}: {ms:8.3f} ms "
                  f"({nbytes/ms/1e6:6.1f} GB/s stream)", flush=True)
        except Exception as e:
            print(f"gather[{mode}]: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    ok_smem = probe_smem_block()
    probe_mxu_scan(24)
    probe_mxu_scan(8)
    if ok_smem:
        probe_gather()
