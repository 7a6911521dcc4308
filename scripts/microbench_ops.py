"""Per-op cost microbenchmarks inside a Pallas TPU kernel.

Measures take_along_axis lane-gather, sublane taa, rolls, dynamic-slice
loads, fori_loop overhead, and SMEM scalar reads, to budget the CSR5
kernel. Run: python scripts/microbench_ops.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANES = 128
REPS = 2000  # inner repeats per kernel invocation
SIGMA = 24


def _force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def run_case(name, body, n_ops_per_rep):
    """body(t, aux) -> t, repeated REPS times inside one kernel."""

    def kernel(x_ref, idx_ref, o_ref):
        t = x_ref[:]
        idx = idx_ref[:]
        for r in range(REPS):
            t = body(t, idx, r)
        o_ref[:] = t

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SIGMA, LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.ones((SIGMA, LANES), jnp.float32)
    idx = jnp.tile(jnp.arange(LANES, dtype=jnp.int32)[None, :], (SIGMA, 1))
    f = jax.jit(lambda a, b: call(a, b))
    _force(f(x, idx))
    t0 = time.perf_counter()
    _force(f(x, idx))
    dt = time.perf_counter() - t0
    ns = dt / REPS * 1e9
    cyc = ns * 0.94  # v5e ~940 MHz
    print(f"{name:42s} {ns:9.1f} ns/op  (~{cyc:7.0f} cyc)", flush=True)


def main():
    print(f"shape=({SIGMA},{LANES}) f32, reps={REPS}", flush=True)

    run_case(
        "add (sigma,128)",
        lambda t, idx, r: t + jnp.float32(r),
        1,
    )
    run_case(
        "mul+add (fma) (sigma,128)",
        lambda t, idx, r: t * 1.0001 + jnp.float32(r),
        1,
    )
    run_case(
        "taa lanes (sigma,128) self",
        lambda t, idx, r: jnp.take_along_axis(t, (idx + r) & 127, axis=1),
        1,
    )
    run_case(
        "taa lanes from bcast (1,128)->(sigma,128)",
        lambda t, idx, r: jnp.take_along_axis(
            jnp.broadcast_to(t[0:1, :], (SIGMA, LANES)), (idx + r) & 127, axis=1
        ),
        1,
    )
    run_case(
        "roll axis1 (sigma,128)",
        lambda t, idx, r: pltpu.roll(t, 1, axis=1),
        1,
    )
    run_case(
        "roll axis0 (sigma,128)",
        lambda t, idx, r: pltpu.roll(t, 1, axis=0),
        1,
    )
    run_case(
        "where-select (sigma,128)",
        lambda t, idx, r: jnp.where(idx > r, t, t * 2.0),
        1,
    )
    run_case(
        "taa sublanes dom8 (8,128)",
        lambda t, idx, r: t.at[0:8].set(
            jnp.take_along_axis(t[0:8], (idx[0:8] + r) & 7, axis=0)
        ),
        1,
    )

    # fori_loop overhead: same taa inside a dynamic loop of 1 iteration
    def loop_body(t, idx, r):
        def inner(k, acc):
            return acc + jnp.take_along_axis(
                jnp.broadcast_to(acc[0:1, :], (SIGMA, LANES)), idx & 127, axis=1
            )
        return jax.lax.fori_loop(0, 1, inner, t)

    run_case("fori_loop(1) of taa+add", loop_body, 1)

    def loop_body3(t, idx, r):
        def inner(k, acc):
            return acc + jnp.take_along_axis(
                jnp.broadcast_to(acc[0:1, :], (SIGMA, LANES)), idx & 127, axis=1
            )
        return jax.lax.fori_loop(0, 3, inner, t)

    run_case("fori_loop(3) of taa+add", loop_body3, 3)

    # dynamic-slice VMEM load at scalar index
    def kernel_ds(x_ref, i_ref, o_ref):
        acc = jnp.zeros((1, LANES), jnp.float32)
        for r in range(REPS):
            acc = acc + x_ref[pl.ds((i_ref[0] + r) % 1000, 1), :]
        o_ref[:] = acc

    call = pl.pallas_call(
        kernel_ds,
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    xbig = jnp.ones((1024, LANES), jnp.float32)
    i0 = jnp.zeros((1,), jnp.int32)
    f = jax.jit(lambda a, b: call(a, b))
    _force(f(xbig, i0))
    t0 = time.perf_counter()
    _force(f(xbig, i0))
    ns = (time.perf_counter() - t0) / REPS * 1e9
    print(f"{'dynamic-slice (1,128) load+add':42s} {ns:9.1f} ns/op  (~{ns*0.94:7.0f} cyc)", flush=True)


if __name__ == "__main__":
    main()
