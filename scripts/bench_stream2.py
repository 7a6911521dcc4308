"""Isolate the Pallas streaming cap: XLA vs Pallas variants."""

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


def timeit(f, *args, reps=20):
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps * 1e3


ROWS = 114688  # 56 MB per f32 plane
a = jnp.ones((ROWS, LANES), jnp.float32)
b = jnp.ones((ROWS, LANES), jnp.float32) * 2


def report(name, ms, nbytes):
    print(f"{name:44s} {ms:8.3f} ms {nbytes/ms/1e6:7.1f} GB/s", flush=True)


# XLA ceilings
ms = timeit(jax.jit(lambda a: jnp.sum(a, axis=0)), a)
report("XLA sum axis0 1 plane (read 56MB)", ms, ROWS * 128 * 4)
ms = timeit(jax.jit(lambda a, b: jnp.sum(a + b, axis=0)), a, b)
report("XLA sum(a+b) 2 planes (read 112MB)", ms, 2 * ROWS * 128 * 4)
ms = timeit(jax.jit(lambda a, b: a + b), a, b)
report("XLA a+b (read 112MB write 56MB)", ms, 3 * ROWS * 128 * 4)


def make(rows_per_block, two_inputs, out_per_step, semantics):
    g = ROWS // rows_per_block

    if two_inputs:
        def kernel(a_ref, b_ref, o_ref):
            s = jnp.sum(a_ref[:], axis=0, keepdims=True) + jnp.sum(
                b_ref[:], axis=0, keepdims=True)
            if out_per_step:
                o_ref[:] = s
            else:
                o_ref[:] = s
        in_specs = [
            pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
        ]
        args = (a, b)
        nbytes = 2 * ROWS * 128 * 4
    else:
        def kernel(a_ref, o_ref):
            o_ref[:] = jnp.sum(a_ref[:], axis=0, keepdims=True)
        in_specs = [pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0))]
        args = (a,)
        nbytes = ROWS * 128 * 4

    if out_per_step:
        out_shape = jax.ShapeDtypeStruct((g, LANES), jnp.float32)
        out_spec = pl.BlockSpec((1, LANES), lambda i: (i, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((1, LANES), jnp.float32)
        out_spec = pl.BlockSpec((1, LANES), lambda i: (0, 0))

    kwargs = {}
    if semantics:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))
    call = pl.pallas_call(
        kernel, out_shape=out_shape, grid=(g,), in_specs=in_specs,
        out_specs=out_spec, **kwargs)
    if two_inputs:
        f = jax.jit(lambda a, b: call(a, b))
    else:
        f = jax.jit(lambda a: call(a))
    return f, args, nbytes


for desc, rows, two, ops, sem in [
    ("pallas 1-input 1.5MB blk, out fixed", 3072, False, False, None),
    ("pallas 1-input 1.5MB blk, out per-step", 3072, False, True, None),
    ("pallas 2-input 1.5MB blk, out fixed", 3072, True, False, None),
    ("pallas 2-input 1.5MB blk, out per-step", 3072, True, True, None),
    ("pallas 2-input 1.5MB blk, arbitrary", 3072, True, True, "arbitrary"),
    ("pallas 1-input 6MB blk, out per-step", 12288, False, True, None),
    ("pallas 1-input 0.75MB blk, out per-step", 1536, False, True, None),
]:
    try:
        f, args, nbytes = make(rows, two, ops, sem)
        ms = timeit(f, *args)
        report(desc, ms, nbytes)
    except Exception as e:
        print(f"{desc:44s} FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
