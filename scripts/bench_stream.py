"""Pallas HBM streaming ceiling vs block size + per-step overhead probes.

Establishes the speed-of-light for a sequential-grid kernel that reads two
f32 planes (val+col analogue) per step. Run: python scripts/bench_stream.py
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
TOTAL_MB = 112  # match banded500k val+col footprint


def _force(x):
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def bench(rows_per_block, with_meta, mw=128, reps=20):
    total_rows = TOTAL_MB * 1024 * 1024 // 2 // (LANES * 4)
    total_rows = (total_rows // rows_per_block) * rows_per_block
    g = total_rows // rows_per_block
    nbytes = 2 * total_rows * LANES * 4

    if with_meta:
        def kernel(meta_hbm, a_ref, b_ref, o_ref, meta_smem, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(
                meta_hbm.at[pl.ds(i * 32, 32), :], meta_smem, sem)
            cp.start()
            cp.wait()
            o_ref[:] = (
                jnp.sum(a_ref[:], axis=0, keepdims=True)[0:1]
                + jnp.sum(b_ref[:], axis=0, keepdims=True)[0:1]
                + jnp.float32(meta_smem[0, 0])
            )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
                pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0)),
            scratch_shapes=[
                pltpu.SMEM((32, mw), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        meta = jnp.zeros((g * 32, mw), jnp.int32)
        a = jnp.ones((total_rows, LANES), jnp.float32)
        f = jax.jit(lambda m, a: call(m, a, a))
        args = (meta, a)
    else:
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = (
                jnp.sum(a_ref[:], axis=0, keepdims=True)[0:1]
                + jnp.sum(b_ref[:], axis=0, keepdims=True)[0:1]
            )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
                pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0)),
        )
        a = jnp.ones((total_rows, LANES), jnp.float32)
        f = jax.jit(lambda a: call(a, a))
        args = (a,)

    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _force(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    gbps = nbytes / ms / 1e6
    us_per_step = ms * 1e3 / g
    blk_kb = rows_per_block * LANES * 4 / 1024
    print(
        f"block={blk_kb:7.0f} KB x2  meta={with_meta!s:5s} steps={g:5d}  "
        f"{ms:8.3f} ms  {gbps:7.1f} GB/s  {us_per_step:6.2f} us/step",
        flush=True,
    )


def main():
    for rows in (768, 1536, 3072, 6144, 12288, 24576):
        bench(rows, with_meta=False)
    print("-- with per-step blocking meta DMA (32x128 i32) --")
    for rows in (768, 3072, 12288):
        bench(rows, with_meta=True)


if __name__ == "__main__":
    main()
