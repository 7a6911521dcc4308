"""Empirical TPU capability + throughput probes that decide the CSR5 kernel design.

Run on the real chip: python scripts/probe_tpu.py
Findings get recorded in NOTES.md.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())
DEV = jax.devices()[0]


def bench(fn, *args, n=20, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


NNZ = 1 << 23  # 8M
N = 1 << 20  # 1M
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N,), jnp.float32)
idx_rand = jax.random.randint(key, (NNZ,), 0, N, jnp.int32)
idx_sorted = jnp.sort(idx_rand)
val = jax.random.normal(key, (NNZ,), jnp.float32)

# ---- P1: XLA take -----------------------------------------------------------
take = jax.jit(lambda x, i: jnp.take(x, i))
try:
    ms = bench(take, x, idx_rand)
    print(f"P1a XLA take random:  {ms:8.3f} ms  -> {NNZ*8/ms/1e6:8.1f} GB/s(eff idx+out)")
    ms = bench(take, x, idx_sorted)
    print(f"P1b XLA take sorted:  {ms:8.3f} ms  -> {NNZ*8/ms/1e6:8.1f} GB/s")
except Exception as e:
    print("P1 take FAILED:", repr(e)[:200])

# fused take+mul+segsumish
fused = jax.jit(lambda v, x, i: v * jnp.take(x, i))
ms = bench(fused, val, x, idx_rand)
print(f"P1c take*val fused:   {ms:8.3f} ms  -> {NNZ*12/ms/1e6:8.1f} GB/s(v+i+out)")

# ---- P2: cumsum -------------------------------------------------------------
cs = jax.jit(jnp.cumsum)
ms = bench(cs, val)
print(f"P2  XLA cumsum 8M:    {ms:8.3f} ms  -> {NNZ*8/ms/1e6:8.1f} GB/s(in+out)")

# ---- P3: segment_sum sorted -------------------------------------------------
M = 1 << 20
rows_sorted = jnp.sort(jax.random.randint(key, (NNZ,), 0, M, jnp.int32))
ss = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=M, indices_are_sorted=True))
try:
    ms = bench(ss, val, rows_sorted)
    print(f"P3  segment_sum:      {ms:8.3f} ms  -> {NNZ*8/ms/1e6:8.1f} GB/s")
except Exception as e:
    print("P3 segment_sum FAILED:", repr(e)[:200])

# ---- P5A: pallas in-kernel gather via ref[vector_idx] ----------------------
SIG, OM = 8, 128


def k_gather_a(x_ref, idx_ref, o_ref):
    o_ref[:] = x_ref[idx_ref[:]]


def try_pallas(name, kernel, out_shape, in_specs, *args, grid=None, interpret=False):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=grid,
        ) if grid else pl.pallas_call(
            kernel, out_shape=out_shape, in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        fn = jax.jit(fn)
        out = jax.block_until_ready(fn(*args))
        print(f"{name}: OK, out[0:2]={np.asarray(out).ravel()[:2]}")
        return fn
    except Exception as e:
        print(f"{name}: FAILED: {repr(e)[:300]}")
        return None


xs = x[: 1 << 16]
idx_small = idx_rand[: SIG * OM] % xs.shape[0]
try_pallas(
    "P5a ref[vec_idx] 1D",
    k_gather_a,
    jax.ShapeDtypeStruct((SIG * OM,), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    xs,
    idx_small,
)


def k_gather_b(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], idx_ref[:])


try_pallas(
    "P5b jnp.take 1D in-kernel",
    k_gather_b,
    jax.ShapeDtypeStruct((SIG * OM,), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    xs,
    idx_small,
)

# 2D block shaped
idx2 = (idx_rand[: SIG * OM].reshape(SIG, OM)) % (1 << 16)
x2 = x[: 1 << 16].reshape(512, 128)


def k_gather_c(x_ref, idx_ref, o_ref):
    flat_idx = idx_ref[:]
    r = flat_idx // 128
    c = flat_idx % 128
    o_ref[:] = x_ref[r, c]


try_pallas(
    "P5c x2d[r,c] vec index",
    k_gather_c,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2,
    idx2,
)


def k_gather_d(x_ref, idx_ref, o_ref):
    # take_along_axis within block along lanes: idx in [0,128)
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:] % 128, axis=1)


try_pallas(
    "P5d take_along_axis lanes",
    k_gather_d,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec((SIG, OM), memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2[:SIG],
    idx2,
)


def k_gather_e(x_ref, idx_ref, o_ref):
    # take_along_axis along sublanes (axis=0) with per-lane row indices
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:] % 512, axis=0)


try_pallas(
    "P5e take_along_axis sublanes (512 rows)",
    k_gather_e,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2,
    idx2,
)


def k_gather_f(x_ref, idx_ref, o_ref):
    # full gather: x (65536,) 1D reshaped in VMEM (512,128); per-element
    # arbitrary: row then lane. two-step: first gather rows per lane? direct:
    o_ref[:] = x_ref[idx_ref[:] // 128, idx_ref[:] % 128]


# P6: dynamic slice at scalar index
def k_dynslice(x_ref, i_ref, o_ref):
    i = i_ref[0]
    o_ref[:] = x_ref[pl.ds(i * 8, 8), :]


try_pallas(
    "P6 dyn slice scalar idx",
    k_dynslice,
    jax.ShapeDtypeStruct((8, 128), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
    x2,
    jnp.array([3], jnp.int32),
)

# P7: f64
try:
    y64 = jnp.asarray(np.arange(8.0))
    print("P7 default dtype:", y64.dtype)
    from jax import config as jcfg
    out = jax.jit(lambda a: a * 2.0)(jnp.float64(3.0) if False else y64)
    print("P7 f64 basic ok:", out.dtype)
except Exception as e:
    print("P7 f64 FAILED:", repr(e)[:200])

# P8: roll-based scans inside pallas (log-step scan along sublanes+lanes)
def k_scan(p_ref, o_ref):
    t = p_ref[:]
    # inclusive cumsum along axis 0 (sublanes) via log shifts
    sig = t.shape[0]
    s = 1
    while s < sig:
        t = t + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) >= s,
            pltpu.roll(t, s, axis=0), 0.0)
        s *= 2
    o_ref[:] = t


try_pallas(
    "P8 roll-scan sublanes",
    k_scan,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2[:SIG],
)

# P9: cumsum direct in kernel
def k_cumsum(p_ref, o_ref):
    o_ref[:] = jnp.cumsum(p_ref[:], axis=0)

try_pallas(
    "P9 jnp.cumsum axis0 in-kernel",
    k_cumsum,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2[:SIG],
)

def k_cumsum1(p_ref, o_ref):
    o_ref[:] = jnp.cumsum(p_ref[:], axis=1)

try_pallas(
    "P9b jnp.cumsum axis1(lanes) in-kernel",
    k_cumsum1,
    jax.ShapeDtypeStruct((SIG, OM), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM)],
    x2[:SIG],
)
