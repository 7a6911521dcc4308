"""Round-2 probes: exact in-kernel gather support, HBM-scale throughput, f64."""
import time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

d = jax.devices()[0]
print("device:", d, getattr(d, "device_kind", None))
try:
    print("memory_stats:", {k: v for k, v in d.memory_stats().items() if "bytes" in k})
except Exception as e:
    print("memory_stats unavailable", e)

print([n for n in dir(pltpu) if "gath" in n.lower() or "scat" in n.lower() or "sort" in n.lower()])

def bench(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

key = jax.random.PRNGKey(0)

# ---- HBM-scale take / segment_sum / cumsum (nnz = 128M, n = 4M) ----
NNZ = 1 << 27
N = 1 << 22
M = N
x = jax.random.normal(key, (N,), jnp.float32)
idx = jax.random.randint(key, (NNZ,), 0, N, jnp.int32)
val = jax.random.normal(key, (NNZ,), jnp.float32)
take = jax.jit(lambda x, i: jnp.take(x, i))
ms = bench(take, x, idx)
print(f"H1 take 128M idx from 4M x: {ms:.3f} ms -> {NNZ/ms/1e6:.1f} Gelem/s, eff BW {(NNZ*8)/ms/1e6:.0f} GB/s")
# big x (256M, exceeds VMEM)
N2 = 1 << 26
x2 = jax.random.normal(key, (N2,), jnp.float32)
idx2 = jax.random.randint(key, (NNZ,), 0, N2, jnp.int32)
ms = bench(take, x2, idx2)
print(f"H2 take 128M idx from 64M x: {ms:.3f} ms -> {NNZ/ms/1e6:.1f} Gelem/s")
cs = jax.jit(jnp.cumsum)
ms = bench(cs, val)
print(f"H3 cumsum 128M: {ms:.3f} ms -> {(NNZ*8)/ms/1e6:.0f} GB/s")
rows = jnp.sort(jax.random.randint(key, (NNZ,), 0, M, jnp.int32))
ss = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=M, indices_are_sorted=True))
ms = bench(ss, val, rows)
print(f"H4 segment_sum 128M->4M sorted: {ms:.3f} ms -> {NNZ/ms/1e6:.1f} Gelem/s")
# oracle-style spmv at scale: take+mul+segsum
spmv = jax.jit(lambda v, x, c, r: jax.ops.segment_sum(v * jnp.take(x, c), r, num_segments=M, indices_are_sorted=True))
ms = bench(spmv, val, x, idx, rows)
bytes_model = (M + 1 + NNZ) * 4 + (2 * NNZ + M) * 4
print(f"H5 oracle spmv 128M: {ms:.3f} ms -> {NNZ*2/ms/1e6:.1f} GFLOPS, model {bytes_model/ms/1e6:.0f} GB/s")
# scan-formulation spmv
rp = jnp.concatenate([jnp.searchsorted(rows, jnp.arange(M, dtype=jnp.int32)).astype(jnp.int32), jnp.array([NNZ], jnp.int32)])
def spmv_scan(v, x, c, rp):
    prod = v * jnp.take(x, c)
    pre = jnp.cumsum(prod)
    pre = jnp.concatenate([jnp.zeros((1,), pre.dtype), pre])
    return pre[rp[1:]] - pre[rp[:-1]]
spmv_scan_j = jax.jit(spmv_scan)
ms = bench(spmv_scan_j, val, x, idx, rp)
print(f"H6 scan spmv 128M: {ms:.3f} ms -> {NNZ*2/ms/1e6:.1f} GFLOPS, model {bytes_model/ms/1e6:.0f} GB/s")

# ---- exact gather forms in Pallas ----
def try_pallas(name, kernel, out_shape, n_in, *args):
    try:
        fn = jax.jit(pl.pallas_call(
            kernel, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = jax.block_until_ready(fn(*args))
        print(f"{name}: OK {np.asarray(out).ravel()[:2]}")
        return fn
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:260]}")

xb = jax.random.normal(key, (512, 128), jnp.float32)
idx8 = jax.random.randint(key, (8, 128), 0, 8, jnp.int32)
idx512 = jax.random.randint(key, (8, 128), 0, 512, jnp.int32)

def k_taa0_small(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
try_pallas("G1 taa axis0 operand(8,128) idx(8,128)<8", k_taa0_small,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), 2, xb[:8], idx8)

def k_taa0_32(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] % 32, axis=0)
try_pallas("G2 taa axis0 operand(32,128)", k_taa0_32,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), 2, xb[:32], idx8)
# hmm shapes must match for taa: idx (8,128), operand (32,128) -> out (8,128)? taa requires same shape except axis. ok.

def k_lax_gather_rows(x_ref, i_ref, o_ref):
    # gather whole rows: out[i, :] = x[idx[i], :]
    idxv = i_ref[0, :8]  # 8 indices
    o_ref[:] = x_ref[idxv, :]
try_pallas("G3 row gather x[idxvec,:]", k_lax_gather_rows,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), 2, xb, idx512)

def k_taa_big_axis0(x_ref, i_ref, o_ref):
    # operand (512,128), idx (512,128) -> along axis 0
    big_idx = jnp.broadcast_to(i_ref[:], (8, 128))
    full_idx = jnp.zeros((512, 128), jnp.int32).at[:8].set(big_idx)
    o_ref[:] = jnp.take_along_axis(x_ref[:], full_idx, axis=0)[:8]
try_pallas("G4 taa axis0 operand(512,128) full idx", k_taa_big_axis0,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), 2, xb, idx512)

def k_onehot_dot(x_ref, i_ref, o_ref):
    # gather via one-hot matmul from (128,) domain
    xrow = x_ref[0:1, :]  # (1,128)
    oh = (i_ref[:][:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2))
    o_ref[:] = jnp.sum(jnp.where(oh, xrow[0][None, None, :], 0.0), axis=2)
try_pallas("G5 onehot-where gather dom128", k_onehot_dot,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), 2, xb, idx8)

# dynamic_gather primitive?
try:
    from jax.experimental.pallas.tpu import dynamic_gather  # noqa
    print("pltpu.dynamic_gather exists")
except ImportError:
    print("no pltpu.dynamic_gather")

# ---- f64 on TPU ----
import subprocess
print(subprocess.run(
    ["python", "-c", """
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
a = jnp.arange(16, dtype=jnp.float64)
b = jax.jit(lambda t: jnp.cumsum(t * 1.5))(a)
print('f64 on TPU ok:', b.dtype, float(b[-1]))
import time
x = jax.random.normal(jax.random.PRNGKey(0), (1<<22,), jnp.float64)
i = jax.random.randint(jax.random.PRNGKey(1), (1<<23,), 0, 1<<22)
f = jax.jit(lambda x, i: jnp.take(x, i) * 2.0)
o = f(x, i); o.block_until_ready()
t0 = time.perf_counter()
for _ in range(5): o = f(x, i)
o.block_until_ready()
print('f64 take+mul 8M:', (time.perf_counter()-t0)/5*1e3, 'ms')
"""],
    capture_output=True, text=True).stdout)
