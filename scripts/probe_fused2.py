"""Isolate the fused-executor overhead on banded2M (whole kernel = 1.138 ms
this session)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from benchmark_spmv_using_csr5_tpu.utils import synth
from benchmark_spmv_using_csr5_tpu.ops.bigslice import (
    build_csr5_sliced, sliced_spmv, _SLICE_ELEM_CAP)
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import csr5_spmv_pallas
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
import functools

a = synth.banded(2_000_000, 27, dtype=np.float32)
csr = (a.indptr, a.indices, a.data, a.shape)
rng = np.random.default_rng(0)
x = rng.integers(1, 10, a.shape[1]).astype(np.float32)
xd = jnp.asarray(x)
y_ref = a @ x

def check(y):
    return float((np.abs(np.asarray(y) - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())

# (a) whole-matrix kernel
a5 = build_csr5(csr)
print("whole rel", check(csr5_spmv_pallas(a5, xd)), flush=True)
ms = time_spmv_device_loop(lambda m_, x_: csr5_spmv_pallas(m_, x_), xd, 200, operands=a5)
print(f"(a) whole kernel: {ms:.4f} ms", flush=True)

# (b) fused, single slice
sl1 = build_csr5_sliced(csr)
print("slices:", sl1.num_slices, flush=True)
print("fused1 rel", check(sliced_spmv(sl1, xd)), flush=True)
ms = time_spmv_device_loop(lambda s_, x_: sliced_spmv(s_, x_), xd, 200, operands=sl1)
print(f"(b) fused x{sl1.num_slices}: {ms:.4f} ms", flush=True)

# (c) fused, forced 3 slices
sl3 = build_csr5_sliced(csr, elem_cap=1_600_000)
print("slices:", sl3.num_slices, flush=True)
print("fused3 rel", check(sliced_spmv(sl3, xd)), flush=True)
ms = time_spmv_device_loop(lambda s_, x_: sliced_spmv(s_, x_), xd, 200, operands=sl3)
print(f"(c) fused x{sl3.num_slices}: {ms:.4f} ms", flush=True)

# (d) v1-style executor (XLA slice + pad + concat) on the same slices
@functools.partial(jax.jit, static_argnames=())
def v1(sl, xs):
    outs = []
    for a5_, c0 in zip(sl.slices, sl.col_starts):
        xk = jax.lax.slice(xs, (c0,), (min(c0 + a5_.n, sl.n),))
        if xk.shape[0] < a5_.n:
            xk = jnp.pad(xk, (0, a5_.n - xk.shape[0]))
        outs.append(csr5_spmv_pallas(a5_, xk))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

print("v1 rel", check(v1(sl3, xd)[:a.shape[0]]), flush=True)
ms = time_spmv_device_loop(lambda s_, x_: v1(s_, x_)[:2_000_000], xd, 200, operands=sl3)
print(f"(d) v1 x{sl3.num_slices}: {ms:.4f} ms", flush=True)
