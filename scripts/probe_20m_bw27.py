"""Honest-harness probes: banded500k sanity (harness-change neutrality)
and banded20M bw=27 fused (G=1 sweet spot at 20M rows)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from benchmark_spmv_using_csr5_tpu.utils import synth
from benchmark_spmv_using_csr5_tpu.ops.bigslice import build_csr5_sliced, sliced_spmv
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import csr5_spmv_pallas
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop

def roof_ms(m, nnz):
    return ((m + 1 + nnz) * 4 + (2 * nnz + m) * 4) / 1e9 / 0.819

# sanity: banded500k with the 16-tap harness (was 0.2704 this session)
a = synth.banded(500_000, 27, dtype=np.float32)
a5 = build_csr5((a.indptr, a.indices, a.data, a.shape))
rng = np.random.default_rng(0)
x = rng.integers(1, 10, 500_000).astype(np.float32)
xd = jnp.asarray(x)
ms = time_spmv_device_loop(lambda m_, x_: csr5_spmv_pallas(m_, x_), xd, 200, operands=a5)
print(f"banded500k: {ms:.4f} ms ({100*roof_ms(500_000, a.nnz)/ms:.1f}%) [was 0.2704]", flush=True)

# banded20M bw=27
t0 = time.perf_counter()
a = synth.banded(20_000_000, 27, dtype=np.float32)
print(f"synth {time.perf_counter()-t0:.0f}s nnz={a.nnz}", flush=True)
t0 = time.perf_counter()
sl = build_csr5_sliced((a.indptr, a.indices, a.data, a.shape))
print(f"build {time.perf_counter()-t0:.0f}s K={sl.num_slices} sigma={sl.sigma}", flush=True)
x = rng.integers(1, 10, 20_000_000).astype(np.float32)
xd = jnp.asarray(x)
y = np.asarray(sliced_spmv(sl, xd))
y_ref = a @ x
rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
ms = time_spmv_device_loop(lambda s_, x_: sliced_spmv(s_, x_), xd, 50, operands=sl)
r = roof_ms(20_000_000, a.nnz)
print(f"banded20M bw27: {ms:.4f} ms ({100*r/ms:.1f}% of {r:.2f} ms roofline) rel={rel:.1e}", flush=True)
