"""TPU probe: fused (xwin) sliced executor on banded20M vs the recorded
v1 number (3.04 ms this session's shakedown)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from benchmark_spmv_using_csr5_tpu.utils import synth
from benchmark_spmv_using_csr5_tpu.ops.bigslice import build_csr5_sliced, sliced_spmv
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
import jax.numpy as jnp

t0 = time.perf_counter()
a = synth.banded(20_000_000, 5, dtype=np.float32)
print(f"synth {time.perf_counter()-t0:.1f}s nnz={a.nnz}", flush=True)
t0 = time.perf_counter()
sl = build_csr5_sliced((a.indptr, a.indices, a.data, a.shape))
print(f"build {time.perf_counter()-t0:.1f}s slices={sl.num_slices}", flush=True)
rng = np.random.default_rng(0)
x = rng.integers(1, 10, a.shape[1]).astype(np.float32)
xd = jnp.asarray(x)
y = np.asarray(sliced_spmv(sl, xd))
y_ref = a @ x
rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
print(f"rel err {rel:.2e}", flush=True)
assert rel < 1e-2
ms = time_spmv_device_loop(lambda s_, x_: sliced_spmv(s_, x_), xd, 100, operands=sl)
gb = ((a.shape[0] + 1 + a.nnz) * 4 + (2 * a.nnz + a.shape[0]) * 4) / 1e9
print(f"fused sliced spmv: {ms:.4f} ms, {gb/(ms*1e-3):.1f} GB/s, "
      f"{100*gb/(ms*1e-3)/819:.1f}% roofline (v1 was 3.0383 ms / 64.3%)", flush=True)
