"""Honest-harness banded20M probe: fused executor across sigma, plus a
standalone single-slice kernel timing to separate kernel vs executor."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from benchmark_spmv_using_csr5_tpu.utils import synth
from benchmark_spmv_using_csr5_tpu.config import CSR5Config
from benchmark_spmv_using_csr5_tpu.ops.bigslice import build_csr5_sliced, sliced_spmv
from benchmark_spmv_using_csr5_tpu.ops.csr5_kernel import csr5_spmv_pallas
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop

a = synth.banded(20_000_000, 5, dtype=np.float32)
csr = (a.indptr, a.indices, a.data, a.shape)
rng = np.random.default_rng(0)
x = rng.integers(1, 10, a.shape[1]).astype(np.float32)
xd = jnp.asarray(x)
y_ref = a @ x
gb = ((a.shape[0] + 1 + a.nnz) * 4 + (2 * a.nnz + a.shape[0]) * 4) / 1e9
print(f"roofline {gb/0.819:.3f} ms", flush=True)

for sig in (8, 16, 24):
    t0 = time.perf_counter()
    sl = build_csr5_sliced(csr, config=CSR5Config(sigma=sig))
    bt = time.perf_counter() - t0
    if sl is None:
        print(f"sigma {sig}: no sliced build", flush=True)
        continue
    y = np.asarray(sliced_spmv(sl, xd))
    rel = float((np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max())
    ms = time_spmv_device_loop(lambda s_, x_: sliced_spmv(s_, x_), xd, 100, operands=sl)
    print(f"sigma {sig}: K={sl.num_slices} build {bt:.0f}s fused {ms:.4f} ms "
          f"= {100*gb/(ms*1e-3)/819:.1f}% rel={rel:.1e}", flush=True)
    # standalone first slice (single pallas call, DCE-proof by opacity)
    s0 = sl.slices[0]
    xk = jnp.asarray(x[sl.col_starts[0]: sl.col_starts[0] + s0.n])
    ms0 = time_spmv_device_loop(lambda m_, x_: csr5_spmv_pallas(m_, x_), xk, 100, operands=s0)
    sh = s0.nnz_stored / a.nnz
    print(f"  slice0: {ms0:.4f} ms (share {sh:.2f} -> x{1/sh:.2f} = {ms0/sh:.3f} ms equiv)", flush=True)
