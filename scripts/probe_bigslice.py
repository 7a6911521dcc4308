"""Real-TPU probe of the row-sliced CSR5 path (ops/bigslice.py).

1. banded100k via run_benchmark (regular Pallas path sanity)
2. banded 13M bw5 (m+n=26M > whole-matrix VMEM cap) via run_benchmark:
   must pick backend=pallas-sliced, pass the 1% check, and report a
   roofline fraction well above the XLA executor's ~0.2 GFLOPS floor.
"""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH: breaks axon discovery

import time

import numpy as np

t0 = time.time()
from benchmark_spmv_using_csr5_tpu.bench.harness import run_benchmark
from benchmark_spmv_using_csr5_tpu.utils import synth

print(f"[{time.time()-t0:6.1f}s] imports done", flush=True)

a = synth.banded(100_000, 27, dtype=np.float32)
res = run_benchmark("banded100k", a.indptr, a.indices, a.data, a.shape, num_run=100)
print(res.report(), flush=True)
assert res.check_ok and res.backend == "pallas", res

print(f"[{time.time()-t0:6.1f}s] generating banded13M...", flush=True)
b = synth.banded(13_000_000, 5, dtype=np.float32)
print(f"[{time.time()-t0:6.1f}s] nnz={b.nnz}", flush=True)
res2 = run_benchmark("banded13M", b.indptr, b.indices, b.data, b.shape, num_run=50)
print(res2.report(), flush=True)
assert res2.check_ok, res2.max_rel_err
print(f"[{time.time()-t0:6.1f}s] backend={res2.backend} OK", flush=True)
