"""f32 vs bf16 value storage on the CSR5 kernel, interleaved A/B
(round 5): the DIA kernel measured bf16 +3.6% (VPU-bound convert cost);
check whether the auto-bf16 default costs the banded500k primary too,
and whether stream-bound banded2M keeps its wash."""

import sys

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (axon discovery)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu.ops import csr5_kernel as K
from benchmark_spmv_using_csr5_tpu.ops.convert import build_csr5
from benchmark_spmv_using_csr5_tpu.bench.harness import time_spmv_device_loop
from benchmark_spmv_using_csr5_tpu.utils import perf, synth


def run(name, m, runs):
    a = sp.csr_matrix(synth.banded(m, 27, dtype=np.float32))
    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, m).astype(np.float32)
    y_ref = a @ x
    xd = jnp.asarray(x)
    csr = (a.indptr, a.indices, a.data, a.shape)
    builds = {
        "f32": build_csr5(csr),
        "bf16": build_csr5(csr, value_dtype="auto"),
    }
    assert str(np.dtype(builds["bf16"].val_tiles.dtype)) == "bfloat16"
    for rep in range(2):  # interleave twice to bound drift
        for tag, a5 in builds.items():
            y = np.asarray(K.csr5_spmv_pallas(a5, xd))
            rel = float(
                (np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)).max()
            )
            ms = time_spmv_device_loop(
                lambda a_, x_: K.csr5_spmv_pallas(a_, x_), xd, runs,
                operands=a5,
            )
            met = perf.spmv_metrics(m, a.nnz, ms, 4, n=m)
            print(
                f"[{name}] rep{rep} {tag}: {ms:.4f} ms "
                f"{met.pct_of_roofline:.2f}%  maxrel={rel:.1e}",
                file=sys.stderr, flush=True,
            )


def main():
    run("banded500k", 500_000, 200)
    run("banded2M", 2_000_000, 100)


if __name__ == "__main__":
    main()
