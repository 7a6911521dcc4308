"""Probe: banded2M whole-matrix conversion phase anatomy, cold vs warm
(round 4: the bench child measured 16-24 s 'transpose' where the raw
upload probe measured 224 MB planes at 1.3 GB/s — find the gap)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from benchmark_spmv_using_csr5_tpu.ops.convert import (  # noqa: E402
    build_csr5,
    last_convert_phases,
)
from benchmark_spmv_using_csr5_tpu.utils import synth  # noqa: E402


def main():
    a = synth.banded(2_000_000, 27, dtype=np.float32)
    csr = (a.indptr, a.indices, a.data, a.shape)
    for it in range(3):
        t0 = time.perf_counter()
        a5 = build_csr5(csr)
        dt = time.perf_counter() - t0
        ph = " ".join(f"{k}={v:.0f}" for k, v in last_convert_phases.items())
        print(f"build #{it}: {dt:.2f} s  ({ph})", flush=True)
        del a5


if __name__ == "__main__":
    main()
