"""Probe: what warm-up WRITE makes a fresh 224 MB arena buffer fast for
the native transpose + upload? (round 4: fill(0) prefault is not enough
at this scale — cold transpose 21 s vs warm 0.2 s.)

Variants per fresh tag:
  a) prefaulted only (np.zeros + fill(0))       [current prewarm]
  b) + fill(1)  (non-memset pattern write)
  c) + slice-copy from a warm source (memcpy)
Then time nativelib.tile_transpose into it twice.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from benchmark_spmv_using_csr5_tpu.utils import nativelib  # noqa: E402
from benchmark_spmv_using_csr5_tpu.utils.hostmem import arena_take  # noqa: E402

SIG, OM = 24, 128
P = 18_240  # banded2M-class: 224 MB planes
N = P * SIG * OM


def bench_transpose(tag):
    src = arena_take(N, np.int32, "pw:src", zero=False)
    src[:] = np.arange(N, dtype=np.int32)  # warm source
    for it in range(2):
        t0 = time.perf_counter()
        out = nativelib.tile_transpose(src, P, SIG, OM, arena=tag)
        dt = time.perf_counter() - t0
        rate = N * 4 / 1e9 / dt
        print(f"  transpose #{it} -> {tag}: {dt:6.2f} s  {rate:5.2f} GB/s", flush=True)
        assert out is not None
    del out


def main():
    print("a) prefaulted only (current prewarm):", flush=True)
    arena_take(N, np.int32, "pw:a", zero=False)
    bench_transpose("pw:a")

    print("b) prefaulted + fill(1):", flush=True)
    v = arena_take(N, np.int32, "pw:b", zero=False)
    t0 = time.perf_counter()
    v.fill(1)
    print(f"  fill(1) warm pass: {time.perf_counter() - t0:.2f} s", flush=True)
    bench_transpose("pw:b")

    print("c) prefaulted + slice-copy from warm source:", flush=True)
    v = arena_take(N, np.int32, "pw:c", zero=False)
    src = arena_take(N, np.int32, "pw:src", zero=False)
    t0 = time.perf_counter()
    v[:] = src
    print(f"  memcpy warm pass: {time.perf_counter() - t0:.2f} s", flush=True)
    bench_transpose("pw:c")


if __name__ == "__main__":
    main()
