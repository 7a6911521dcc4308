"""Performance model, timers and roofline reporting.

Keeps the reference's exact metric formulation
(``CSR5_cuda/detail/utils.h:10-20``, ``main.cu:101-106``):

- ``bytes = (m+1+nnz)*sizeof(index) + (2*nnz+m)*sizeof(value)``
- ``flops = 2*nnz``
- ``GB/s = bytes / (1e6 * time_ms)``; ``GFLOPS = flops / (1e6 * time_ms)``

plus the TPU extension required by BASELINE.md: percent of per-chip HBM
speed-of-light for the same bytes model.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..config import DEFAULT_HBM_GBPS

#: measured/printed per-chip HBM bandwidth by device kind (GB/s)
HBM_GBPS_BY_DEVICE = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,  # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,
}


def get_bytes(m: int, nnz: int, index_bytes: int = 4, value_bytes: int = 8) -> int:
    """Bytes-moved model: getB (detail/utils.h:10-16)."""
    return (m + 1 + nnz) * index_bytes + (2 * nnz + m) * value_bytes


def get_flops(nnz: int) -> int:
    """FLOP model: getFLOP = 2*nnz (detail/utils.h:18-20)."""
    return 2 * nnz


def device_hbm_gbps(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for key, bw in HBM_GBPS_BY_DEVICE.items():
        if key.lower() in str(kind).lower():
            return bw
    return DEFAULT_HBM_GBPS


@dataclasses.dataclass
class SpmvMetrics:
    """The headline metric line (main.cu:104-106) + roofline extension."""

    time_ms: float
    gbps: float
    gflops: float
    nnz_per_sec: float
    roofline_gbps: float
    pct_of_roofline: float

    def __str__(self):
        return (
            f"CSR5-based SpMV time = {self.time_ms:.4f} ms, "
            f"{self.gbps:.2f} GB/s, {self.gflops:.2f} GFlops "
            f"({self.pct_of_roofline:.1f}% of {self.roofline_gbps:.0f} GB/s roofline)"
        )


def spmv_metrics(
    m: int,
    nnz: int,
    time_ms: float,
    value_bytes: int,
    index_bytes: int = 4,
    roofline_gbps: Optional[float] = None,
    num_rhs: int = 1,
    n: Optional[int] = None,
) -> SpmvMetrics:
    """SpMV metrics; for SpMM (num_rhs>1) flops scale by R and the bytes
    model adds the marginal (x + y) vector traffic per extra rhs."""
    b = get_bytes(m, nnz, index_bytes, value_bytes)
    if num_rhs > 1:
        b += (num_rhs - 1) * ((n or m) + m) * value_bytes
    fl = get_flops(nnz) * num_rhs
    roofline = roofline_gbps if roofline_gbps is not None else device_hbm_gbps()
    gbps = b / (1e6 * time_ms)
    return SpmvMetrics(
        time_ms=time_ms,
        gbps=gbps,
        gflops=fl / (1e6 * time_ms),
        nnz_per_sec=nnz / (time_ms * 1e-3),
        roofline_gbps=roofline,
        pct_of_roofline=100.0 * gbps / roofline,
    )


class Timer:
    """Wall timer with device synchronisation.

    The anonymouslib_timer analogue (utils_cuda.h:6-23): cudaEvent sync
    becomes ``jax.block_until_ready`` walls.
    """

    def __init__(self):
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop_ms(self, *block_on) -> float:
        for v in block_on:
            jax.block_until_ready(v)
        return (time.perf_counter() - self._t0) * 1e3


def benchmark(
    fn: Callable,
    *args,
    warmup: int = 50,
    num_run: int = 200,
    **kwargs,
) -> float:
    """Mean ms per call after warmup (main.cu:85-101 harness shape:
    50 warmup calls, NUM_RUN timed calls, one sync at each end)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t = Timer().start()
    for _ in range(num_run):
        out = fn(*args, **kwargs)
    ms = t.stop_ms(out)
    return ms / num_run
