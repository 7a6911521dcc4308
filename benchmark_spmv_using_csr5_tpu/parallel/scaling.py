"""Weak-scaling measurement for distributed CSR5 SpMV.

The BASELINE.json north-star asks for nnz/s scaling efficiency at 1 chip
/ 1 host / N hosts with >=70% weak-scaling efficiency. This module
measures it for any mesh the runtime exposes: real multi-chip meshes
when available, or the virtual host-device mesh for CI (where absolute
times are meaningless but the harness and collectives are exercised
end-to-end).

Weak scaling: the per-device problem size is fixed (rows_per_device x
bandwidth), so the global matrix grows with D; efficiency(D) =
(nnz_rate(D) / D) / nnz_rate(1).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import synth
from .distributed import distribute_csr, distributed_spmv, make_mesh


@dataclasses.dataclass
class ScalePoint:
    devices: int
    nnz: int
    ms_per_spmv: float
    nnz_per_sec: float
    efficiency: float  # vs 1-device nnz/s per device
    #: (max - min) / min over the measurement repeats at this D — the
    #: shared-host noise indicator (virtual meshes timeshare ONE core;
    #: single-shot sweeps measured +-40% across rounds, VERDICT r04 #6)
    spread: float = 0.0


def _time_distributed(da, mesh, x, iters: int, backend: str) -> float:
    def force(v):
        return float(np.asarray(jax.device_get(v.ravel()[0])))

    # da is threaded through the jit as an ARGUMENT: closing over the
    # DistributedCSR5 pytree embeds its arrays as HLO constants, which
    # blows the tunnel compile payload (HTTP 413) at larger weak-scaling
    # sizes (platform rule; see bench/harness.time_spmv_device_loop)
    @jax.jit
    def loop(da, x, k):
        def body(_, carry):
            acc, xx = carry
            y = distributed_spmv(da, xx, mesh, backend=backend)
            acc = acc + y.ravel()[:1]
            return acc, x + acc[0] * jnp.asarray(1e-30, x.dtype)

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.zeros((1,), x.dtype), x))
        return acc

    def sample(k, reps=3):
        best = float("inf")
        force(loop(da, x, k))
        for _ in range(reps):
            t0 = time.perf_counter()
            force(loop(da, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(sample(iters) - sample(1), 1e-9) / max(iters - 1, 1) * 1e3


def weak_scaling(
    device_counts: Optional[List[int]] = None,
    rows_per_device: int = 65536,
    bandwidth: int = 27,
    iters: int = 20,
    backend: str = "xla",
    matrix_factory: Optional[Callable[[int], "object"]] = None,
    repeats: int = 1,
) -> List[ScalePoint]:
    """Weak-scaling sweep over mesh sizes; returns one ScalePoint per D.

    ``repeats > 1`` measures each D that many times (minutes apart in
    effect on the shared 1-core host) and keeps the MIN, recording the
    min-to-max spread — without it a single-shot sweep's retention number
    swung 109% -> 75% across rounds with no code change (VERDICT r04).
    """
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= n_avail]
    points: List[ScalePoint] = []
    base_rate = None
    for d in device_counts:
        m = rows_per_device * d
        a = (
            matrix_factory(m)
            if matrix_factory is not None
            else synth.banded(m, bandwidth, dtype=np.float32)
        )
        mesh = make_mesh(d)
        da = distribute_csr(a.indptr, a.indices, a.data, a.shape, mesh)
        x = jnp.asarray(synth.dense_x(m, dtype=np.float32))
        samples = [
            _time_distributed(da, mesh, x, iters, backend)
            for _ in range(max(repeats, 1))
        ]
        ms = min(samples)
        spread = (max(samples) - ms) / ms if ms > 0 else 0.0
        rate = a.nnz / (ms * 1e-3)
        if base_rate is None:
            base_rate = rate
        points.append(
            ScalePoint(
                devices=d,
                nnz=int(a.nnz),
                ms_per_spmv=ms,
                nnz_per_sec=rate,
                efficiency=rate / d / base_rate,
                spread=spread,
            )
        )
    return points


def report(points: List[ScalePoint]) -> str:
    lines = ["devices      nnz    ms/spmv      nnz/s   weak-eff   spread"]
    for p in points:
        lines.append(
            f"{p.devices:7d} {p.nnz:9d} {p.ms_per_spmv:9.3f} "
            f"{p.nnz_per_sec:11.3e} {p.efficiency:9.2%} {p.spread:8.1%}"
        )
    return "\n".join(lines)


#: TPU v5e-class ICI parameters for the hardware projection below. The
#: virtual-CPU mesh cannot measure ICI, so these public-spec-class
#: constants (one ICI link sustains ~45 GB/s per direction; per-hop
#: collective latency ~1 us — the scaling-book mental model) turn the
#: dryrun's EXACT per-device byte counts into a projected efficiency.
ICI_GBPS = 45.0
ICI_HOP_LATENCY_S = 1e-6


@dataclasses.dataclass
class ProjectedPoint:
    devices: int
    exchange: str  # "halo" | "all-gather"
    comm_bytes_per_dev: int
    comm_ms: float
    step_ms: float  # projected per-step time at D devices
    efficiency: float  # spmv_ms / step_ms (weak scaling)


def project_weak_scaling(
    spmv_ms: float,
    rows_per_device: int,
    bandwidth: int = 27,
    device_counts=(2, 4, 8, 16, 64, 256),
    ici_gbps: float = ICI_GBPS,
    itemsize: int = 4,
    overlap: bool = False,
) -> List[ProjectedPoint]:
    """Project weak-scaling efficiency on real ICI hardware from (a) the
    single-chip SpMV time the driver bench measured and (b) the
    per-device collective traffic the distributed layer exchanges per
    step — the quantity the virtual-mesh dryrun counts exactly
    (``DistributedCSR5.x_bytes_exchanged``).

    Weak scaling holds the per-device shard fixed at rows_per_device x
    bandwidth (the single-chip bench case), so per-device compute time
    stays ``spmv_ms``; the only added cost is the x exchange. Both
    exchange modes of parallel/distributed.py are modelled:

    - ``halo``: two single-hop neighbor ppermutes of the
      128-column-grain halo (``distribute_csr(halo="auto")`` on banded /
      stencil / RCM-reordered matrices) — traffic independent of D;
    - ``all-gather``: the full-x fallback, (D-1) * rows_per_device
      bytes into each device over a bidirectional ring.

    ``efficiency = spmv_ms / (spmv_ms + comm_ms)`` — conservative, no
    compute/communication overlap (``overlap=True`` models perfect
    overlap as max() instead). DCN is not modelled: at v5e slice sizes
    every hop here rides ICI; multi-slice DCN crossings only affect the
    two slice-edge devices of the halo exchange.
    """
    out: List[ProjectedPoint] = []
    halo_cols = max(-(-(bandwidth // 2) // 128) * 128, 128)  # lane grain
    for d in device_counts:
        for exchange in ("halo", "all-gather"):
            if exchange == "halo":
                nbytes = 2 * halo_cols * itemsize  # one per neighbor
                lat = 2 * ICI_HOP_LATENCY_S
            else:
                nbytes = (d - 1) * rows_per_device * itemsize
                lat = (d - 1) * ICI_HOP_LATENCY_S
            comm_ms = (nbytes / (ici_gbps * 1e9) + lat) * 1e3
            step = max(spmv_ms, comm_ms) if overlap else spmv_ms + comm_ms
            out.append(
                ProjectedPoint(
                    devices=d,
                    exchange=exchange,
                    comm_bytes_per_dev=nbytes,
                    comm_ms=comm_ms,
                    step_ms=step,
                    efficiency=spmv_ms / step,
                )
            )
    return out


def projection_report(points: List[ProjectedPoint], spmv_ms: float) -> str:
    lines = [
        f"hardware projection (per-chip compute {spmv_ms:.4f} ms, "
        f"ICI {ICI_GBPS:.0f} GB/s/link, {ICI_HOP_LATENCY_S * 1e6:.0f} us/hop, "
        f"no overlap):",
        "devices  exchange     comm B/dev   comm ms    step ms  proj-eff",
    ]
    for p in points:
        lines.append(
            f"{p.devices:7d}  {p.exchange:<10s} {p.comm_bytes_per_dev:12d} "
            f"{p.comm_ms:9.4f} {p.step_ms:10.4f} {p.efficiency:9.2%}"
        )
    return "\n".join(lines)
