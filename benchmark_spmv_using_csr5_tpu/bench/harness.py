"""End-to-end benchmark harness.

Reproduces the shape of the reference benchmark drivers
(``CSR5_cuda/main.cu:17-116`` / ``call_anonymouslib``):

1. load matrix -> CSR
2. reference SpMV -> y_ref (the golden model, main.cu:336-355)
3. asCSR5 with conversion timing (anonymouslib_cuda.h:211-214)
4. one checked spmv + the 1%-relative validation (main.cu:361-384)
5. ``warmup`` untimed runs then ``num_run`` timed runs (main.cu:85-101)
6. report ms / GB/s / GFLOPS (detail/utils.h:10-20) + %-of-HBM-roofline

Timing methodology (NOTES.md): this platform's host sync costs ~28 ms and
``block_until_ready`` is unreliable, so the NUM_RUN loop runs *on device*
inside one jitted ``lax.fori_loop`` whose iterations are data-dependent
(y feeds a zero-scaled perturbation of x), and only the loop total is
host-synced -- the device-side analogue of the reference's timed loop.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AUTO_TUNED_SIGMA, CSR5Config, compute_sigma

from ..ops.convert import build_csr5
from ..ops.csr5_kernel import csr5_spmv_pallas, pallas_supported
from ..ops.csr5_spmv import csr5_spmv_xla
from ..ops.reference import csr_spmv
from ..utils import perf, progress


@dataclasses.dataclass
class BenchResult:
    name: str
    m: int
    n: int
    nnz: int
    sigma: int
    dtype: str
    backend: str
    convert_ms: float
    convert_phases: dict
    spmv_ms: float
    gbps: float
    gflops: float
    nnz_per_sec: float
    pct_of_roofline: float
    check_ok: bool
    max_rel_err: float
    #: the converted matrix (CSR5Matrix / SlicedCSR5 / DF64 plan), so
    #: callers timing extra variants need not convert again
    matrix: object = None
    #: on-device value-plane storage dtype ("bfloat16" when the lossless
    #: auto gate engaged; results are then bit-identical to f32 storage)
    storage: str = ""

    def report(self) -> str:
        """The reference's output lines (main.cu:104-106, :361-384)."""
        ok = "PASS!" if self.check_ok else "NOT PASS!"
        ph = " ".join(f"{k}={v:.1f}" for k, v in self.convert_phases.items())
        return (
            f"[{self.name}] ({self.m}, {self.n}) nnz = {self.nnz}, sigma = {self.sigma}\n"
            f"CSR->CSR5 time = {self.convert_ms:.3f} ms ({ph})\n"
            f"CSR5-based SpMV time = {self.spmv_ms:.4f} ms, "
            f"{self.gbps:.2f} GB/s, {self.gflops:.2f} GFlops, "
            f"{self.pct_of_roofline:.1f}% of HBM roofline "
            f"[{self.backend}{', ' + self.storage if self.storage else ''}]\n"
            f"Check... {ok} (max rel err {self.max_rel_err:.2e})"
        )


def _force(x) -> float:
    """Host-sync on a tiny slice (block_until_ready is unreliable here)."""
    return float(np.asarray(jax.device_get(x))[0])


@jax.jit
def _rel_max(y, y_ref, floor):
    diff = jnp.abs(y - y_ref.astype(y.dtype))
    rel = diff / jnp.maximum(jnp.abs(y_ref), 1e-30)
    return jnp.max(jnp.where(diff < floor, 0.0, rel))


def rel_err_device(y_dev, y_ref_host) -> float:
    """max relative error of a device result vs a host oracle, reduced
    on device (only the scalar crosses the slow readback tunnel)."""
    floor = 1e-6 * max(1.0, float(np.abs(y_ref_host).max()))
    return float(_rel_max(y_dev, jnp.asarray(y_ref_host), floor))


def time_spmv_device_loop(spmv_fn, x, num_run: int, operands=None) -> float:
    """Mean ms per spmv over a data-dependent on-device loop.

    ``operands`` (any pytree, e.g. the CSR5Matrix) is threaded through the
    jit as an argument: closing over large device arrays embeds them as
    HLO constants, which blows up the compile payload (HTTP 413 on the
    tunnel) for big matrices. ``spmv_fn(operands, xx)`` when operands is
    given, else ``spmv_fn(xx)``.
    """

    @jax.jit
    def run_k(operands, x, k_iters):
        def body(_, carry):
            acc, xx = carry
            y = spmv_fn(operands, xx) if operands is not None else spmv_fn(xx)
            # tap ~16 evenly-spaced elements, NOT just y[0]: a sliced /
            # multi-kernel spmv concatenates per-slice outputs, and a
            # single-element dependency lets XLA dead-code-eliminate every
            # slice y[0] doesn't come from (measured: a 3-slice case timed
            # 3x too fast with a [:1] tap)
            yf = y.ravel()
            taps = yf[:: max(1, yf.shape[0] // 16)]
            acc = acc + jnp.sum(taps, keepdims=True).astype(acc.dtype)[:1]
            # re-derive x with a tiny-scaled dependency on acc: forces the
            # loop body to stay sequential; a 0.0 scale can be folded away
            # by XLA (loop-invariant hoisting), 1e-30 cannot and perturbs
            # the values by less than one ulp
            xx = x + acc[0] * jnp.asarray(1e-30, x.dtype)
            return acc, xx

        acc, _ = jax.lax.fori_loop(
            0, k_iters, body, (jnp.zeros((1,), x.dtype), x)
        )
        return acc

    # the tunnel adds +-2 ms of per-dispatch jitter: use min-of-3 samples
    # of the full loop and of a 1-iteration loop (NOTES.md)
    def sample(k, reps=5):
        best = float("inf")
        _ = _force(run_k(operands, x, k))  # compile + warm
        progress.emit(f"timing:warm k={k}")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = _force(run_k(operands, x, k))
            best = min(best, time.perf_counter() - t0)
            progress.emit(f"timing:rep k={k}")
        return best

    t_full = sample(num_run)
    t_one = sample(1)
    return max(t_full - t_one, 1e-9) / max(num_run - 1, 1) * 1e3


def run_benchmark(
    name: str,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    values: np.ndarray,
    shape,
    x: Optional[np.ndarray] = None,
    sigma: int = AUTO_TUNED_SIGMA,
    num_run: int = 50,
    backend: str = "auto",
    roofline_gbps: Optional[float] = None,
    num_rhs: int = 1,
    autotune: bool = False,
) -> BenchResult:
    """Benchmark SpMV (num_rhs=1) or SpMM (num_rhs>1) on one matrix."""
    m, n = shape
    dtype = values.dtype
    if x is None:
        rng = np.random.default_rng(0)
        x = rng.integers(1, 10, size=(n, num_rhs) if num_rhs > 1 else n).astype(
            dtype
        )  # main.cu:323-326

    # NOT csr_from_numpy: that would upload the whole CSR to the device
    # just to read nnz (the kernels consume only the converted form)
    nnz = int(row_ptr[-1])
    xd = jnp.asarray(x)

    # golden model (main.cu:336-355): sparse-aware host oracle
    import scipy.sparse as sp

    progress.emit("golden")
    a_sp = sp.csr_matrix((values, col_idx, row_ptr), shape=shape)
    y_ref = a_sp @ x

    progress.emit("convert")
    t0 = time.perf_counter()
    # pass host arrays directly: device readback over the tunnel is ~6 MB/s
    cfg = CSR5Config(sigma=compute_sigma(m, nnz, sigma))
    df64 = None
    prebuilt_a5 = None  # reuse a rejected df64's hi-plane conversion
    if (
        dtype == np.float64
        and num_rhs == 1
        and backend in ("auto", "pallas-df64")
        and jax.default_backend() == "tpu"
    ):
        # f64 on a TPU without native f64: the double-single kernel
        # (ops/csr5_df64.py). The XLA fallback would silently downcast
        # (x64 off on the real chip), so this is the only honest path.
        from ..ops.csr5_df64 import (
            build_df64,
            df64_residency_ok,
            df64_supported,
        )

        if df64_residency_ok(m, n):  # skip the build when x/y can't fit
            dd = build_df64((row_ptr, col_idx, values, shape), cfg)
            if df64_supported(dd):
                df64 = dd
            else:
                # the hi plane IS the f32 cast of the matrix: reuse it
                # for the fallback path instead of converting again
                prebuilt_a5 = dd.a5
    sliced = None
    if (
        df64 is None
        and num_rhs == 1
        and backend in ("auto", "pallas-sliced")
        and jax.default_backend() == "tpu"
    ):
        from ..ops.bigslice import build_csr5_sliced, should_slice

        if should_slice(m, n) or backend == "pallas-sliced":
            # beyond the whole-matrix VMEM residency cap: go straight to
            # the row-sliced build (building the whole-matrix form first
            # would double the seconds-scale conversion)
            sliced = build_csr5_sliced(
                (row_ptr, col_idx, values, shape), cfg, value_dtype="auto"
            )
    if df64 is not None:
        a5 = df64
    elif sliced is not None:
        a5 = sliced
    elif prebuilt_a5 is not None:
        a5 = prebuilt_a5
    elif autotune and sigma == AUTO_TUNED_SIGMA:
        # an explicitly requested sigma always wins over the re-tune
        from ..ops.convert import build_csr5_autotuned

        a5 = build_csr5_autotuned(
            (row_ptr, col_idx, values, shape), cfg, value_dtype="auto"
        )
    else:
        # "auto" storage: bf16 value plane only when provably lossless
        # (bit-identical results, half the upload + stream — the
        # conversion-cost mandate, VERDICT r04 #2)
        a5 = build_csr5(
            (row_ptr, col_idx, values, shape), cfg, value_dtype="auto"
        )
    convert_ms = (time.perf_counter() - t0) * 1e3
    from ..ops.convert import last_convert_phases

    convert_phases = dict(last_convert_phases)

    if num_rhs > 1:
        from ..ops.csr5_kernel import csr5_spmm_pallas, pallas_spmm_supported
        from ..ops.csr5_spmv import csr5_spmm_xla

        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() == "tpu"
                and pallas_spmm_supported(a5, num_rhs)
                else "xla"
            )
        if backend == "pallas":
            spmv_fn = lambda a, xx: csr5_spmm_pallas(a, xx)  # noqa: E731
        else:
            spmv_fn = lambda a, xx: csr5_spmm_xla(a, xx)  # noqa: E731
    elif df64 is not None:
        from ..ops.csr5_df64 import df64_spmv, split_f64

        backend = "pallas-df64"
        xh, xl = split_f64(x)
        xd = jnp.asarray(xh)  # the timed loop perturbs the hi plane
        xl_dev = jnp.asarray(xl)
        # operands carry (plan, x_lo); the loop threads x_hi
        spmv_fn = lambda ops, xx: df64_spmv(ops[0], (xx, ops[1]))[0]  # noqa: E731
    elif sliced is not None:
        from ..ops.bigslice import sliced_spmv

        backend = "pallas-sliced"
        spmv_fn = lambda a, xx: sliced_spmv(a, xx)  # noqa: E731
    else:
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() == "tpu" and pallas_supported(a5)
                else "xla"
            )
        if backend == "pallas":
            spmv_fn = lambda a, xx: csr5_spmv_pallas(a, xx)  # noqa: E731
        else:
            spmv_fn = lambda a, xx: csr5_spmv_xla(a, xx)  # noqa: E731

    # correctness at the reference tolerance (main.cu:361-384); the
    # reduction runs ON DEVICE (y at banded20M is 80 MB = ~13 s through
    # the ~6 MB/s readback tunnel; uploading y_ref instead is ~1 GB/s)
    progress.emit("check")
    if df64 is not None:
        from ..ops.csr5_df64 import df64_combine, df64_spmv

        operands = (a5, xl_dev)
        y = df64_combine(*jax.device_get(df64_spmv(a5, (xd, xl_dev))))
        denom = np.maximum(np.abs(y_ref), 1e-30)
        rel = np.abs(y - y_ref) / denom
        rel[np.abs(y - y_ref) < 1e-6 * max(1.0, np.abs(y_ref).max())] = 0.0
        max_rel = float(rel.max()) if rel.size else 0.0
    else:
        operands = a5
        max_rel = rel_err_device(spmv_fn(a5, xd), y_ref)
    check_ok = bool(max_rel <= 0.01)

    progress.emit("timing")  # jit compile + min-of-samples device loops
    spmv_ms = time_spmv_device_loop(spmv_fn, xd, num_run, operands=operands)
    progress.emit("timing:done")
    met = perf.spmv_metrics(
        m,
        nnz,
        spmv_ms,
        dtype.itemsize,
        roofline_gbps=roofline_gbps,
        num_rhs=num_rhs,
        n=n,
    )
    if df64 is not None:
        storage = "df64(2xf32)"
    elif sliced is not None:
        storage = str(np.dtype(sliced.slices[0].val_tiles.dtype))
    else:
        storage = str(np.dtype(a5.val_tiles.dtype))
    return BenchResult(
        name=name,
        m=m,
        n=n,
        nnz=nnz,
        sigma=a5.sigma,
        dtype=str(dtype),
        backend=backend,
        storage=storage,
        convert_ms=convert_ms,
        convert_phases=convert_phases,
        spmv_ms=spmv_ms,
        gbps=met.gbps,
        gflops=met.gflops,
        nnz_per_sec=met.nnz_per_sec,
        pct_of_roofline=met.pct_of_roofline,
        check_ok=check_ok,
        max_rel_err=max_rel,
        matrix=a5,
    )
