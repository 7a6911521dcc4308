"""SpMVHandle: the anonymouslibHandle-compatible stateful API.

Mirrors the public interface of ``anonymouslibHandle<iT,uiT,vT>``
(``CSR5_cuda/anonymouslib_cuda.h:16-23``): ``warmup()``, ``inputCSR()``,
``asCSR()``, ``asCSR5()``, ``setX()``, ``spmv()``, ``setSigma()``,
``destroy()`` -- with snake_case JAX-native spellings (camelCase aliases
provided). The handle owns the format state machine CSR <-> CSR5
(anonymouslib_cuda.h:28-53) so reference benchmark drivers translate 1:1.

Functional users should prefer the pure API (build_csr5 / csr5_spmv);
the handle is a thin stateful veneer over it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AUTO_TUNED_SIGMA, CSR5Config, Format, Status, compute_sigma
from ..ops.convert import build_csr5, csr5_to_csr
from ..ops.csr5_spmv import csr5_spmv
from ..ops.reference import csr_spmv
from .formats import CSR5Matrix, CSRMatrix


class SpMVHandle:
    """Stateful matrix handle with the reference's lifecycle semantics."""

    def __init__(self, m: int, n: int):
        self.shape = (int(m), int(n))
        self._format: Optional[Format] = None
        self._csr: Optional[CSRMatrix] = None
        self._csr5: Optional[CSR5Matrix] = None
        self._csr5_sliced = None  # SlicedCSR5 beyond the VMEM cap
        self._host_csr = None  # host-side (row_ptr, col_idx, values, shape)
        self._x: Optional[jax.Array] = None
        self._sigma: int = AUTO_TUNED_SIGMA
        self._backend: str = "auto"

    # -- lifecycle (anonymouslib_cuda.h:62-103,106-220) -------------------

    def warmup(self) -> "SpMVHandle":
        """Stabilise compilation caches before timing (format_cuda.h:7-19).

        On TPU the analogue of the reference's warmup kernel is forcing the
        jit traces/compiles ahead of the timed region.
        """
        if self._format == Format.CSR5:
            _ = self.spmv(1.0)
        return self

    def input_csr(self, nnz: int, row_ptr, col_idx, values) -> "SpMVHandle":
        # a re-input replaces ALL matrix state (a stale host copy from an
        # earlier input would otherwise win over device-array input in
        # as_csr5 and silently convert the wrong matrix)
        self._host_csr = None
        self._csr5 = None
        self._csr5_sliced = None
        if not isinstance(values, jax.Array):
            # keep a host copy: conversion is host-side, and device->host
            # readback over the tunnel is ~6 MB/s (NOTES.md) — big
            # matrices must never round-trip through the device
            self._host_csr = (
                np.asarray(row_ptr, np.int64),
                np.asarray(col_idx, np.int32),
                np.asarray(values),
                self.shape,
            )
        row_ptr = jnp.asarray(row_ptr, jnp.int32)
        col_idx = jnp.asarray(col_idx, jnp.int32)
        values = jnp.asarray(values)
        if int(row_ptr[-1]) != nnz or col_idx.shape[0] != nnz:
            raise ValueError(f"inconsistent nnz={nnz} (Status.INVALID_HANDLE)")
        self._csr = CSRMatrix(row_ptr, col_idx, values, self.shape)
        self._format = Format.CSR
        return self

    def as_csr5(self) -> "SpMVHandle":
        if self._format == Format.CSR5:
            return self
        if self._csr is None:
            raise ValueError("inputCSR first (Status.INVALID_HANDLE)")
        sigma = self.compute_sigma()
        cfg = CSR5Config(sigma=sigma)
        src = self._host_csr if self._host_csr is not None else self._csr
        if jax.default_backend() == "tpu":
            # beyond the whole-matrix VMEM residency cap, convert to the
            # row-sliced form (ops/bigslice.py) instead of the whole-
            # matrix CSR5 (whose Pallas kernel would be gated off)
            from ..ops.bigslice import build_csr5_sliced, should_slice

            if should_slice(*self.shape):
                self._csr5_sliced = build_csr5_sliced(src, cfg)
        if self._csr5_sliced is None:
            if self._sigma == AUTO_TUNED_SIGMA:
                # auto sigma: the structure-aware re-tune (computeSigma
                # extended per NOTES — a scattered-tier conversion
                # rebuilds at sigma=8, measured ~8-30% on gather-bound
                # matrices). An explicit setSigma skips it, like the
                # reference's fixed-sigma path (anonymouslib_cuda.h:295).
                from ..ops.convert import build_csr5_autotuned

                self._csr5 = build_csr5_autotuned(src, cfg)
            else:
                self._csr5 = build_csr5(src, cfg)
        self._format = Format.CSR5
        return self

    def as_csr(self) -> "SpMVHandle":
        if self._format == Format.CSR:
            return self
        if self._csr5 is None and self._csr5_sliced is None:
            raise ValueError("asCSR5 first (Status.INVALID_HANDLE)")
        if self._csr5_sliced is not None:
            # the sliced form keeps the input CSR (host) alongside; the
            # device CSRMatrix from input_csr is still authoritative
            self._csr5_sliced = None
        else:
            self._csr = csr5_to_csr(self._csr5)
            self._csr5 = None
        self._format = Format.CSR
        return self

    def set_x(self, x) -> "SpMVHandle":
        """Bind the dense x vector (setX analogue; the CUDA texture-object
        binding of anonymouslib_cuda.h:222-260 has no TPU equivalent -- x
        is pinned whole in VMEM by the kernel instead)."""
        x = jnp.asarray(x)
        if x.shape[0] != self.shape[1]:
            raise ValueError("x length != n (Status.INVALID_HANDLE)")
        self._x = x
        return self

    def set_sigma(self, sigma: int) -> "SpMVHandle":
        """Select sigma or request auto-tuning (anonymouslib_cuda.h:295-318).

        Like the OpenCL backend's re-JIT on setSigma
        (anonymouslib_opencl.h:363-479), changing sigma re-specialises the
        jitted kernels (sigma is a static argument)."""
        self._sigma = int(sigma)
        if self._format == Format.CSR5:
            # force re-conversion with the new sigma
            self.as_csr()
            self.as_csr5()
        return self

    def compute_sigma(self) -> int:
        m, _ = self.shape
        nnz = self._csr.nnz if self._csr is not None else 0
        return compute_sigma(m, nnz, self._sigma)

    def spmv(self, alpha, y_out=None) -> jax.Array:
        """y = alpha * A @ x (anonymouslib_cuda.h:262-285)."""
        if self._x is None:
            raise ValueError("setX first (Status.INVALID_HANDLE)")
        if self._format == Format.CSR5 and self._csr5_sliced is not None:
            from ..ops.bigslice import sliced_spmv

            y = sliced_spmv(self._csr5_sliced, self._x, alpha)
        elif self._format == Format.CSR5:
            y = csr5_spmv(self._csr5, self._x, alpha, backend=self._backend)
        elif self._format == Format.CSR:
            y = csr_spmv(self._csr, self._x, alpha)
        else:
            raise ValueError("no matrix loaded (Status.INVALID_HANDLE)")
        return y

    def spmm(self, x_mat, alpha=1.0) -> jax.Array:
        """Y = alpha * A @ X for X (n, R) (multi-rhs extension; the
        reference has no SpMM -- BASELINE.json configs[3])."""
        from ..ops.csr5_spmv import csr5_spmm

        x_mat = jnp.asarray(x_mat)
        if x_mat.ndim != 2 or x_mat.shape[0] != self.shape[1]:
            raise ValueError("X must be (n, R) (Status.INVALID_HANDLE)")
        if self._format != Format.CSR5:
            raise ValueError("asCSR5 first (Status.INVALID_HANDLE)")
        if self._csr5 is None:
            # VMEM-oversized matrix held in row-sliced form: the sliced
            # SpMM path windows X per slice (ops/bigslice.sliced_spmm).
            # Slices from as_csr5 were sized for one rhs; re-slice for R
            # so each slice's R-fold x/y residency keeps the Pallas path
            # (cached until R changes).
            from ..ops.bigslice import build_csr5_sliced, sliced_spmm

            R = int(x_mat.shape[1])
            if getattr(self, "_csr5_sliced_rhs", 1) != R:
                src = (
                    self._host_csr if self._host_csr is not None else self._csr
                )
                cfg = CSR5Config(sigma=self.compute_sigma())
                sl_r = build_csr5_sliced(src, cfg, num_rhs=R)
                if sl_r is not None:
                    self._csr5_sliced = sl_r
                    self._csr5_sliced_rhs = R
            return sliced_spmm(self._csr5_sliced, x_mat, alpha)
        return csr5_spmm(self._csr5, x_mat, alpha, backend=self._backend)

    def destroy(self) -> int:
        """Release state; converts back to CSR first like the reference's
        destroy() -> asCSR() (anonymouslib_cuda.h:287-292)."""
        if self._format == Format.CSR5:
            self.as_csr()
        self._csr = None
        self._csr5 = None
        self._csr5_sliced = None
        self._host_csr = None
        self._x = None
        self._format = None
        return int(Status.SUCCESS)

    # -- camelCase aliases for reference-driver parity --------------------
    inputCSR = input_csr
    asCSR5 = as_csr5
    asCSR = as_csr
    setX = set_x
    setSigma = set_sigma
    computeSigma = compute_sigma

    # -- introspection -----------------------------------------------------
    @property
    def format(self) -> Optional[Format]:
        return self._format

    @property
    def csr5(self) -> Optional[CSR5Matrix]:
        return self._csr5

    @property
    def csr(self) -> Optional[CSRMatrix]:
        return self._csr
