"""HYB5: the hybrid DIA + CSR5 format.

The reference *declares* ``ANONYMOUSLIB_FORMAT_HYB5 = 2``
(CSR5_cuda/detail/common.h:21) but never implements it; this module
builds it TPU-natively. Nonzeros on *dense* diagonals (fill ratio above
``diag_fill``) execute through the DIA kernel's static shift network
(no column stream, no gather); the irregular remainder goes through the
general CSR5 kernel; ``y = A_dia x + A_csr5 x`` with the add fused by
XLA. This is the classic structured+scattered split (cf. ELL+COO "HYB"
on GPUs), mapped to this framework's two Pallas kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import CSR5Config
from ..models.formats import CSR5Matrix
from .convert import build_csr5
from .csr5_kernel import csr5_spmv_pallas, pallas_supported
from .csr5_spmv import csr5_spmv_xla
from .dia import MAX_DIAGS, DIAMatrix, build_dia, dia_spmv, dia_spmv_xla, dia_supported


@struct.dataclass
class HYBMatrix:
    """DIA part + CSR5 part; either may be None (degenerate splits)."""

    shape: Tuple[int, int] = struct.field(pytree_node=False)
    nnz_stored: int = struct.field(pytree_node=False)
    dia: Optional[DIAMatrix] = None
    csr5: Optional[CSR5Matrix] = None

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return self.nnz_stored


def _as_host(csr):
    if isinstance(csr, tuple):
        row_ptr, col_idx, values, shape = csr
    elif hasattr(csr, "indptr"):
        row_ptr, col_idx, values, shape = csr.indptr, csr.indices, csr.data, csr.shape
    else:
        row_ptr, col_idx, values, shape = csr.row_ptr, csr.col_idx, csr.values, csr.shape
    return (
        np.asarray(row_ptr, np.int64),
        np.asarray(col_idx, np.int64),
        np.asarray(values),
        tuple(shape),
    )


def build_hyb(
    csr,
    diag_fill: float = 0.5,
    max_diags: int = MAX_DIAGS,
    config: Optional[CSR5Config] = None,
) -> HYBMatrix:
    """Split nonzeros into dense diagonals (DIA) and the rest (CSR5).

    A diagonal is "dense" when it holds at least ``diag_fill`` of its
    maximum possible length; the densest ``max_diags`` qualify. Either
    side may come out empty (pure-banded -> no CSR5 part, unstructured
    -> no DIA part), in which case the corresponding field is None.
    """
    row_ptr, col_idx, values, (m, n) = _as_host(csr)
    nnz = int(values.shape[0])
    if nnz == 0:
        return HYBMatrix(shape=(m, n), nnz_stored=0)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(row_ptr))
    off = col_idx - rows
    uniq, inv, counts = np.unique(off, return_inverse=True, return_counts=True)
    # max length of diagonal o on an (m, n) matrix
    length = np.minimum(m, n - uniq) - np.maximum(0, -uniq)
    fill = counts / np.maximum(length, 1)
    dense = fill >= diag_fill
    if dense.sum() > max_diags:
        cut = np.sort(fill[dense])[::-1][max_diags - 1]
        dense &= fill >= cut
        # ties may still exceed the cap: keep the first max_diags
        keep_idx = np.flatnonzero(dense)[:max_diags]
        dense = np.zeros_like(dense)
        dense[keep_idx] = True

    on_dia = dense[inv]
    dia = None
    if on_dia.any():
        sel = np.flatnonzero(on_dia)
        d_rows = rows[sel]
        d_off = off[sel]
        d_uniq = uniq[dense]
        from .dia import CHUNK_ROWS, LANES

        m_pad = -(-m // CHUNK_ROWS) * CHUNK_ROWS
        # interleaved (m_pad/128, ndiag, 128) layout, scattered into
        # directly — one contiguous DMA per kernel grid step (2.2-3.9x
        # over diag-major; see DIAMatrix / NOTES.md)
        data = np.zeros((m_pad // LANES, len(d_uniq), LANES), values.dtype)
        k = np.searchsorted(d_uniq, d_off)
        np.add.at(data, (d_rows >> 7, k, d_rows & (LANES - 1)), values[sel])
        dia = DIAMatrix(
            shape=(m, n),
            offsets=tuple(int(o) for o in d_uniq),
            nnz_stored=int(len(sel)),
            data=jnp.asarray(data),
            m_pad=m_pad,
            interleaved=True,
        )

    csr5 = None
    if not on_dia.all():
        keep = ~on_dia
        r_rows = rows[keep]
        counts_r = np.bincount(r_rows, minlength=m)
        rp2 = np.zeros(m + 1, np.int64)
        np.cumsum(counts_r, out=rp2[1:])
        csr5 = build_csr5(
            (rp2, col_idx[keep].astype(np.int32), values[keep], (m, n)),
            config,
        )

    return HYBMatrix(shape=(m, n), nnz_stored=nnz, dia=dia, csr5=csr5)


def hyb_spmv(
    h: HYBMatrix,
    x: jax.Array,
    alpha=1.0,
    csr5_backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """y = alpha * A @ x = DIA part + CSR5 part."""
    parts = []
    if h.dia is not None:
        # gate the Pallas DIA kernel exactly like the CSR5 side: an f64 or
        # VMEM-oversized diagonal plane falls back to the XLA path instead
        # of failing at Mosaic compile time (interpret mode has no limits)
        if interpret or dia_supported(h.dia):
            parts.append(dia_spmv(h.dia, x, alpha, interpret=interpret))
        else:
            parts.append(dia_spmv_xla(h.dia, x, alpha))
    if h.csr5 is not None:
        backend = csr5_backend
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() == "tpu" and pallas_supported(h.csr5)
                else "xla"
            )
        if backend == "pallas":
            parts.append(csr5_spmv_pallas(h.csr5, x, alpha, interpret=interpret))
        else:
            parts.append(csr5_spmv_xla(h.csr5, x, alpha))
    if not parts:
        return jnp.zeros(h.m, x.dtype)
    y = parts[0]
    for p in parts[1:]:
        y = y + p
    return y


def hyb_spmm(
    h: HYBMatrix,
    x: jax.Array,
    alpha=1.0,
    csr5_backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Y = alpha * A @ X for X (n, R): DIA part + CSR5 part.

    Multi-rhs extension of :func:`hyb_spmv`; both sub-kernels stream their
    value planes once and reuse them across the R right-hand sides.
    """
    from .csr5_kernel import csr5_spmm_pallas, pallas_spmm_supported
    from .csr5_spmv import csr5_spmm_xla
    from .dia import dia_spmm, dia_spmm_supported, dia_spmm_xla

    parts = []
    if h.dia is not None:
        # R-aware gate: the SpMM kernel keeps R stacked x planes in VMEM
        if interpret or dia_spmm_supported(h.dia, x.shape[1]):
            parts.append(dia_spmm(h.dia, x, alpha, interpret=interpret))
        else:
            parts.append(dia_spmm_xla(h.dia, x, alpha))
    if h.csr5 is not None:
        backend = csr5_backend
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() == "tpu"
                and pallas_spmm_supported(h.csr5, x.shape[1])
                else "xla"
            )
        if backend == "pallas":
            parts.append(csr5_spmm_pallas(h.csr5, x, alpha, interpret=interpret))
        else:
            parts.append(csr5_spmm_xla(h.csr5, x, alpha))
    if not parts:
        return jnp.zeros((h.m, x.shape[1]), x.dtype)
    y = parts[0]
    for p in parts[1:]:
        y = y + p
    return y
