"""Row-sliced CSR5 execution for matrices beyond the VMEM residency model.

The Pallas kernel (ops/csr5_kernel.py) keeps x and y whole in VMEM, which
caps m + n at ~23M f32 elements; the reference kernel has no such cap —
one grid covers any tile count (csr5_spmv_cuda.h:275-311, launch at
:445-446). This module lifts the cap the TPU way: the matrix is cut into
ROW SLICES at conversion time, each slice a self-contained CSR5Matrix
over its own rows and a page-aligned COLUMN WINDOW [c0, c0 + n_k), sized
so that the slice's y and x-window fit the kernel's VMEM budget. One jit
then runs the (sequential) per-slice Pallas kernels back-to-back and
concatenates their outputs — a single dispatch, so the tunnel's ~1.5 ms
RPC floor is paid once, not per slice.

The column window is what makes this work on TPU: a slice only needs the
x rows its own columns touch, so matrices with bounded column span per
row range (banded, stencil, RCM-reordered — exactly the matrices whose
x-locality the gather tiers exploit) slice into O(m / slice_rows) pieces
with tiny windows. A slice whose window itself exceeds VMEM (a huge
fully-scattered matrix) cannot take this path; ``build_csr5_sliced``
returns None and callers fall back to the XLA executor.

Slice boundaries are chosen greedily over fixed row quanta: precompute
per-quantum column min/max (one O(nnz) reduceat pass), then extend each
slice while y + x-window stays inside the budget. Equal structure across
slices (the common case for uniform matrices) yields identical kernel
shapes, so Mosaic compiles once and reuses the binary for every slice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import AUTO_TUNED_SIGMA, CSR5Config, compute_sigma
from ..utils import progress
from ..utils.hostmem import arena_take
from .convert import _as_host_csr, build_csr5
from .csr5_kernel import _VMEM_BUDGET, csr5_spmv_pallas, pallas_supported

LANES = 128
#: row-quantum for the greedy slicer (boundaries land on multiples)
SLICE_QUANTUM_ROWS = 131_072
#: VMEM share available for x-window + y per slice (the rest covers the
#: double-buffered val/col/meta blocks and the scan scratch)
_SLICE_ELEM_CAP = int(_VMEM_BUDGET * 0.72) // 4


@struct.dataclass
class SlicedCSR5:
    """A row-sliced CSR5 matrix: slice k covers rows
    [row_starts[k], row_starts[k+1]) and columns [col_starts[k],
    col_starts[k] + slices[k].n)."""

    slices: Tuple  # tuple of CSR5Matrix (pytree children)
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    row_starts: Tuple[int, ...] = struct.field(pytree_node=False)
    col_starts: Tuple[int, ...] = struct.field(pytree_node=False)
    nnz_stored: int = struct.field(pytree_node=False, default=0)

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def nnz(self) -> int:
        return self.nnz_stored

    @property
    def num_slices(self) -> int:
        return len(self.slices)

    @property
    def sigma(self) -> int:
        return self.slices[0].sigma if self.slices else 0


def _slice_bounds(
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    m: int,
    elem_cap: int,
) -> Optional[list]:
    """Greedy row-slice boundaries [(r0, r1, c0, c1), ...] such that each
    slice's rows + page-aligned column window fit ``elem_cap`` elements.
    Returns None when some single quantum already exceeds the cap."""
    # quantum scales down with the cap so tiny test caps still slice;
    # production caps (~tens of M elements) use the full quantum. Must be
    # a multiple of 128 (slice row starts become 128-row y-flush offsets
    # in the fused executor) except in the single-slice m < 128 case.
    q = min(SLICE_QUANTUM_ROWS, m, max(128, -(-(elem_cap // 8) // 128) * 128))
    nq = -(-m // q)
    # per-quantum column ranges in one reduceat pass over col_idx
    starts = row_ptr[np.minimum(np.arange(nq) * q, m)]
    qmin = np.full(nq, np.iinfo(np.int64).max, dtype=np.int64)
    qmax = np.full(nq, -1, dtype=np.int64)
    nnz = len(col_idx)
    nonempty = np.flatnonzero(np.diff(np.append(starts, nnz)) > 0)
    if nonempty.size:
        idx = starts[nonempty].astype(np.int64)
        qmin[nonempty] = np.minimum.reduceat(col_idx, idx)
        qmax[nonempty] = np.maximum.reduceat(col_idx, idx)
    bounds = []
    k = 0
    while k < nq:
        r0 = k * q
        cmin, cmax = qmin[k], qmax[k]
        j = k
        while True:
            rows = min((j + 1) * q, m) - r0
            lo = 0 if cmin > cmax else (int(cmin) // 128) * 128
            win = 0 if cmin > cmax else int(cmax) + 1 - lo
            if rows + win > elem_cap:
                if j == k:
                    return None  # one quantum alone overflows the cap
                j -= 1
                break
            if j + 1 >= nq:
                break
            nmin = min(cmin, qmin[j + 1])
            nmax = max(cmax, qmax[j + 1])
            nrows = min((j + 2) * q, m) - r0
            nlo = 0 if nmin > nmax else (int(nmin) // 128) * 128
            nwin = 0 if nmin > nmax else int(nmax) + 1 - nlo
            if nrows + nwin > elem_cap:
                break
            cmin, cmax, j = nmin, nmax, j + 1
        r1 = min((j + 1) * q, m)
        # recompute the window of the accepted range (the probe loop may
        # have backed off)
        sel = qmin[k : j + 1]
        cmin = sel.min()
        cmax = qmax[k : j + 1].max()
        if cmin > cmax:  # all-empty slice
            bounds.append((r0, r1, 0, 128))
        else:
            c0 = (int(cmin) // 128) * 128
            bounds.append((r0, r1, c0, int(cmax) + 1))
        k = j + 1
    return bounds


def build_csr5_sliced(
    csr,
    config: Optional[CSR5Config] = None,
    sigma: int = AUTO_TUNED_SIGMA,
    value_dtype=None,
    elem_cap: Optional[int] = None,
    num_rhs: int = 1,
) -> Optional[SlicedCSR5]:
    """CSR -> row-sliced CSR5 for matrices beyond the VMEM residency cap.

    Returns None when the matrix cannot be sliced into VMEM-sized column
    windows (fully scattered rows at huge n) — callers then fall back to
    the XLA executor. ``elem_cap`` overrides the per-slice f32-element
    budget (tests use a tiny cap to force multi-slice builds).
    ``num_rhs > 1`` shrinks the per-slice budget so the SpMM kernel's
    per-rhs x windows and y blocks still fit (:func:`sliced_spmm`).
    """
    row_ptr, col_idx, values, (m, n) = _as_host_csr(csr)
    nnz = int(values.shape[0])
    if config is None:
        config = CSR5Config(sigma=compute_sigma(m, nnz, sigma))
    cap = elem_cap if elem_cap is not None else _SLICE_ELEM_CAP
    cap = cap // max(1, num_rhs)
    bounds = _slice_bounds(row_ptr, col_idx, m, cap)
    if bounds is None:
        return None
    slices = []
    row_starts = [0]
    col_starts = []
    for si, (r0, r1, c0, c1) in enumerate(bounds):
        progress.emit(f"slice:{si + 1}/{len(bounds)}")
        k0, k1 = int(row_ptr[r0]), int(row_ptr[r1])
        rp = arena_take(r1 - r0 + 1, np.int64, "sl:rp", zero=False)
        np.subtract(row_ptr[r0 : r1 + 1], k0, out=rp)
        ci = col_idx[k0:k1]
        if c0:
            # arena-backed (a fresh nnz-scale temp per slice otherwise
            # first-touches a new mapping each time; the same buffer is
            # reused by every slice)
            cs = arena_take(k1 - k0, np.int32, "sl:ci", zero=False)
            np.subtract(ci, np.int32(c0), out=cs)
            ci = cs
        n_k = max(c1 - c0, 128)
        a5 = build_csr5(
            (rp, ci, values[k0:k1], (r1 - r0, n_k)),
            config,
            value_dtype=value_dtype,
        )
        if not pallas_supported(a5):
            return None
        slices.append(a5)
        row_starts.append(r1)
        col_starts.append(c0)
    return SlicedCSR5(
        slices=tuple(slices),
        shape=(m, n),
        row_starts=tuple(row_starts),
        col_starts=tuple(col_starts),
        nnz_stored=nnz,
    )


@partial(jax.jit, static_argnames=("interpret", "scale"))
def _sliced_spmv_jit(sl: SlicedCSR5, x, alpha, interpret: bool, scale: bool):
    """The fused (xwin) executor: x stays ONE array in HBM — each slice's
    kernel DMAs its page-aligned column window into VMEM at grid step 0
    and flushes its y rows into ONE shared output buffer (aliased through
    the calls), so the host-level per-slice x slice/pad copies and the
    final y concatenate of the v1 executor are gone entirely. Offsets are
    kernel *data*, so uniform slices still share one Mosaic binary."""
    from .csr5_kernel import (
        _choose_block,
        _make_pallas_call,
        build_meta_plane,
    )

    nx = -(-sl.n // 128)
    xf = x.astype(jnp.float32)
    if scale:
        xf = xf * jnp.asarray(alpha, jnp.float32)
    if sl.n % 128:
        xf = jnp.pad(xf, (0, nx * 128 - sl.n))
    x2d = xf.reshape(nx, 128)

    out_rows = max(
        (r0 + a5.m_pad) // LANES
        for r0, a5 in zip(sl.row_starts, sl.slices)
    )
    y = jnp.zeros((out_rows, LANES), jnp.float32)
    for a5, r0, c0 in zip(sl.slices, sl.row_starts, sl.col_starts):
        cfg = a5.config
        p, sigma = a5.num_tiles, cfg.sigma
        meta = build_meta_plane(a5)
        packed = a5.col_packed is not None
        col2d = (
            a5.col_packed.reshape(p * (sigma // 2), LANES)
            if packed
            else a5.col_idx_tiles.reshape(p * sigma, LANES)
        )
        val2d = a5.val_tiles.reshape(p * sigma, LANES)
        B = _choose_block(a5)
        offs = jnp.array(
            [[c0 // LANES, r0 // LANES] + [0] * 6], jnp.int32
        )
        call = _make_pallas_call(
            p, B, sigma, a5.pmax, a5.capw, a5.n_pad, a5.m_pad, interpret,
            contig=a5.pages_contig, packed=packed, win_rel=a5.win_rel,
            out_rows=out_rows,
        )
        y = call(meta, col2d, val2d, a5.win_map, x2d, offs, y)
    return y.reshape(-1)[: sl.m].astype(x.dtype)


def sliced_spmv(
    sl: SlicedCSR5, x: jax.Array, alpha=1.0, interpret: bool = False
) -> jax.Array:
    """y = alpha * A @ x over the row slices — ONE jitted dispatch running
    the per-slice Pallas kernels sequentially (uniform slices share one
    Mosaic binary), each reading its x window straight from HBM and
    writing its y rows into the shared output buffer."""
    scale = not (isinstance(alpha, (int, float)) and float(alpha) == 1.0)
    return _sliced_spmv_jit(sl, x, alpha if scale else 1.0, interpret, scale)


@partial(jax.jit, static_argnames=("interpret",))
def _sliced_spmm_jit(sl: SlicedCSR5, xm, alpha, interpret: bool):
    from .csr5_kernel import csr5_spmm_pallas, pallas_spmm_supported
    from .csr5_spmv import csr5_spmm_xla

    xs = xm * jnp.asarray(alpha, xm.dtype)
    outs = []
    for a5, c0 in zip(sl.slices, sl.col_starts):
        xk = jax.lax.slice(
            xs, (c0, 0), (min(c0 + a5.n, sl.n), xm.shape[1])
        )
        if xk.shape[0] < a5.n:  # window pads past n (page alignment)
            xk = jnp.pad(xk, ((0, a5.n - xk.shape[0]), (0, 0)))
        use_pallas = pallas_spmm_supported(a5, xm.shape[1]) and (
            interpret or jax.default_backend() == "tpu"
        )
        if use_pallas:
            outs.append(csr5_spmm_pallas(a5, xk, interpret=interpret))
        else:
            outs.append(csr5_spmm_xla(a5, xk))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def sliced_spmm(
    sl: SlicedCSR5, x_mat: jax.Array, alpha=1.0, interpret: bool = False
) -> jax.Array:
    """Y = alpha * A @ X over the row slices (X is (n, R)); one jitted
    dispatch. Build the sliced form with ``num_rhs=R`` so each slice's
    windows were sized for the R-fold x/y residency."""
    return _sliced_spmm_jit(sl, x_mat, alpha, interpret)


def should_slice(m: int, n: int) -> bool:
    """True when the whole-matrix kernel's x+y residency cannot fit and
    the sliced path should be attempted first."""
    return m + n > _SLICE_ELEM_CAP
