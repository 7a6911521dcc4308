"""Dense band-block SpMM: the MXU path for multi-rhs sparse products.

Why this exists: SpMM on the CSR5 gather kernel costs exactly R x the
SpMV — the per-element x gather, window extraction and y update are all
per-rhs VPU work (BENCH_r02 spmm8 = 2.20 ms = 8 x 0.275; the DIA SpMM
has the same per-rhs wall at 2.42 ms — NOTES round 3). The reference has
no SpMM at all (SpMM is the BASELINE.json configs[3] extension), so the
TPU-native answer is free to change representation: for matrices whose
128-row blocks touch a bounded column window (banded, stencil,
RCM-reordered — the same class as the tier-0 gather and the row-sliced
executor, ops/bigslice.py), store each block DENSE over its window and
contract on the MXU:

    Y^T[:, blk] (R,128) = X^T[:, c0(blk) : c0(blk)+K] (R,K) @ A_blk^T (K,128)

- the dense plane streams from HBM ONCE for all R right-hand sides (the
  amortization the gather kernel cannot reach: its per-rhs VPU work
  scales with R, this path's VPU work is O(1) per block);
- the FLOPs ride the MXU (otherwise idle in every sparse kernel here);
- zero-padding waste is bounded by the build gate (``max_bytes_ratio``
  vs the CSR5 stream) so unsuitable matrices reject to the CSR5 kernel.

Measured on one TPU v5e chip (banded500k bw=27, R=8, f32, K=384):
1.556 ms exact vs scipy = 1.4x the CSR5 SpMM kernel, 494 GB/s of dense
stream. Design constraints measured on real Mosaic (scripts/
probe_bandmm.py, NOTES round 3): SMEM whole arrays must be WIDE
((1, nblk); (nblk, 1) crashes the compiler), the x-window dynamic slice
lowers only on the LANE axis at 128-aligned offsets, only ONE such
slice per kernel body compiles at full scale (NB>=2 block batching and
8-aligned offsets crash), and ``Precision.HIGH`` is unsupported
(DEFAULT = one bf16 pass with f32 accumulation; HIGHEST = 6-pass exact
f32 at +21%).

Precision semantics: DEFAULT rounds the matmul operands to bf16 and
accumulates in f32 — EXACT for integer-class values (the benchmark
convention, main.cu:317-326) and <= ~2^-8 relative for general floats
(inside the reference's 1%% validation gate, main.cu:361-384). The
AUTO gate (default behaviour) keeps real-valued users safe without an
oracle: ``build_bandblock`` stores bf16 only when every matrix value
round-trips bf16 EXACTLY (then the A-side rounding error is provably
zero), otherwise it stores f32 and ``bandmm_spmm(precision="auto")``
escalates to ``Precision.HIGHEST`` (exact f32 products, measured +21%%).
Residual bf16 rounding of the x operand only occurs on the bf16 plane,
where the caller's values were integer-class — the benchmark shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.hostmem import arena_take

LANES = 128
#: per-block column-window width cap (VMEM block + waste bound)
MAX_K = 4096
#: reject when the dense plane exceeds this multiple of the CSR5 stream
#: (val+col = 8 B/nnz) — beyond it the bandwidth amortization over R
#: right-hand sides cannot win against the gather kernel
MAX_BYTES_RATIO = 10.0
_VMEM_BUDGET = 96 * 1024 * 1024


@struct.dataclass
class BandBlockMatrix:
    """Dense band-block form: 128-row blocks over per-block 128-aligned
    column windows of uniform (static) width K."""

    dense: jax.Array  # (m_pad, K) f32: block b rows = [b*128, b*128+128)
    c0: jax.Array  # (1, nblk) int32: window start column per block
    shape: tuple = struct.field(pytree_node=False)
    K: int = struct.field(pytree_node=False)
    nx_pad: int = struct.field(pytree_node=False)  # padded x^T columns
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
    def num_blocks(self) -> int:
        return self.dense.shape[0] // LANES

    @property
    def dense_bytes(self) -> int:
        return self.dense.size * self.dense.dtype.itemsize


def build_bandblock(
    csr,
    max_k: int = MAX_K,
    max_bytes_ratio: float = MAX_BYTES_RATIO,
    value_dtype=None,
) -> Optional[BandBlockMatrix]:
    """CSR -> dense band-block form, or None when the matrix's 128-row
    blocks do not have bounded column windows (the gate: uniform window
    width K <= max_k AND dense bytes <= max_bytes_ratio x the 8 B/nnz
    CSR5 stream). ``csr`` is (row_ptr, col_idx, values, shape), a scipy
    CSR matrix, or a CSRMatrix (host arrays preferred; see convert).

    ``value_dtype=None`` (default) auto-selects the storage: **bfloat16**
    when every value round-trips bf16 exactly (integer-class values — the
    A-side rounding error is then provably zero, and the SpMM's DEFAULT
    matmul precision rounds operands to bf16 anyway, so bf16 storage is
    bit-identical while halving the dense HBM stream and the
    host->device upload: measured 1.55 -> 1.30 ms on spmm8, and the
    768 MB upload once took 75 s on a degraded tunnel), **float32**
    otherwise (real-valued data; ``precision="auto"`` then runs exact
    HIGHEST products). Pass an explicit dtype to override the gate."""
    from ..utils import progress
    from .convert import _as_host_csr

    progress.emit("bandmm:build")
    row_ptr, col_idx, values, (m, n) = _as_host_csr(csr)
    nnz = int(values.shape[0])
    if nnz == 0 or m == 0:
        return None
    nblk = -(-m // LANES)
    m_pad = nblk * LANES

    # per-block column ranges (one reduceat pass, as ops/bigslice.py)
    starts = row_ptr[np.minimum(np.arange(nblk) * LANES, m)].astype(np.int64)
    ends = row_ptr[np.minimum(np.arange(1, nblk + 1) * LANES, m)].astype(
        np.int64
    )
    ne = np.flatnonzero(ends > starts)
    cmin = np.zeros(nblk, np.int64)
    cmax = np.zeros(nblk, np.int64)
    if ne.size:
        cmin[ne] = np.minimum.reduceat(col_idx, starts[ne])
        cmax[ne] = np.maximum.reduceat(col_idx, starts[ne])
    # window start 128-aligned (the only dynamic-slice grain Mosaic
    # lowers for the lane axis); uniform K = max padded span
    c0 = (cmin >> 7) << 7
    span = int((cmax - c0 + 1).max()) if nblk else 1
    K = -(-max(span, 1) // LANES) * LANES
    if K > max_k:
        return None
    dense_bytes = m_pad * K * 4
    if dense_bytes > max_bytes_ratio * nnz * 8:
        return None

    # store window starts as PAGE indices: the kernel multiplies by 128,
    # which is how Mosaic PROVES the lane-dim slice offset is 128-aligned
    # (a raw SMEM column value crashes the compiler — measured)
    c0_meta = np.zeros((1, nblk), np.int32)
    c0_meta[0, :] = c0 >> 7
    from ..utils import nativelib

    dense = nativelib.bandblock_fill(
        row_ptr, col_idx, values, c0_meta[0], m, m_pad, K, arena="bb:dense"
    )
    if dense is None:
        # numpy fallback: flat scatter idx = row*K + (col - c0[row>>7]);
        # CSR (row, col) pairs are unique so fancy assignment is race-free
        dense = arena_take((m_pad, K), np.float32, "bb:dense")
        rows = arena_take(nnz, np.int64, "bb:rows", zero=False)
        _expand_rows(row_ptr, m, rows)
        idx = arena_take(nnz, np.int64, "bb:idx", zero=False)
        c0e = arena_take(nnz, np.int64, "bb:c0e", zero=False)
        np.right_shift(rows, 7, out=idx)  # owning block of each nonzero
        np.take(c0, idx, out=c0e)  # its window start
        np.subtract(col_idx, c0e, out=idx)  # window-local column
        np.multiply(rows, K, out=rows)  # rows not needed past this point
        np.add(idx, rows, out=idx)
        dense.reshape(-1)[idx] = values
    if value_dtype is None:
        import ml_dtypes

        # the precision gate: bf16 storage only when provably lossless
        # for the matrix values (see module docstring)
        value_dtype = (
            ml_dtypes.bfloat16 if _bf16_roundtrip_exact(values) else np.float32
        )
    vdt = np.dtype(value_dtype)
    if vdt != np.float32:
        d16 = arena_take((m_pad, K), vdt, "bb:dense16", zero=False)
        np.copyto(d16, dense, casting="unsafe")
        dense = d16
    return BandBlockMatrix(
        dense=jnp.array(dense),
        c0=jnp.array(c0_meta),
        shape=(m, n),
        K=K,
        nx_pad=int(c0.max()) + K,
        nnz_stored=nnz,
    )


def _bf16_roundtrip_exact(values: np.ndarray) -> bool:
    """True iff every value survives f32 -> bf16 -> f32 unchanged (then
    bf16 storage introduces zero A-side error). Arena-bounced to dodge
    the fresh-mapping first-write pathology (CLAUDE.md platform rules)."""
    import ml_dtypes

    nnz = int(values.shape[0])
    if nnz == 0:
        return True
    v32 = np.asarray(values)
    if v32.dtype != np.float32:
        buf = arena_take(nnz, np.float32, "bb:v32", zero=False)
        np.copyto(buf, v32, casting="unsafe")
        v32 = buf
    b16 = arena_take(nnz, ml_dtypes.bfloat16, "bb:v16", zero=False)
    np.copyto(b16, v32, casting="unsafe")
    rt = arena_take(nnz, np.float32, "bb:v16r", zero=False)
    np.copyto(rt, b16, casting="unsafe")
    return bool(np.array_equal(rt, v32))


def _expand_rows(row_ptr: np.ndarray, m: int, out: np.ndarray) -> None:
    """out[k] = row of nonzero k (np.repeat into an arena buffer)."""
    # np.repeat allocates; keep it but bounce through the arena target so
    # repeated builds reuse pages
    out[:] = np.repeat(np.arange(m, dtype=np.int64), np.diff(row_ptr))


def bandmm_supported(bb: Optional[BandBlockMatrix], num_rhs: int) -> bool:
    """VMEM gate: x^T resident + double-buffered dense blocks."""
    if bb is None or num_rhs < 1:
        return False
    rp = -(-max(num_rhs, 1) // 8) * 8
    esz = bb.dense.dtype.itemsize
    vmem = rp * bb.nx_pad * 4 + 2 * LANES * bb.K * esz + 2 * rp * LANES * 4
    return vmem <= _VMEM_BUDGET


def _bandmm_kernel(c0_ref, a_ref, xt_ref, out_ref, *, K, Rp, prec):
    """One 128-row block: lane-windowed x^T read + one MXU contraction.

    Replaces, for all R right-hand sides at once, what the CSR5 kernel
    does per-rhs with VPU gathers (csr5_spmv_cuda.h:91-200's x fetch +
    segmented sum have no analogue here: rows live whole in the block).
    """
    c0 = c0_ref[0, pl.program_id(0)] * LANES  # page -> column (alignment
    # is provable to Mosaic only through this multiply)
    xw = xt_ref[:, pl.ds(c0, K)]  # (Rp, K); 128-aligned lane-dim slice
    a_op = a_ref[:]
    if a_op.dtype != jnp.float32:
        # bf16 dense plane: cast the x window to match and let the MXU
        # run its native bf16 pass — bit-identical to DEFAULT-precision
        # f32 (which rounds both operands to bf16), half the stream
        xw = xw.astype(a_op.dtype)
    out_ref[:] = jax.lax.dot_general(
        xw,
        a_op,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


@partial(jax.jit, static_argnames=("precision", "interpret", "rn"))
def _bandmm_jit(bb: BandBlockMatrix, xm, alpha, precision: str, interpret, rn):
    R = xm.shape[0] if rn else xm.shape[1]
    Rp = -(-R // 8) * 8
    nblk = bb.num_blocks
    m_pad = nblk * LANES
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    # x^T (Rp, nx_pad): rhs-major lanes = columns (windows slice lanes).
    # rn=True takes X^T directly and skips the ~0.75 ms lane relayout.
    # nx_pad can be SMALLER than n (nonzero columns confined below the
    # right edge): columns >= nx_pad are referenced by no window, so
    # truncate before padding (a negative pad width is an error)
    xt = (xm if rn else xm.T).astype(jnp.float32) * jnp.asarray(
        alpha, jnp.float32
    )
    xt = xt[:, : bb.nx_pad]
    xt = jnp.pad(xt, ((0, Rp - R), (0, bb.nx_pad - xt.shape[1])))
    call = pl.pallas_call(
        partial(_bandmm_kernel, K=bb.K, Rp=Rp, prec=prec),
        out_shape=jax.ShapeDtypeStruct((Rp, m_pad), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # c0 (1, nblk), WIDE
            pl.BlockSpec(
                (LANES, bb.K), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x^T whole
        ],
        out_specs=pl.BlockSpec(
            (Rp, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nblk * LANES * bb.K * Rp,
            bytes_accessed=m_pad * bb.K * bb.dense.dtype.itemsize
            + Rp * (bb.nx_pad + m_pad) * 4,
            transcendentals=0,
        ),
    )
    yt = call(bb.c0, bb.dense, xt)
    ym = yt[:R, : bb.m]
    return ym.astype(xm.dtype) if rn else ym.T.astype(xm.dtype)


def bandmm_spmm(
    bb: BandBlockMatrix,
    x_mat: jax.Array,
    alpha=1.0,
    precision: str = "auto",
    interpret: bool = False,
    layout: str = "nr",
) -> jax.Array:
    """Y = alpha * A @ X on the MXU band-block path.

    ``layout="nr"`` (default): X (n, R) in, Y (m, R) out. ``layout="rn"``:
    X^T (R, n) in, Y^T (R, m) out — the solver-loop layout (see
    csr5_spmm_pallas). ``precision="auto"`` (default) follows the
    storage gate: exact HIGHEST f32 products on an f32-built plane
    (real-valued matrices), bf16-pass DEFAULT on a bf16 plane
    (integer-class matrices, where it is exact). ``"default"`` forces
    the one-pass bf16 matmul (<= ~2^-8 relative on general floats,
    inside the reference 1%% gate); ``"highest"`` forces exact f32
    products (+21%% runtime measured) and needs an f32-built matrix
    (``build_bandblock(value_dtype=np.float32)``).
    """
    if precision == "auto":
        precision = "highest" if bb.dense.dtype == jnp.float32 else "default"
    if precision == "highest" and bb.dense.dtype != jnp.float32:
        raise ValueError(
            "precision='highest' needs an f32 dense plane: "
            "build_bandblock(..., value_dtype=np.float32)"
        )
    return _bandmm_jit(bb, x_mat, alpha, precision, interpret, layout == "rn")


def bandmm_spmv(
    bb: BandBlockMatrix, x: jax.Array, alpha=1.0, **kw
) -> jax.Array:
    """y = alpha * A @ x (runs as R=1 SpMM; the CSR5 kernel is the better
    SpMV — this exists for API completeness and tests)."""
    return bandmm_spmm(bb, x[:, None], alpha, **kw)[:, 0]
