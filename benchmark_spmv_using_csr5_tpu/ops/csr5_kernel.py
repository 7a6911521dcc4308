"""The CSR5 SpMV Pallas TPU kernel.

TPU re-design of the reference's 3-kernel CUDA pipeline
(``csr5_spmv_cuda.h:275-419``). One kernel makes a single sequential pass
over all (sigma, 128) tiles (incl. the zero-padded tail tile); per tile:

1. **x page gather** (replaces the per-lane ``fetch_x`` texture gathers,
   csr5_spmv_cuda.h:7-23): x resides whole in VMEM as (n/128, 128). The
   conversion stored each tile's distinct 128-column page list; the kernel
   loops over them, dynamic-slice loads the (1,128) page, lane-shuffles it
   by ``col & 127`` (``take_along_axis`` along lanes -- the TPU analogue of
   ``__shfl``) and accumulates where ``col >> 7`` matches the page.
2. **tile-local inclusive prefix scan** of the products in element order
   (lane-major), via log-step rolls: the vectorised equivalent of the
   fast/normal-track FMA loops + ``segmented_sum_shfl`` warp scans
   (csr5_spmv_cuda.h:25-57,91-200).
3. **routed window extraction**: gathers the prefix at each row's last
   element using the conversion's monotone row-end maps (derived from
   bit_flag/y_offset/empty_offset; NOTES.md) and differences neighbours to
   get per-row partial sums -- including the empty-row indirection
   (format_cuda.h:362-523) and the partial first/last rows.
4. **sequential window accumulation** into the VMEM-resident y: because
   the TPU grid runs in order on one core, overlapping row windows of
   consecutive tiles accumulate directly -- subsuming the calibrator
   (csr5_spmv_cuda.h:313-382) and tail-partition (:384-419) kernels.

Per-tile scalar metadata (row start, page count, page ids) lives in one
packed int32 plane in HBM, DMA'd per grid block into SMEM scratch (SMEM is
1 MiB on v5e -- whole-matrix scalar prefetch does not scale; NOTES.md).

Static limits of this kernel (checked by :func:`pallas_supported`; the XLA
executor covers the rest): f32/bf16 values, sigma a multiple of 8, x and y
resident in VMEM, page lists within the SMEM block budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.formats import CSR5Matrix

LANES = 128
#: meta plane layout: [row_start, page_cnt, <pad...>, pages[0:pmax]]
META_HDR = 8

# v1 residency limits (x + y + double-buffered blocks must fit VMEM)
_VMEM_BUDGET = 96 * 1024 * 1024
_SMEM_BLOCK_BUDGET = 256 * 1024


def _meta_width(pmax: int) -> int:
    # DMA-sliceable planes need a lane-aligned (128-multiple) minor dim
    return -(-(META_HDR + pmax) // LANES) * LANES


def pallas_supported(a5: CSR5Matrix) -> bool:
    cfg = a5.config
    if a5.val_tiles.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if cfg.sigma % 8 != 0 or cfg.omega != LANES:
        return False
    B = cfg.tiles_per_block
    blk = B * cfg.tile_nnz * 8 * 2 + B * a5.capw * 8 * 2
    vmem = (a5.n_pad + a5.m_pad) * 4 + blk
    if vmem > _VMEM_BUDGET:
        return False
    if B * _meta_width(a5.pmax) * 4 > _SMEM_BLOCK_BUDGET:
        return False
    return True


def build_meta_plane(a5: CSR5Matrix) -> np.ndarray:
    """Pack per-tile scalars into the (p, META_HDR+pmax) int32 plane."""
    p, pmax = a5.num_tiles, a5.pmax
    meta = np.zeros((p, _meta_width(pmax)), dtype=np.int32)
    meta[:, 0] = np.asarray(a5.tile_ptr[:-1])
    meta[:, 1] = np.asarray(a5.page_cnt)
    meta[:, META_HDR : META_HDR + pmax] = np.asarray(a5.pages)
    return meta


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _sub_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _inclusive_scan(t, axis, size):
    """Log-step inclusive scan along `axis` via rolls + masked adds."""
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    s = 1
    while s < size:
        t = t + jnp.where(iota >= s, pltpu.roll(t, s, axis=axis), 0)
        s *= 2
    return t


def _taa_sub8(blocks, idx, sigma):
    """out[j] = blocks[idx[j], j] for blocks (sigma,128), idx (1,128) in
    [0, sigma): sublane gather built from dom-8 take_along_axis chunks
    (the only sublane gather Mosaic lowers; NOTES.md)."""
    idx8 = jnp.broadcast_to(idx & 7, (8, LANES))
    out = jnp.zeros((1, LANES), blocks.dtype)
    for c in range(sigma // 8):
        chunk = blocks[c * 8 : (c + 1) * 8, :]
        g = jnp.take_along_axis(chunk, idx8, axis=0)[0:1]
        out = jnp.where((idx >> 3) == c, g, out)
    return out


def _spmv_kernel(
    alpha_ref,  # (1,) f32 SMEM
    meta_hbm,  # (p, META_HDR+pmax) i32, ANY (DMA'd per block)
    col_ref,  # (B*sigma, 128) i32 VMEM block
    val_ref,  # (B*sigma, 128) f32 VMEM block
    wsub_ref,  # (B, capw) i32 VMEM block
    wlane_ref,  # (B, capw) i32 VMEM block
    x_ref,  # (n_pad/128, 128) f32 VMEM whole
    y_ref,  # (m_pad/128, 128) f32 VMEM whole (output)
    meta_smem,  # (B, META_HDR+pmax) i32 SMEM scratch
    meta_sem,  # DMA semaphore
    *,
    B: int,
    sigma: int,
    pmax: int,
    capw: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:] = jnp.zeros_like(y_ref)

    cp = pltpu.make_async_copy(meta_hbm.at[pl.ds(i * B, B), :], meta_smem, meta_sem)
    cp.start()
    cp.wait()

    G = capw // LANES
    alpha = alpha_ref[0]

    for b in range(B):  # static unroll over tiles in the block
        col = col_ref[pl.ds(b * sigma, sigma), :]
        val = val_ref[pl.ds(b * sigma, sigma), :] * alpha

        # ---- 1. x page-loop gather --------------------------------------
        lane = col & (LANES - 1)
        page_of = col >> 7
        cnt = meta_smem[b, 1]

        def page_body(k, acc):
            pid = meta_smem[b, META_HDR + k]
            xrow = x_ref[pl.ds(pid, 1), :]  # (1,128)
            g = jnp.take_along_axis(
                jnp.broadcast_to(xrow, (sigma, LANES)), lane, axis=1
            )
            return acc + jnp.where(page_of == pid, g, 0.0)

        xg = jax.lax.fori_loop(0, cnt, page_body, jnp.zeros((sigma, LANES), jnp.float32))
        prod = val * xg

        # ---- 2. tile-local prefix in element order (lane-major) ---------
        pv = _inclusive_scan(prod, axis=0, size=sigma)  # within-lane
        lane_tot = pv[sigma - 1 : sigma, :]  # (1,128)
        lane_incl = _inclusive_scan(lane_tot, axis=1, size=LANES)
        lane_excl = lane_incl - lane_tot
        P = pv + lane_excl  # (sigma,128): P[s,l] = prefix at elem l*sigma+s

        # ---- 3. routed window extraction --------------------------------
        rs = meta_smem[b, 0]
        a_off = rs & (LANES - 1)  # first valid slot in the window
        w_groups = []
        for g in range(G):
            wl = wlane_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
            ws = wsub_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
            # R1[s, j] = P[s, wl[j]]
            R1 = jnp.take_along_axis(P, jnp.broadcast_to(wl, (sigma, LANES)), axis=1)
            w_groups.append(_taa_sub8(R1, ws, sigma))
        W_end = jnp.concatenate(w_groups, axis=0)  # (G,128)

        # W_prev[d] = W_end[d-1] across the flattened window
        rolled = pltpu.roll(W_end, 1, axis=1)
        down = pltpu.roll(W_end, 1, axis=0)
        W_prev = jnp.where(
            _lane_iota(W_end.shape) == 0, pltpu.roll(down, 1, axis=1), rolled
        )

        d_idx = _sub_iota(W_end.shape) * LANES + _lane_iota(W_end.shape)
        W_prev = jnp.where(d_idx - 1 >= a_off, W_prev, 0.0)
        W2 = jnp.where(d_idx >= a_off, W_end - W_prev, 0.0)

        # ---- 4. sequential window accumulation --------------------------
        by = rs >> 7  # window base row-block (128-row aligned)
        y_ref[pl.ds(by, G), :] += W2


def _make_pallas_call(p, B, sigma, pmax, capw, n_pad, m_pad, interpret):
    kernel = functools.partial(_spmv_kernel, B=B, sigma=sigma, pmax=pmax, capw=capw)
    mw = _meta_width(pmax)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.float32),
        grid=(p // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha
            pl.BlockSpec(memory_space=pl.ANY),  # meta plane (HBM)
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, capw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, capw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole
        ],
        out_specs=pl.BlockSpec(
            (m_pad // LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((B, mw), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * sigma * LANES,
            bytes_accessed=p * sigma * LANES * 8 + (m_pad + n_pad) * 4,
            transcendentals=0,
        ),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _csr5_spmv_pallas_jit(a5: CSR5Matrix, meta, x, alpha, interpret: bool):
    cfg = a5.config
    p = a5.num_tiles
    sigma = cfg.sigma
    n_pad, m_pad = a5.n_pad, a5.m_pad

    x_pad = jnp.zeros(n_pad, jnp.float32).at[: a5.n].set(x.astype(jnp.float32))
    x2d = x_pad.reshape(n_pad // LANES, LANES)
    col2d = a5.col_idx_tiles.reshape(p * sigma, LANES)
    val2d = a5.val_tiles.astype(jnp.float32).reshape(p * sigma, LANES)

    call = _make_pallas_call(
        p, cfg.tiles_per_block, sigma, a5.pmax, a5.capw, n_pad, m_pad, interpret
    )
    y2d = call(
        jnp.asarray(alpha, jnp.float32).reshape(1),
        meta,
        col2d,
        val2d,
        a5.win_sub,
        a5.win_lane,
        x2d,
    )
    return y2d.reshape(-1)[: a5.m].astype(x.dtype)


# meta planes are cached per CSR5Matrix identity (built once per conversion)
_META_CACHE: dict = {}


def csr5_spmv_pallas(
    a5: CSR5Matrix, x: jax.Array, alpha=1.0, interpret: bool = False
) -> jax.Array:
    """y = alpha * A @ x via the Pallas CSR5 kernel."""
    key = id(a5.pages)
    meta = _META_CACHE.get(key)
    if meta is None:
        meta = jnp.asarray(build_meta_plane(a5))
        _META_CACHE[key] = meta
    return _csr5_spmv_pallas_jit(a5, meta, x, alpha, interpret)
