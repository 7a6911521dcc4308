"""The CSR5 SpMV/SpMM Pallas TPU kernel.

TPU re-design of the reference's 3-kernel CUDA pipeline
(``csr5_spmv_cuda.h:275-419``). One kernel makes a single sequential pass
over blocks of B (sigma, 128) tiles (incl. the zero-padded tail tile);
per block, for each of the R right-hand sides:

1. **x gather** (replaces the per-lane ``fetch_x`` texture gathers,
   csr5_spmv_cuda.h:7-23): x resides whole in VMEM as (n/128+1, 128) with
   a final zero sentinel row; products land in a (sigma, R*B*128) VMEM
   scratch. Three tiers, chosen statically per matrix:

   - tier 0 (``pages_contig``): every tile's pages form a short
     consecutive range — ONE (pmax,128) slab load per tile, then per
     page ``take_along_axis`` lane-shuffle by ``col & 127`` (the TPU
     analogue of ``__shfl``) + masked accumulate where ``col >> 7``
     matches. The structured-matrix fast path (banded etc.).
   - tier 1 (pmax <= MAX_UNROLL_PAGES): static masked unroll over the
     tile's distinct-page list (sentinel-padded, so no data-dependent
     control flow; a per-page ``fori_loop`` serializes ~6x, NOTES.md).
   - tier 2 (<= MAX_FORI_PAGES): one block-level ``fori_loop`` over the
     max live page count; each iteration advances all B tiles' gathers
     (independent latency chains) via prod-scratch accumulation.

2. **batched MXU prefix scans**: the within-lane inclusive prefix over
   sigma for ALL R*B tiles of the block is ONE
   (sigma,sigma)@(sigma,R*B*128) matmul with a lower-triangular ones
   matrix; the cross-lane carries are one (R*B,128)@(128,128)
   strict-lower matmul. Replaces the fast/normal-track FMA loops +
   ``segmented_sum_shfl`` warp scans (csr5_spmv_cuda.h:25-57,91-200);
   per-tile matmuls carry ~100-cycle fixed MXU cost, batching them cut
   the kernel time in half (NOTES.md). ``Precision.HIGHEST`` keeps the
   scans f32-exact.

3. **routed window extraction**: gathers the prefix at each row's last
   element using the conversion's packed monotone row-end map (derived
   from bit_flag/y_offset/empty_offset; NOTES.md) and differences
   neighbours to get per-row partial sums — including the empty-row
   indirection (format_cuda.h:362-523) and the partial first/last rows.

4. **sequential window accumulation** into a VMEM *scratch* y that
   persists across the sequential grid (a pipelined output block would
   be written back to HBM every step — ~7x stream collapse): because the
   grid runs in order on one core, overlapping row windows of
   consecutive tiles accumulate directly — subsuming the calibrator
   (csr5_spmv_cuda.h:313-382) and tail-partition (:384-419) kernels. The
   final grid step DMAs y to the ANY-space output.

Per-tile scalar metadata (row start, page count, page ids) lives in one
packed int32 plane, streamed per grid block into SMEM via a blocked
BlockSpec (the pipeline double-buffers it like any other block input).

**Stream-compressed columns**: when every tile's distinct-page count fits
9 bits (pmax <= 512 — all structured and most irregular matrices), the
kernel streams ``CSR5Matrix.col_packed`` instead of the raw i32 columns:
uint16 ``lane | local_page<<7`` codes, two sigma-rows per int32. The
per-nnz stream drops from 8 B (f32+i32) to 6 B — 4 B with bf16 values —
which directly lowers the HBM-bound kernel's floor; the page-match masks
compare the *local* index against the unrolled page slot, which is also
cheaper than the global-page compare.

alpha is folded into x before the kernel (y = A @ (alpha x)).

Static limits of this kernel (checked by :func:`pallas_supported` /
:func:`pallas_spmm_supported`; the XLA executor covers the rest):
f32/bf16 values, sigma a multiple of 8, pmax <= MAX_FORI_PAGES, x and y
(x R) resident in VMEM.

Measured on one TPU v5e chip (f32, round-4 session-2 full-bench
shakedown, tiles_per_block=128): banded 500k x 14M nnz = 0.2122 ms =
99.0% of the reference bytes model over the 819 GB/s HBM roofline
(the model charges an x read per nnz; this kernel reads each x page
once per tile, so >100% is reachable), exact vs scipy. Run-to-run
spread ~±10%; the driver's BENCH_r*.json is the authoritative record.
See NOTES.md for the ablation history.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.formats import CSR5Matrix

LANES = 128
#: meta plane layout: [row_start, page_cnt, <pad...>, pages[0:pmax]]
META_HDR = 8
#: static page-unroll limit (tier 1); beyond it the gather switches to a
#: latency-hidden fori_loop over the page list (tier 2)
MAX_UNROLL_PAGES = 64
#: tier-2 page-list cap; matrices needing more pages per tile fall back
#: to the XLA executor
MAX_FORI_PAGES = 4096
#: tier-2 fori body processes this many pages per iteration (hides the
#: scalar-load -> dynamic-slice latency chain that serializes a plain
#: loop). Must divide 8 (page lists are sentinel-padded to a multiple of
#: 8). TPU sweep on powerlaw200k: U=1 7.04 ms / 2 5.71 / 4 4.48 /
#: 8 4.25 / 16 4.37 — the latency chain saturates at 8.
FORI_PAGE_UNROLL = 8

#: precision of the batched MXU prefix scans. HIGHEST = 6-pass (exact
#: f32); HIGH = 3-pass bf16x3 (~5e-7 relative, well inside the 1%% gate)
_SCAN_PRECISION = jax.lax.Precision.HIGHEST

# v1 residency limits (x + y + double-buffered blocks must fit VMEM)
_VMEM_BUDGET = 96 * 1024 * 1024
#: per-buffer cap for the double-buffered SMEM meta block (the core has
#: ~512 KB of usable SMEM, probed; leave headroom for the pipeline)
_SMEM_META_BUDGET = 160 * 1024


def _meta_width(pmax: int) -> int:
    # SMEM-blocked planes need a lane-aligned (128-multiple) minor dim
    return -(-(META_HDR + pmax) // LANES) * LANES


def _effective_block(cfg_tiles_per_block: int, pmax: int, num_tiles: int) -> int:
    """Largest power-of-two B <= tiles_per_block whose meta block fits SMEM.

    num_tiles is padded by the conversion to a multiple of
    min(tiles_per_block, pow2 >= p), so the doubling loop's divisibility
    check finds the largest usable power-of-two block.
    """
    B = 1
    while (
        B * 2 <= cfg_tiles_per_block
        and (B * 2) * _meta_width(pmax) * 4 <= _SMEM_META_BUDGET
        and num_tiles % (B * 2) == 0
    ):
        B *= 2
    return B


def _stream_bytes(a5: CSR5Matrix) -> int:
    """Per-nnz bytes the kernel streams: value + column plane."""
    colb = 2 if a5.col_packed is not None else 4
    return a5.val_tiles.dtype.itemsize + colb


def _vmem_estimate(a5: CSR5Matrix, B: int, R: int = 1) -> int:
    """Kernel VMEM bytes at block size B: resident x/y + double-buffered
    stream blocks + scratches (R=1 SpMV shape vs R>1 SpMM shape)."""
    cfg = a5.config
    blk = 2 * (B * cfg.tile_nnz * _stream_bytes(a5) + B * a5.capw * 4)  # x2 buf
    if R == 1:
        # scratches: products + masked window columns (xG) + lane totals
        scr = cfg.sigma * B * (LANES + a5.capw) * 4 + B * LANES * 4
    else:
        # scratches: products + prefixes (both (sigma, R*B*128)) + totals
        scr = cfg.sigma * R * B * 2 * LANES * 4 + R * B * LANES * 4
    return R * (a5.n_pad + LANES + a5.m_pad) * 4 + blk + scr


def _choose_block(a5: CSR5Matrix, R: int = 1) -> int:
    """The B the kernel actually launches with: the SMEM/divisibility
    pick of :func:`_effective_block`, halved until the VMEM estimate
    fits. Halving preserves divisibility (B stays a pow2 divisor of the
    padded tile count). Keeps big-capw/big-pmax matrices on the Pallas
    path at a smaller block instead of silently falling back to the
    ~100x-slower XLA executor (ADVICE r04: with the default B raised
    32->128 the per-block terms grew 4x and the gate could reject
    matrices that fit fine at B<=32)."""
    B = _effective_block(a5.config.tiles_per_block, a5.pmax, a5.num_tiles)
    while B > 1 and _vmem_estimate(a5, B, R) > _VMEM_BUDGET:
        B //= 2
    return B


def pallas_supported(a5: CSR5Matrix) -> bool:
    cfg = a5.config
    if a5.val_tiles.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if cfg.sigma % 8 != 0 or cfg.omega != LANES:
        return False
    if a5.pmax > MAX_FORI_PAGES:
        return False
    if _meta_width(a5.pmax) * 4 > _SMEM_META_BUDGET:
        return False
    return _vmem_estimate(a5, _choose_block(a5)) <= _VMEM_BUDGET


def build_meta_plane(a5: CSR5Matrix) -> jax.Array:
    """Pack per-tile scalars into the (p, META_HDR+pmax) int32 plane.

    Pure jnp (trace-safe): runs on device, so it also works on shard_map
    tracers in the distributed path.
    """
    p, pmax = a5.num_tiles, a5.pmax
    mw = _meta_width(pmax)
    parts = [
        a5.tile_ptr[:-1, None],
        a5.page_cnt[:, None],
        jnp.zeros((p, META_HDR - 2), jnp.int32),
        a5.pages,
    ]
    tail = mw - META_HDR - pmax
    if tail:
        parts.append(jnp.zeros((p, tail), jnp.int32))
    return jnp.concatenate(parts, axis=1).astype(jnp.int32)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _sub_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


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
    meta_ref,  # (B, mw) i32 SMEM block
    col_ref,  # (B*sigma, 128) i32 VMEM block ((B*sigma/2, 128) when packed)
    val_ref,  # (B*sigma, 128) f32 VMEM block
    win_ref,  # (B, capw) i32 VMEM block (packed sub | lane<<16)
    x_ref,  # (R*(n_pad/128 + 1), 128) f32 VMEM whole (zero sentinel rows)
    *rest,  # [xwin: off_ref SMEM (1,8), yprev_ref ANY] out_ref, scratches
    B: int,
    sigma: int,
    pmax: int,
    capw: int,
    R: int = 1,
    contig: bool = False,
    packed: bool = False,
    win_rel: bool = False,
    xwin: bool = False,
):
    """Kernel body. Default mode: x arrives whole as a VMEM block input
    and out_ref is this matrix's own (m_pad) buffer.

    ``xwin`` mode (the fused row-sliced path, ops/bigslice.py): x_ref is
    the FULL x in HBM (ANY); the slice's page-aligned column window
    [off_ref[0,0], +nxw) is DMA'd once into the xw_ref VMEM scratch at
    grid step 0 (plus a zero sentinel row), and the final flush DMAs y
    into the SHARED whole-matrix output at row offset off_ref[0,1]
    (yprev_ref is the previous slice's buffer, aliased to out_ref, so
    earlier slices' rows pass through untouched). Offsets are data, not
    statics — every uniform slice shares one Mosaic binary.
    """
    if xwin:
        (off_ref, yprev_ref, out_ref, y_ref, prod_ref, pv_ref, lt_ref,
         out_sem, xw_ref, x_sem) = rest
        del yprev_ref  # present only to alias the output buffer
    else:
        out_ref, y_ref, prod_ref, pv_ref, lt_ref, out_sem = rest

    # y accumulates in VMEM *scratch*, which persists across the
    # sequential grid; making y a pipelined output block instead causes
    # Pallas to write the whole window back to HBM every grid step
    # (~7x streaming collapse, NOTES.md session-2 bisection)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:] = jnp.zeros_like(y_ref)

    if xwin:
        nxw = xw_ref.shape[0] - 1
        x_hbm = x_ref
        x_ref = xw_ref  # all gather-tier reads below hit the VMEM window

        @pl.when(i == 0)
        def _load_x():
            xw_ref[nxw:, :] = jnp.zeros((1, LANES), jnp.float32)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(off_ref[0, 0], nxw)],
                xw_ref.at[pl.ds(0, nxw)],
                x_sem,
            )
            cp.start()
            cp.wait()

    G = capw // LANES
    nx_rows = x_ref.shape[0] // R
    my_rows = y_ref.shape[0] // R

    # cross-lane scan operator (MXU): LTX[c,l]=c<l (strict)
    ltx = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.float32)

    # scratch column slice of tile b, rhs r
    def _sl(b, r):
        return pl.ds((b * R + r) * LANES, LANES)

    # ---- pass 1: per-tile x gather + product into the block scratch -----
    # column decode: one full-height (lane, key) group for the raw i32
    # plane (key = global x-page), or two half-height groups for the
    # stream-compressed plane (rows s and s+sigma/2 share an int32; key =
    # tile-local page index, see CSR5Matrix.col_packed). Masks then
    # compare key against `k if packed else pid` per unrolled page.
    s2 = sigma // 2

    def _decode(b):
        if not packed:
            col = col_ref[pl.ds(b * sigma, sigma), :]
            return [(col & (LANES - 1), col >> 7)]
        c = col_ref[pl.ds(b * s2, s2), :]

        def srl(v, k):  # logical shift; int32 literals (x64-safe)
            return jax.lax.shift_right_logical(v, jnp.int32(k))

        return [
            (c & (LANES - 1), srl(c, 7) & 0x1FF),
            (srl(c, 16) & (LANES - 1), srl(c, 23)),
        ]

    if contig or pmax <= MAX_UNROLL_PAGES:
        # tiers 0/1 (static unroll): every element matches EXACTLY ONE
        # page of the tile's list (tier 0: the contiguous span covers all
        # columns; tier 1: the list is the tile's distinct pages), so the
        # gather is a pure select CHAIN seeded with page 0's gather — no
        # masked accumulate, no scratch RMW, and mismatched seeds are
        # killed by val==0 on padded elements. Masks are shared across
        # rhs; each rhs's chain lives in one register.
        for b in range(B):
            groups = _decode(b)
            val = val_ref[pl.ds(b * sigma, sigma), :].astype(jnp.float32)
            if contig:
                # tier 0: pages are the consecutive range
                # [first, first+pmax): ONE (pmax,128) slab load per rhs
                # replaces pmax scalar-indexed row loads
                first = meta_ref[b, META_HDR]
                slabs = [
                    x_ref[pl.ds(r * nx_rows + first, pmax), :]
                    for r in range(R)
                ]
                pids = None
            else:
                pids = [meta_ref[b, META_HDR + k] for k in range(pmax)]
            masks = None
            if pmax > 1:
                masks = [
                    [
                        key == (k if packed else (first + k if contig else pids[k]))
                        for _, key in groups
                    ]
                    for k in range(1, pmax)
                ]
            for r in range(R):
                accs = []
                for gi, (lane, key) in enumerate(groups):
                    xrow0 = (
                        slabs[r][0:1, :]
                        if contig
                        else x_ref[pl.ds(r * nx_rows + pids[0], 1), :]
                    )
                    xg = jnp.take_along_axis(
                        jnp.broadcast_to(xrow0, lane.shape), lane, axis=1
                    )
                    for k in range(1, pmax):
                        xrow = (
                            slabs[r][k : k + 1, :]
                            if contig
                            else x_ref[pl.ds(r * nx_rows + pids[k], 1), :]
                        )
                        g = jnp.take_along_axis(
                            jnp.broadcast_to(xrow, lane.shape), lane, axis=1
                        )
                        xg = jnp.where(masks[k - 1][gi], g, xg)
                    accs.append(xg)
                xg = accs[0] if len(accs) == 1 else jnp.concatenate(accs, axis=0)
                prod_ref[:, _sl(b, r)] = val * xg
    else:
        # tier 2 (scattered): ONE block-level fori over the max live page
        # count; each iteration advances all B tiles' (x R rhs) gathers —
        # independent latency chains — as register select CHAINS carried
        # through the loop (every element matches exactly one list entry;
        # pads stay at the zero seed and are killed by val==0). Shorter
        # page lists read sentinel slots that match nothing.
        cnt_max = meta_ref[0, 1]
        for b in range(1, B):
            cnt_max = jnp.maximum(cnt_max, meta_ref[b, 1])

        ngr = 2 if packed else 1
        # U pages per iteration: the column decode is shared across the U
        # pages and their scalar-load -> dynamic-row-load chains overlap
        # (a 1-page body serializes on that latency chain). Page lists are
        # sentinel-padded to pmax (a multiple of 8), so reading up to
        # ceil(cnt_max/U)*U - 1 < pmax is safe for U | 8.
        U = FORI_PAGE_UNROLL

        def body(j, xgs):
            out = list(xgs)
            k0 = j * U
            for b in range(B):
                groups = _decode(b)
                for u in range(U):
                    pid = meta_ref[b, META_HDR + k0 + u]
                    mv = k0 + u if packed else pid
                    masks = [key == mv for _, key in groups]
                    for r in range(R):
                        xrow = x_ref[pl.ds(r * nx_rows + pid, 1), :]
                        for gi, ((lane, _), mask) in enumerate(
                            zip(groups, masks)
                        ):
                            g = jnp.take_along_axis(
                                jnp.broadcast_to(xrow, lane.shape), lane, axis=1
                            )
                            idx = (b * R + r) * ngr + gi
                            out[idx] = jnp.where(mask, g, out[idx])
            return tuple(out)

        gshape = (s2, LANES) if packed else (sigma, LANES)
        init = tuple(
            jnp.zeros(gshape, jnp.float32) for _ in range(B * R * ngr)
        )
        xgs = jax.lax.fori_loop(0, (cnt_max + U - 1) // U, body, init)
        for b in range(B):
            val = val_ref[pl.ds(b * sigma, sigma), :].astype(jnp.float32)
            for r in range(R):
                parts = [xgs[(b * R + r) * ngr + gi] for gi in range(ngr)]
                xg = parts[0] if ngr == 1 else jnp.concatenate(parts, axis=0)
                prod_ref[:, _sl(b, r)] = val * xg

    # ---- window end-values -----------------------------------------------
    # W_end[d] = pv[ws[d], wl[d]] where pv is the within-lane inclusive
    # prefix of products.
    #
    # R == 1 (SpMV): masked-sum route. Instead of materializing pv (one
    # (sigma,sigma)@(sigma,B*128) matmul) and then gathering its sublanes
    # per tile (the chunked dom-8 select chain _taa_sub8), each tile's
    # window columns are gathered DIRECTLY from the products and masked to
    # s <= ws[d]; one (1,sigma)@(sigma,B*G*128) ones-matmul then yields
    # every W_end at once. The masked sum equals the prefix read exactly
    # (HIGHEST = sequential f32 accumulation). Measured -4% banded /
    # -8% scatband (A/B 2026-08-18).
    #
    # R > 1 (SpMM): the masked route repeats the sigma-row window gather
    # per rhs, which measured +12% on spmm8 in round 2 and +25% in round
    # 3 even WITH the batched pass 2 + interleaved-y RMW downstream (A/B
    # 2026-08-19) — keep the batched prefix matmul + _taa_sub8 route.
    # Real SpMM amortization comes from the MXU band-block path
    # (ops/bandmm.py), not from this gather kernel.
    masked_win = R == 1
    w_all = None
    wms_all = []
    if masked_win:
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (sigma, LANES), 0)
        for b in range(B):
            wms = []
            for g in range(G):
                wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                # lane bits are 16-22; wrapped maps carry wrap-flag bits
                # at 23/24 (convert.build_csr5), so mask the lane decode
                wms.append((wm & 0xFFFF, (wm >> 16) & (LANES - 1)))
            wms_all.append(wms)
            for r in range(R):
                prod_b = prod_ref[:, _sl(b, r)]
                for g in range(G):
                    ws, wl = wms[g]
                    q = jnp.take_along_axis(
                        prod_b, jnp.broadcast_to(wl, (sigma, LANES)), axis=1
                    )
                    pv_ref[:, pl.ds(((b * R + r) * G + g) * LANES, LANES)] = (
                        jnp.where(iota_s <= ws, q, 0.0)
                    )
        ones_s = jnp.ones((1, sigma), jnp.float32)
        lane_tot_all = jax.lax.dot_general(  # (1, R*B*128) per-lane totals
            ones_s, prod_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_SCAN_PRECISION,
        )
        for b in range(B):
            for r in range(R):
                c0 = (b * R + r) * LANES
                lt_ref[b * R + r : b * R + r + 1, :] = lane_tot_all[
                    :, c0 : c0 + LANES
                ]
        le_all = jax.lax.dot_general(  # (R*B,128) excl. cross-lane carries
            lt_ref[:], ltx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_SCAN_PRECISION,
        )
        w_all = jax.lax.dot_general(  # (1, R*B*G*128) window end-values
            ones_s, pv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_SCAN_PRECISION,
        )
    else:
        for b in range(B):
            wms = []
            for g in range(G):
                wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
                wms.append((wm & 0xFFFF, (wm >> 16) & (LANES - 1)))
            wms_all.append(wms)
        lt_s = (  # LT_s[s,s'] = s' <= s (inclusive within-lane prefix)
            jax.lax.broadcasted_iota(jnp.int32, (sigma, sigma), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (sigma, sigma), 0)
        ).astype(jnp.float32)
        pv_ref[:] = jax.lax.dot_general(
            lt_s, prod_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_SCAN_PRECISION,
        )
        for b in range(B):
            for r in range(R):
                lt_ref[b * R + r : b * R + r + 1, :] = pv_ref[
                    sigma - 1 : sigma, _sl(b, r)
                ]
        le_all = jax.lax.dot_general(  # (R*B,128) excl. cross-lane carries
            lt_ref[:], ltx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_SCAN_PRECISION,
        )

    # ---- pass 2: window diff + sequential accumulation -------------------
    # B >= 8: Mosaic's lane-gather lowering rejects (B,128) operands with
    # fewer than 8 sublanes ("Shape mismatch in input, indices and
    # output" at B=1 — tiny matrices pad to a single tile); B=8 is
    # production-proven (hybmix csr5 part), smaller blocks take the
    # scalar loop whose (8,128)-broadcast gathers always lower.
    if masked_win and G == 1 and B >= 8:
        # batched pass 2 (the hot configuration: SpMV, single-group
        # tiles, either window anchoring): every per-tile (1,128) op of
        # the scalar loop below becomes ONE (B,128) op — cross-lane
        # carry gather, roll, first-row reset / valid-slot masks —
        # leaving only the order-dependent y accumulation per tile. The
        # per-tile masks come from the conversion's flag bits (bit 23 =
        # first-row slot, bit 24 = d >= rs%128, both anchorings since
        # round 5); measured on TPU vs the scalar loop: wrapped
        # banded500k 0.266 -> 0.235 ms (-12%); the aligned mode
        # (multi-chip shard kernels) ran the scalar loop at B=128
        # before round 5 — measured 2.9x slower than wrapped.
        # R == 1 only: masked_win == (R == 1), and the SpMM wrapper has
        # no de-interleave — a multi-rhs batched pass-2 was measured +25%
        # anyway (NOTES round 3)
        wm_all = win_ref[:, :LANES]  # (B,128); G == 1 so capw == 128
        wl_all = (wm_all >> 16) & (LANES - 1)
        cl_all = jnp.take_along_axis(le_all, wl_all, axis=1)  # (B,128)
        W_end_all = w_all.reshape(B, LANES) + cl_all
        rolled = pltpu.roll(W_end_all, 1, axis=1)
        m23 = (wm_all & (1 << 23)) != 0
        m24 = (wm_all & (1 << 24)) != 0
        if win_rel:
            # wrapped: every slot holds a row; the wrap seam is
            # consecutive, only the first-row slot resets; slots below
            # rs%128 belong to the NEXT y row (high/low split)
            W_prev = jnp.where(m23, 0.0, rolled)
            W2 = W_end_all - W_prev
            hi = jnp.where(m24, W2, 0.0)
            lo = W2 - hi
            for b in range(B):
                by = meta_ref[b, 0] >> 7
                V = jnp.concatenate([hi[b : b + 1], lo[b : b + 1]], axis=0)
                y_ref[pl.ds(by, 2), :] += V
        else:
            # aligned: slots below rs%128 are masked out entirely; the
            # predecessor is valid where slot d-1 >= rs%128 (= bit 24
            # rolled right by one, lane 0 always invalid)
            prev_ok = jnp.logical_and(
                pltpu.roll(m24, 1, axis=1),
                _lane_iota((B, LANES)) != 0,
            )
            W_prev = jnp.where(prev_ok, rolled, 0.0)
            W2 = jnp.where(m24, W_end_all - W_prev, 0.0)
            for b in range(B):
                by = meta_ref[b, 0] >> 7
                y_ref[pl.ds(by, 1), :] += W2[b : b + 1]
    elif masked_win and not win_rel and B * G >= 8:
        # batched ALIGNED pass 2, any G (round 5): aligned capw is
        # always >= 256 (the +128 headroom rounds up), so the G==1
        # branch above never fires for aligned maps — this one batches
        # over the B*G window groups instead (the layouts of w_all and
        # win_ref are already (b, g) row-major). Before this, aligned
        # kernels (the multi-chip shard mode) ran the scalar loop at
        # B=128: measured 2.9x slower than wrapped on banded500k.
        BG = B * G
        wm_bg = win_ref[:, :].reshape(BG, LANES)
        wl_bg = (wm_bg >> 16) & (LANES - 1)
        le_rep = jnp.broadcast_to(
            le_all[:, None, :], (B, G, LANES)
        ).reshape(BG, LANES)
        cl_bg = jnp.take_along_axis(le_rep, wl_bg, axis=1)
        W_bg = w_all.reshape(BG, LANES) + cl_bg
        m24i = (wm_bg >> 24) & 1
        lane0 = _lane_iota((BG, LANES)) == 0
        g0row = (
            jax.lax.broadcasted_iota(jnp.int32, (BG, LANES), 0) % G
        ) == 0

        def _prev_flat(V):
            # predecessor across each tile's FLAT (G*128) window: roll
            # within the group; lane 0 of group g takes lane 127 of
            # group g-1 (the row above in (BG,128) layout)
            rolled = pltpu.roll(V, 1, axis=1)
            if G > 1:
                up = pltpu.roll(pltpu.roll(V, 1, axis=0), 1, axis=1)
                return jnp.where(lane0, up, rolled)
            return rolled

        # slot 0 of group 0 has no predecessor (the axis-0 roll would
        # wrap in the previous tile's last group)
        prev_ok = jnp.logical_and(
            _prev_flat(m24i) == 1,
            jnp.logical_not(jnp.logical_and(lane0, g0row)),
        )
        W_prev = jnp.where(prev_ok, _prev_flat(W_bg), 0.0)
        W2 = jnp.where(m24i == 1, W_bg - W_prev, 0.0)
        for b in range(B):
            by = meta_ref[b, 0] >> 7
            y_ref[pl.ds(by, G), :] += W2[b * G : (b + 1) * G]
    else:
        _pass2_scalar(
            B, G, R, sigma, capw, win_rel, masked_win, meta_ref, win_ref,
            y_ref, pv_ref, le_all, w_all, wms_all, my_rows,
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        if xwin:
            cp = pltpu.make_async_copy(
                y_ref,
                out_ref.at[pl.ds(off_ref[0, 1], y_ref.shape[0])],
                out_sem,
            )
        else:
            cp = pltpu.make_async_copy(y_ref, out_ref, out_sem)
        cp.start()
        cp.wait()


def _pass2_scalar(
    B, G, R, sigma, capw, win_rel, masked_win, meta_ref, win_ref, y_ref,
    pv_ref, le_all, w_all, wms_all, my_rows,
):
    """The general window-diff + accumulation loop (SpMM, aligned maps,
    multi-group tiles); the G==1 SpMV case takes the batched form above."""
    for b in range(B):
        rs = meta_ref[b, 0]
        a_off = rs & (LANES - 1)  # first valid slot / rotation amount
        by = rs >> 7  # 128-row-aligned y block of the tile's first row
        wms = wms_all[b]

        for r in range(R):
            lane_excl_b = jnp.broadcast_to(
                le_all[b * R + r : b * R + r + 1, :], (8, LANES)
            )

            w_groups = []
            for g in range(G):
                ws, wl = wms[g]
                if masked_win:
                    off = ((b * R + r) * G + g) * LANES
                    wv = w_all[:, off : off + LANES]
                else:
                    pv = pv_ref[:, pl.ds((b * R + r) * LANES, LANES)]
                    R1 = jnp.take_along_axis(  # R1[s, j] = pv[s, wl[j]]
                        pv, jnp.broadcast_to(wl, (sigma, LANES)), axis=1
                    )
                    wv = _taa_sub8(R1, ws, sigma)  # (1,128) prefix read
                cl = jnp.take_along_axis(
                    lane_excl_b, jnp.broadcast_to(wl, (8, LANES)), axis=1
                )[0:1]
                w_groups.append(wv + cl)
            W_end = (
                w_groups[0] if G == 1 else jnp.concatenate(w_groups, axis=0)
            )  # (G,128)

            if win_rel:
                # wrapped mode: slot d = row base+d (d >= a_off) or
                # base+G*128+d (d < a_off), so lanes already line up with
                # y. The wrap seam last-slot->slot0 is consecutive rows,
                # so a STATIC roll(1) in flat slot order gives every
                # slot's predecessor; only the tile's first row (flat
                # slot a_off, always inside group 0) resets to zero.
                rolled = pltpu.roll(W_end, 1, axis=1)
                if G > 1:
                    down = pltpu.roll(W_end, 1, axis=0)
                    W_prev = jnp.where(
                        _lane_iota(W_end.shape) == 0,
                        pltpu.roll(down, 1, axis=1),
                        rolled,
                    )
                else:
                    W_prev = rolled
                d_idx = (
                    _sub_iota(W_end.shape) * LANES + _lane_iota(W_end.shape)
                )
                W_prev = jnp.where(d_idx == a_off, 0.0, W_prev)
                W2 = W_end - W_prev
                first = W2[0:1]
                hi0 = jnp.where(_lane_iota((1, LANES)) >= a_off, first, 0.0)
                parts = [hi0] + ([W2[1:]] if G > 1 else []) + [first - hi0]
                V = jnp.concatenate(parts, axis=0)  # (G+1, 128)
                y_ref[pl.ds(r * my_rows + by, G + 1), :] += V
                continue

            # aligned mode: W_prev[d] = W_end[d-1] across the flattened
            # (G*128,) window; slots d < a_off masked out
            rolled = pltpu.roll(W_end, 1, axis=1)
            if G > 1:
                down = pltpu.roll(W_end, 1, axis=0)
                W_prev = jnp.where(
                    _lane_iota(W_end.shape) == 0,
                    pltpu.roll(down, 1, axis=1),
                    rolled,
                )
            else:
                W_prev = rolled

            d_idx = _sub_iota(W_end.shape) * LANES + _lane_iota(W_end.shape)
            W_prev = jnp.where(d_idx - 1 >= a_off, W_prev, 0.0)
            W2 = jnp.where(d_idx >= a_off, W_end - W_prev, 0.0)

            # sequential window accumulation (the calibrator analogue)
            y_ref[pl.ds(r * my_rows + by, G), :] += W2


def _make_pallas_call(
    p, B, sigma, pmax, capw, n_pad, m_pad, interpret, R=1, contig=False,
    packed=False, win_rel=False, out_rows=None,
):
    """The SpMV/SpMM pallas_call. ``out_rows`` switches on the fused
    row-sliced (xwin) calling convention: extra (off, y_prev) operands,
    x in ANY space, output the whole-matrix (out_rows, 128) buffer
    aliased to y_prev."""
    xwin = out_rows is not None
    kernel = functools.partial(
        _spmv_kernel, B=B, sigma=sigma, pmax=pmax, capw=capw, R=R, contig=contig,
        packed=packed, win_rel=win_rel, xwin=xwin,
    )
    mw = _meta_width(pmax)
    crows = B * (sigma // 2 if packed else sigma)
    in_specs = [
        pl.BlockSpec((B, mw), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((crows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, capw), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((R * m_pad // LANES, LANES), jnp.float32),  # y acc
        pltpu.VMEM((sigma, R * B * LANES), jnp.float32),  # block products
        # R == 1: masked window columns, one slot per (tile, group);
        # R > 1: the batched within-lane prefixes, one slot per (tile, rhs)
        pltpu.VMEM(
            (sigma, B * (capw // LANES) * LANES if R == 1 else R * B * LANES),
            jnp.float32,
        ),
        pltpu.VMEM((R * B, LANES), jnp.float32),  # lane totals
        pltpu.SemaphoreType.DMA(()),
    ]
    alias = {}
    if xwin:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x full, HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,8) window offsets
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # y_prev
        ]
        out_shape = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
        # x window scratch: the slice's n_pad rows + one zero sentinel row
        scratch += [
            pltpu.VMEM((n_pad // LANES + 1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
        alias = {6: 0}  # y_prev buffer IS the output buffer
    else:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole (+ sentinels)
        ]
        out_shape = jax.ShapeDtypeStruct(
            (R * m_pad // LANES, LANES), jnp.float32
        )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(p // B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # manual copy-out
        scratch_shapes=scratch,
        input_output_aliases=alias,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * sigma * LANES * R,
            bytes_accessed=p * sigma * LANES * (6 if packed else 8)
            + R * (m_pad + n_pad) * 4,
            transcendentals=0,
        ),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _csr5_spmv_pallas_jit(a5: CSR5Matrix, x, alpha, interpret: bool):
    cfg = a5.config
    p = a5.num_tiles
    sigma = cfg.sigma
    n_pad, m_pad = a5.n_pad, a5.m_pad

    meta = build_meta_plane(a5)
    # fold alpha into x; append the zero sentinel page row
    x_pad = jnp.pad(
        x.astype(jnp.float32) * jnp.asarray(alpha, jnp.float32),
        (0, n_pad + LANES - a5.n),
    )
    x2d = x_pad.reshape(n_pad // LANES + 1, LANES)
    packed = a5.col_packed is not None
    col2d = (
        a5.col_packed.reshape(p * (sigma // 2), LANES)
        if packed
        else a5.col_idx_tiles.reshape(p * sigma, LANES)
    )
    # stream values at their stored dtype (bf16 halves the val plane);
    # the kernel accumulates in f32 either way
    val2d = a5.val_tiles.reshape(p * sigma, LANES)

    B = _choose_block(a5)
    call = _make_pallas_call(
        p, B, sigma, a5.pmax, a5.capw, n_pad, m_pad, interpret,
        contig=a5.pages_contig, packed=packed, win_rel=a5.win_rel,
    )
    y2d = call(meta, col2d, val2d, a5.win_map, x2d)
    return y2d.reshape(-1)[: a5.m].astype(x.dtype)


def csr5_spmv_pallas(
    a5: CSR5Matrix, x: jax.Array, alpha=1.0, interpret: bool = False
) -> jax.Array:
    """y = alpha * A @ x via the Pallas CSR5 kernel."""
    return _csr5_spmv_pallas_jit(a5, x, alpha, interpret)


def pallas_spmm_supported(a5: CSR5Matrix, num_rhs: int) -> bool:
    """SpMM gate: SpMV limits plus R copies of x and y resident in VMEM."""
    if not pallas_supported(a5):
        return False
    if not 1 <= num_rhs <= 16:
        return False
    B = _choose_block(a5, R=num_rhs)
    return _vmem_estimate(a5, B, R=num_rhs) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret", "rn"))
def _csr5_spmm_pallas_jit(a5: CSR5Matrix, xm, alpha, interpret: bool, rn: bool):
    cfg = a5.config
    p, sigma = a5.num_tiles, cfg.sigma
    n_pad, m_pad = a5.n_pad, a5.m_pad
    R = xm.shape[0] if rn else xm.shape[1]

    meta = build_meta_plane(a5)
    # x -> R stacked (n_pad/128 + 1, 128) planes, alpha folded in. The
    # (n,R) <-> (R,n) relayout costs ~0.75 ms at n=500k/R=8 on this chip
    # (the (n,8) device layout is lane-padded), so the transposed
    # "solver-loop" layout (rn=True: X^T in, Y^T out) skips both
    # transposes — measured 2.20 -> 1.40 ms on spmm8 (NOTES round 3)
    xt = (xm if rn else xm.T).astype(jnp.float32) * jnp.asarray(
        alpha, jnp.float32
    )
    x_pad = jnp.pad(xt, ((0, 0), (0, n_pad + LANES - a5.n)))
    x2d = x_pad.reshape(R * (n_pad // LANES + 1), LANES)
    packed = a5.col_packed is not None
    col2d = (
        a5.col_packed.reshape(p * (sigma // 2), LANES)
        if packed
        else a5.col_idx_tiles.reshape(p * sigma, LANES)
    )
    # stream values at their stored dtype (bf16 halves the val plane);
    # the kernel accumulates in f32 either way
    val2d = a5.val_tiles.reshape(p * sigma, LANES)

    B = _choose_block(a5, R=R)
    call = _make_pallas_call(
        p, B, sigma, a5.pmax, a5.capw, n_pad, m_pad, interpret, R=R,
        contig=a5.pages_contig, packed=packed, win_rel=a5.win_rel,
    )
    y2d = call(meta, col2d, val2d, a5.win_map, x2d)
    ym = y2d.reshape(R, m_pad)[:, : a5.m]
    return ym.astype(xm.dtype) if rn else ym.T.astype(xm.dtype)


def csr5_spmm_pallas(
    a5: CSR5Matrix,
    x: jax.Array,
    alpha=1.0,
    interpret: bool = False,
    layout: str = "nr",
) -> jax.Array:
    """Y = alpha * A @ X via the multi-rhs Pallas kernel.

    ``layout="nr"`` (default): X is (n, R), Y is (m, R) — the reference-
    style API. ``layout="rn"``: X is (R, n), Y is (R, m) — the TPU
    solver-loop layout that skips two ~0.4 ms lane-relayout transposes
    per call (keep X^T/Y^T transposed throughout an iteration loop).

    The per-tile column decode, page loads and window maps are shared
    across the R right-hand sides, so arithmetic intensity scales with R
    while the dominant val/col stream is paid once (the SpMM extension of
    BASELINE.json configs[3]; the reference has no SpMM).
    """
    return _csr5_spmm_pallas_jit(a5, x, alpha, interpret, layout == "rn")
