"""Double-single (df64) CSR5 SpMV: the fp64 answer on a TPU without
native f64.

The reference's *default* build benchmarks ``VALUE_TYPE=double``
(``CSR5_cuda/Makefile:4``, guards ``main.cu:9-15``); TPU v5e has no f64
ALUs (XLA emulation measured ~50x slow, NOTES.md). This kernel carries
every value as an unevaluated pair of f32s ("double-single"): the input
f64 is split exactly into ``hi = f32(v)``, ``lo = f32(v - hi)`` (both
representable, |lo| <= ulp(hi)/2), and all kernel arithmetic uses
error-free transformations on the VPU:

- products via Veltkamp splitting + Dekker two-prod (no FMA assumption:
  the split factors fit 12 bits, so every partial product is exact),
- sums via Knuth branchless two-sum compounded into double-single adds,
- the within-lane (sigma) reductions as chunked rotate-reduce trees and
  the cross-lane (128) exclusive scan as a log-step ``pltpu.roll`` scan,
  each step a double-single add. (The f32 kernel's MXU matmul scans
  cannot be used: the MXU accumulates in plain f32, which is exactly the
  rounding df64 exists to avoid.)

Accuracy — the measured error model (round 4). Every per-op transform
is renormalized double-double class: adds are the QD ieee_add (two
two-sums + two renormalizations, ~2^-48 relative) and products carry
all four partial terms (Dekker two-prod + vh*xl + vl*xh + vl*xl,
~2^-48). The format itself caps at ~49 bits (two f32 mantissas), so
per-op accuracy is AT the double-single ceiling; what governs the
worst ROW is structural: like every segmented prefix-diff method
(including the reference's CSR5 at 2^-53 scale), a row's absolute
error scales with the magnitude of the enclosing TILE's running
prefix, i.e.

    rel_err(row) ~ K * 2^-48 * max|tile running prefix| / |row sum|

Measured validation (banded 4k, 7-decade mixed-sign values): the worst
row's error is predicted by this model within 1.55x, log-log
correlation 0.83 over all rows, K <= ~2^8 everywhere; worst 2.0e-9 /
median 4.7e-14 (vs the same structure from 2^-24 on the f32 kernel —
the oracle tests pin df64 >= 3 decimal digits beyond f32). Reaching
2^-53-flat per row would require abandoning prefix-diff for direct
per-row masked sums (O(capw) more VPU work per tile) — the measured
TPU ceiling for this kernel shape is the model above, not the per-op
arithmetic.

Structure mirrors the f32 kernel (ops/csr5_kernel.py): same conversion
(the hi and lo planes share one CSR5 layout since the plan depends only
on the sparsity structure), same three gather tiers, same wrapped/aligned
window maps, same sequential-grid y accumulation — with every value-path
op doubled onto the (hi, lo) pair. SpMV only (R = 1); the reference has
no f64 SpMM either.

Cost: ~4-5x the vreg-ops of the f32 kernel; still far above the ~50x-slow
XLA f64 emulation and the reference GPUs' crippled-fp64 rates.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import AUTO_TUNED_SIGMA, CSR5Config, compute_sigma
from ..models.formats import CSR5Matrix
from .convert import _as_host_csr, build_csr5
from .csr5_kernel import (
    LANES,
    MAX_FORI_PAGES,
    MAX_UNROLL_PAGES,
    META_HDR,
    _SMEM_META_BUDGET,
    _VMEM_BUDGET,
    _effective_block,
    _lane_iota,
    _meta_width,
    _sub_iota,
    build_meta_plane,
)

#: df64's own block-size cap. With the round-5 BATCHED pass 2 the
#: per-block fixed costs amortize like the f32 kernel's (TPU sweep on
#: banded500k, batched kernel: B32 0.624 / B64 0.616 / B128 0.645 ms;
#: the round-4 "B>32 loses" result applied to the per-tile-loop pass 2).
DF64_BLOCK_CAP = 64


@struct.dataclass
class DF64CSR5:
    """CSR5 plan with double-single values: ``a5`` holds the hi plane
    (and all structure); ``val_lo_tiles`` is the matching lo plane in the
    identical tile layout (the layout is a pure function of sparsity)."""

    a5: CSR5Matrix
    val_lo_tiles: jax.Array = None

    @property
    def shape(self):
        return self.a5.shape

    @property
    def m(self) -> int:
        return self.a5.m

    @property
    def n(self) -> int:
        return self.a5.n

    @property
    def nnz(self) -> int:
        return self.a5.nnz

    @property
    def sigma(self) -> int:
        return self.a5.sigma


def split_f64(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact f64 -> (hi, lo) f32 split: v == hi + lo in f64."""
    v = np.asarray(v, np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def build_df64(
    csr,
    config: Optional[CSR5Config] = None,
    sigma: int = AUTO_TUNED_SIGMA,
) -> DF64CSR5:
    """CSR (f64 values) -> double-single CSR5.

    One conversion (on the hi plane) carries all structure; the tile
    layout is a pure function of (row_ptr, col_idx), so the lo plane is
    just the matching tile transpose of the lo values — no second
    conversion pass.
    """
    row_ptr, col_idx, values, shape = _as_host_csr(csr)
    hi, lo = split_f64(values)
    if config is None:
        config = CSR5Config(sigma=compute_sigma(shape[0], len(hi), sigma))
    # keep_raw_cols: the df64 kernel streams the raw i32 column plane
    # (it has no packed-column decode path yet — NOTES backlog)
    a5 = build_csr5((row_ptr, col_idx, hi, shape), config, keep_raw_cols=True)

    from ..utils import nativelib

    p, sig, omega = a5.num_tiles, a5.sigma, a5.omega
    lo_flat = np.zeros(p * sig * omega, np.float32)
    lo_flat[: len(lo)] = lo
    tr = nativelib.tile_transpose(lo_flat, p, sig, omega)
    if tr is not None:
        lo_tiles = jnp.asarray(tr)
    else:
        lo_tiles = jnp.swapaxes(
            jnp.asarray(lo_flat).reshape(p, omega, sig), 1, 2
        )
    return DF64CSR5(a5=a5, val_lo_tiles=lo_tiles)


def df64_residency_ok(m: int, n: int) -> bool:
    """Cheap pre-conversion gate: can the doubled x/y planes possibly fit
    VMEM? Callers use this to skip building a df64 plan that
    :func:`df64_supported` would certainly reject (the full gate still
    applies post-build for pmax/meta limits)."""
    n_pad = -(-max(n, 1) // LANES) * LANES
    m_pad = -(-(m + 256) // 1024) * 1024
    return 2 * (n_pad + LANES + m_pad) * 4 <= _VMEM_BUDGET


def df64_supported(d) -> bool:
    """Pallas gate: the f32 kernel's limits with doubled x/y residency.
    Accepts a DF64CSR5 or the bare structure-carrying CSR5Matrix."""
    a5 = d.a5 if isinstance(d, DF64CSR5) else d
    cfg = a5.config
    if a5.val_tiles.dtype != jnp.float32:
        return False
    if cfg.sigma % 8 != 0 or cfg.omega != LANES:
        return False
    if a5.pmax > MAX_FORI_PAGES:
        return False
    if _meta_width(a5.pmax) * 4 > _SMEM_META_BUDGET:
        return False
    B = _effective_block(
        min(cfg.tiles_per_block, DF64_BLOCK_CAP), a5.pmax, a5.num_tiles
    )
    blk = 2 * (2 * B * cfg.tile_nnz * 8 + B * a5.capw * 4)
    # products + masked-window pairs (4 x (sigma, B*128)) + lane totals
    scr = 4 * cfg.sigma * B * LANES * 4 + 2 * B * LANES * 4
    vmem = 2 * (a5.n_pad + LANES + a5.m_pad) * 4 + blk + scr
    return vmem <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# double-single primitives (error-free transformations, branchless)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Dekker fast renormalize (assumes |a| >= |b| or b tiny)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _ds_add(ah, al, bh, bl):
    """(ah,al) + (bh,bl) -> double-single.

    The accurate (QD-library ieee_add) variant: two two-sums + two
    renormalizations. The cheap variant (one two-sum, e += al+bl) has
    UNBOUNDED relative error under cancellation (ah ~ -bh leaves e
    larger than s) — measured 6.6e-7 on power-law rows with mixed signs
    before this fix; accurate adds land at the documented ~2^-44 bound.
    """
    sh, se = _two_sum(ah, bh)
    tl, te = _two_sum(al, bl)
    se = se + tl
    sh, se = _quick_two_sum(sh, se)
    se = se + te
    return _quick_two_sum(sh, se)


def _ds_neg(h, l):
    return -h, -l


def _split(a):
    """Veltkamp split of f32 into two 12-bit-mantissa halves (exact)."""
    t = a * 4097.0  # 2^12 + 1
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker two-prod without FMA: p + e == a * b exactly."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _ds_mul_pair(vh, vl, xh, xl):
    """(vh,vl) * (xh,xl) -> double-single, full double-double product
    (all four partial products; one mul + one add over the truncated
    variant buys the last ~2^-48 term — round-4 accuracy pass)."""
    p, e = _two_prod(vh, xh)
    e = e + (vh * xl + vl * xh + vl * xl)
    return _quick_two_sum(p, e)


def _ds_reduce_sublanes(h, l, sigma):
    """(sigma, 128) pair -> (1, 128) double-single column sums via chunk
    folding + rotate-reduce (every op a ds_add)."""
    ch, cl = h[0:8], l[0:8]
    for c in range(1, sigma // 8):
        ch, cl = _ds_add(ch, cl, h[c * 8 : (c + 1) * 8], l[c * 8 : (c + 1) * 8])
    for sh in (4, 2, 1):
        ch, cl = _ds_add(
            ch, cl, pltpu.roll(ch, sh, axis=0), pltpu.roll(cl, sh, axis=0)
        )
    return ch[0:1], cl[0:1]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _df64_kernel(
    meta_ref,  # (B, mw) i32 SMEM
    col_ref,  # (B*sigma, 128) i32
    valh_ref,  # (B*sigma, 128) f32 hi plane
    vall_ref,  # (B*sigma, 128) f32 lo plane
    win_ref,  # (B, capw) i32 packed window map
    xh_ref,  # (n_pad/128 + 1, 128) f32 x hi (zero sentinel row)
    xl_ref,  # (n_pad/128 + 1, 128) f32 x lo
    out_ref,  # (2 * m_pad/128, 128) f32 HBM(ANY): [y_hi ; y_lo]
    y_ref,  # (2 * m_pad/128, 128) f32 VMEM scratch accumulator pair
    ph_ref,  # (sigma, B*128) f32 scratch: product hi
    pl_ref,  # (sigma, B*128) f32 scratch: product lo
    pvh_ref,  # (sigma, B*128) f32 scratch: masked window columns hi
    pvl_ref,  # (sigma, B*128) f32 scratch: masked window columns lo
    lth_ref,  # (B, 128) f32 scratch: lane totals hi
    ltl_ref,  # (B, 128) f32 scratch: lane totals lo
    out_sem,
    *,
    B: int,
    sigma: int,
    pmax: int,
    capw: int,
    contig: bool,
    win_rel: bool,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:] = jnp.zeros_like(y_ref)

    G = capw // LANES
    my_rows = y_ref.shape[0] // 2

    def _sl(b):
        return pl.ds(b * LANES, LANES)

    # ---- pass 1: gather both x planes, double-single products ----------
    if contig or pmax <= MAX_UNROLL_PAGES:
        for b in range(B):
            col = col_ref[pl.ds(b * sigma, sigma), :]
            lane = col & (LANES - 1)
            key = col >> 7
            vh = valh_ref[pl.ds(b * sigma, sigma), :]
            vl = vall_ref[pl.ds(b * sigma, sigma), :]
            if contig:
                first = meta_ref[b, META_HDR]
                slabs_h = xh_ref[pl.ds(first, pmax), :]
                slabs_l = xl_ref[pl.ds(first, pmax), :]
                pids = None
            else:
                pids = [meta_ref[b, META_HDR + k] for k in range(pmax)]
            lane_b = jnp.broadcast_to(lane, (sigma, LANES))

            def _rows(k):
                if contig:
                    return slabs_h[k : k + 1, :], slabs_l[k : k + 1, :]
                return (
                    xh_ref[pl.ds(pids[k], 1), :],
                    xl_ref[pl.ds(pids[k], 1), :],
                )

            rh, rl = _rows(0)
            xg_h = jnp.take_along_axis(
                jnp.broadcast_to(rh, (sigma, LANES)), lane_b, axis=1
            )
            xg_l = jnp.take_along_axis(
                jnp.broadcast_to(rl, (sigma, LANES)), lane_b, axis=1
            )
            for k in range(1, pmax):
                mk = key == (first + k if contig else pids[k])
                rh, rl = _rows(k)
                gh = jnp.take_along_axis(
                    jnp.broadcast_to(rh, (sigma, LANES)), lane_b, axis=1
                )
                gl = jnp.take_along_axis(
                    jnp.broadcast_to(rl, (sigma, LANES)), lane_b, axis=1
                )
                xg_h = jnp.where(mk, gh, xg_h)
                xg_l = jnp.where(mk, gl, xg_l)
            p_h, p_l = _ds_mul_pair(vh, vl, xg_h, xg_l)
            ph_ref[:, _sl(b)] = p_h
            pl_ref[:, _sl(b)] = p_l
    else:
        # tier 2: block-level fori over the max live page count, select
        # chains carried as (hi, lo) register pairs
        cnt_max = meta_ref[0, 1]
        for b in range(1, B):
            cnt_max = jnp.maximum(cnt_max, meta_ref[b, 1])

        def body(k, xgs):
            out = list(xgs)
            for b in range(B):
                col = col_ref[pl.ds(b * sigma, sigma), :]
                lane = col & (LANES - 1)
                key = col >> 7
                pid = meta_ref[b, META_HDR + k]
                mk = key == pid
                rh = xh_ref[pl.ds(pid, 1), :]
                rl = xl_ref[pl.ds(pid, 1), :]
                gh = jnp.take_along_axis(
                    jnp.broadcast_to(rh, (sigma, LANES)), lane, axis=1
                )
                gl = jnp.take_along_axis(
                    jnp.broadcast_to(rl, (sigma, LANES)), lane, axis=1
                )
                out[2 * b] = jnp.where(mk, gh, out[2 * b])
                out[2 * b + 1] = jnp.where(mk, gl, out[2 * b + 1])
            return tuple(out)

        init = tuple(
            jnp.zeros((sigma, LANES), jnp.float32) for _ in range(2 * B)
        )
        xgs = jax.lax.fori_loop(0, cnt_max, body, init)
        for b in range(B):
            vh = valh_ref[pl.ds(b * sigma, sigma), :]
            vl = vall_ref[pl.ds(b * sigma, sigma), :]
            p_h, p_l = _ds_mul_pair(vh, vl, xgs[2 * b], xgs[2 * b + 1])
            ph_ref[:, _sl(b)] = p_h
            pl_ref[:, _sl(b)] = p_l

    # ---- lane totals + batched cross-lane exclusive ds scan ------------
    # ONE ds sublane-reduce over the full (sigma, B*128) product pair
    # (bit-identical to the per-tile loop: the reduce never mixes lanes)
    th_all, tl_all = _ds_reduce_sublanes(ph_ref[:], pl_ref[:], sigma)
    lth_ref[:] = th_all.reshape(B, LANES)
    ltl_ref[:] = tl_all.reshape(B, LANES)
    li = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    ih, il = lth_ref[:], ltl_ref[:]
    for sh in (1, 2, 4, 8, 16, 32, 64):
        rh = jnp.where(li >= sh, pltpu.roll(ih, sh, axis=1), 0.0)
        rl = jnp.where(li >= sh, pltpu.roll(il, sh, axis=1), 0.0)
        ih, il = _ds_add(ih, il, rh, rl)
    le_h, le_l = _ds_add(ih, il, *_ds_neg(lth_ref[:], ltl_ref[:]))

    # ---- pass 2: masked window sums + ds window diff + y accumulation --
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (sigma, LANES), 0)
    # B >= 8: Mosaic's lane-gather lowering rejects (B,128) operands
    # with fewer than 8 sublanes (see the f32 kernel's pass-2 gate)
    if win_rel and G == 1 and B >= 8:
        # batched pass 2 (round 5; mirrors the f32 kernel's, measured
        # -12% there): per-tile masked window gathers fill the
        # (sigma, B*128) pv scratch pair, then ONE ds sublane-reduce +
        # (B,128) carry gather / wrap roll / first-row reset / hi-lo
        # split replace the per-tile (1,128) ds chains — bit-identical
        # arithmetic, ~B-fold fewer vector-op issues. Only the
        # order-dependent per-tile y RMW stays scalar. Wrap-flag bits
        # 23/24 come from the conversion (win_rel maps only).
        for b in range(B):
            wm = win_ref[pl.ds(b, 1), :]
            ws, wl = wm & 0xFFFF, (wm >> 16) & (LANES - 1)
            wl_b = jnp.broadcast_to(wl, (sigma, LANES))
            mask = iota_s <= ws
            p_h = ph_ref[:, _sl(b)]
            p_l = pl_ref[:, _sl(b)]
            pvh_ref[:, _sl(b)] = jnp.where(
                mask, jnp.take_along_axis(p_h, wl_b, axis=1), 0.0
            )
            pvl_ref[:, _sl(b)] = jnp.where(
                mask, jnp.take_along_axis(p_l, wl_b, axis=1), 0.0
            )
        sh_, sl_ = _ds_reduce_sublanes(pvh_ref[:], pvl_ref[:], sigma)
        Sh = sh_.reshape(B, LANES)
        Sl = sl_.reshape(B, LANES)
        wm_all = win_ref[:, :]  # (B, 128); G == 1 so capw == 128
        wl_all = (wm_all >> 16) & (LANES - 1)
        ch = jnp.take_along_axis(le_h, wl_all, axis=1)
        cl = jnp.take_along_axis(le_l, wl_all, axis=1)
        Wh, Wl = _ds_add(Sh, Sl, ch, cl)
        first = (wm_all & (1 << 23)) != 0
        Ph = jnp.where(first, 0.0, pltpu.roll(Wh, 1, axis=1))
        Pl = jnp.where(first, 0.0, pltpu.roll(Wl, 1, axis=1))
        W2h, W2l = _ds_add(Wh, Wl, *_ds_neg(Ph, Pl))
        m24 = (wm_all & (1 << 24)) != 0
        hi_h = jnp.where(m24, W2h, 0.0)
        hi_l = jnp.where(m24, W2l, 0.0)
        lo_h = W2h - hi_h  # exact: componentwise either W2 or 0
        lo_l = W2l - hi_l
        for b in range(B):
            by = meta_ref[b, 0] >> 7
            Vh = jnp.concatenate(
                [hi_h[b : b + 1, :], lo_h[b : b + 1, :]], axis=0
            )
            Vl = jnp.concatenate(
                [hi_l[b : b + 1, :], lo_l[b : b + 1, :]], axis=0
            )
            yh = y_ref[pl.ds(by, 2), :]
            yl = y_ref[pl.ds(my_rows + by, 2), :]
            nh, nl = _ds_add(yh, yl, Vh, Vl)
            y_ref[pl.ds(by, 2), :] = nh
            y_ref[pl.ds(my_rows + by, 2), :] = nl

        @pl.when(i == pl.num_programs(0) - 1)
        def _flush_batched():
            cp = pltpu.make_async_copy(y_ref, out_ref, out_sem)
            cp.start()
            cp.wait()

        return

    for b in range(B):
        rs = meta_ref[b, 0]
        a_off = rs & (LANES - 1)
        by = rs >> 7
        p_h = ph_ref[:, _sl(b)]
        p_l = pl_ref[:, _sl(b)]
        leh_b = jnp.broadcast_to(le_h[b : b + 1, :], (8, LANES))
        lel_b = jnp.broadcast_to(le_l[b : b + 1, :], (8, LANES))

        wg_h, wg_l = [], []
        for g in range(G):
            wm = win_ref[pl.ds(b, 1), pl.ds(g * LANES, LANES)]
            ws, wl = wm & 0xFFFF, (wm >> 16) & (LANES - 1)
            wl_b = jnp.broadcast_to(wl, (sigma, LANES))
            mask = iota_s <= ws
            qh = jnp.where(mask, jnp.take_along_axis(p_h, wl_b, axis=1), 0.0)
            ql = jnp.where(mask, jnp.take_along_axis(p_l, wl_b, axis=1), 0.0)
            sh_, sl_ = _ds_reduce_sublanes(qh, ql, sigma)
            wl8 = jnp.broadcast_to(wl, (8, LANES))
            ch = jnp.take_along_axis(leh_b, wl8, axis=1)[0:1]
            cl = jnp.take_along_axis(lel_b, wl8, axis=1)[0:1]
            wh, wl_v = _ds_add(sh_, sl_, ch, cl)
            wg_h.append(wh)
            wg_l.append(wl_v)
        Wh = wg_h[0] if G == 1 else jnp.concatenate(wg_h, axis=0)
        Wl = wg_l[0] if G == 1 else jnp.concatenate(wg_l, axis=0)

        def _prev(W):
            rolled = pltpu.roll(W, 1, axis=1)
            if G > 1:
                down = pltpu.roll(W, 1, axis=0)
                return jnp.where(
                    _lane_iota(W.shape) == 0,
                    pltpu.roll(down, 1, axis=1),
                    rolled,
                )
            return rolled

        d_idx = _sub_iota(Wh.shape) * LANES + _lane_iota(Wh.shape)
        if win_rel:
            Ph = jnp.where(d_idx == a_off, 0.0, _prev(Wh))
            Pl = jnp.where(d_idx == a_off, 0.0, _prev(Wl))
            W2h, W2l = _ds_add(Wh, Wl, *_ds_neg(Ph, Pl))
            fh, fl = W2h[0:1], W2l[0:1]
            lm = _lane_iota((1, LANES)) >= a_off
            hi0h = jnp.where(lm, fh, 0.0)
            hi0l = jnp.where(lm, fl, 0.0)
            parts_h = [hi0h] + ([W2h[1:]] if G > 1 else []) + [fh - hi0h]
            parts_l = [hi0l] + ([W2l[1:]] if G > 1 else []) + [fl - hi0l]
            Vh = jnp.concatenate(parts_h, axis=0)
            Vl = jnp.concatenate(parts_l, axis=0)
            rows = G + 1
        else:
            Ph = jnp.where(d_idx - 1 >= a_off, _prev(Wh), 0.0)
            Pl = jnp.where(d_idx - 1 >= a_off, _prev(Wl), 0.0)
            W2h, W2l = _ds_add(Wh, Wl, *_ds_neg(Ph, Pl))
            Vh = jnp.where(d_idx >= a_off, W2h, 0.0)
            Vl = jnp.where(d_idx >= a_off, W2l, 0.0)
            rows = G

        yh = y_ref[pl.ds(by, rows), :]
        yl = y_ref[pl.ds(my_rows + by, rows), :]
        nh, nl = _ds_add(yh, yl, Vh, Vl)
        y_ref[pl.ds(by, rows), :] = nh
        y_ref[pl.ds(my_rows + by, rows), :] = nl

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        cp = pltpu.make_async_copy(y_ref, out_ref, out_sem)
        cp.start()
        cp.wait()


def _make_df64_call(p, B, sigma, pmax, capw, n_pad, m_pad, interpret,
                    contig, win_rel):
    kernel = functools.partial(
        _df64_kernel, B=B, sigma=sigma, pmax=pmax, capw=capw,
        contig=contig, win_rel=win_rel,
    )
    mw = _meta_width(pmax)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (2 * m_pad // LANES, LANES), jnp.float32
        ),
        grid=(p // B,),
        in_specs=[
            pl.BlockSpec((B, mw), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B * sigma, LANES), lambda i: (i, 0)),
            pl.BlockSpec((B, capw), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x lo
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.VMEM((2 * m_pad // LANES, LANES), jnp.float32),  # y pair
            pltpu.VMEM((sigma, B * LANES), jnp.float32),  # prod hi
            pltpu.VMEM((sigma, B * LANES), jnp.float32),  # prod lo
            pltpu.VMEM((sigma, B * LANES), jnp.float32),  # masked win hi
            pltpu.VMEM((sigma, B * LANES), jnp.float32),  # masked win lo
            pltpu.VMEM((B, LANES), jnp.float32),  # lane totals hi
            pltpu.VMEM((B, LANES), jnp.float32),  # lane totals lo
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * p * sigma * LANES,
            bytes_accessed=p * sigma * LANES * 12 + 2 * (m_pad + n_pad) * 4,
            transcendentals=0,
        ),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _df64_spmv_jit(d: DF64CSR5, xh, xl, interpret: bool):
    a5 = d.a5
    cfg = a5.config
    p, sigma = a5.num_tiles, cfg.sigma
    n_pad, m_pad = a5.n_pad, a5.m_pad

    meta = build_meta_plane(a5)
    pad = (0, n_pad + LANES - a5.n)
    xh2d = jnp.pad(xh.astype(jnp.float32), pad).reshape(-1, LANES)
    xl2d = jnp.pad(xl.astype(jnp.float32), pad).reshape(-1, LANES)
    col2d = a5.col_idx_tiles.reshape(p * sigma, LANES)
    valh2d = a5.val_tiles.reshape(p * sigma, LANES)
    vall2d = d.val_lo_tiles.reshape(p * sigma, LANES)

    B = _effective_block(min(cfg.tiles_per_block, DF64_BLOCK_CAP), a5.pmax, p)
    call = _make_df64_call(
        p, B, sigma, a5.pmax, a5.capw, n_pad, m_pad, interpret,
        contig=a5.pages_contig, win_rel=a5.win_rel,
    )
    y2d = call(meta, col2d, valh2d, vall2d, a5.win_map, xh2d, xl2d)
    rows = m_pad // LANES
    y_hi = y2d[:rows].reshape(-1)[: a5.m]
    y_lo = y2d[rows:].reshape(-1)[: a5.m]
    return y_hi, y_lo


def df64_spmv(
    d: DF64CSR5,
    x,
    alpha: float = 1.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """y = alpha * A @ x in double-single; returns the (y_hi, y_lo) f32
    pair (combine on the host: ``y = y_hi.astype(f64) + y_lo``; the TPU
    cannot hold f64).

    ``x`` is a host f64 vector (split exactly) or an (x_hi, x_lo) pair of
    f32 arrays. alpha is folded into x on the host at full f64 precision.
    """
    if isinstance(x, tuple):
        xh, xl = x
    else:
        xh, xl = split_f64(np.asarray(x, np.float64) * float(alpha))
        return _df64_spmv_jit(d, jnp.asarray(xh), jnp.asarray(xl), interpret)
    if alpha != 1.0:
        xf = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        xh, xl = split_f64(xf * float(alpha))
        xh, xl = jnp.asarray(xh), jnp.asarray(xl)
    return _df64_spmv_jit(d, xh, xl, interpret)


def df64_combine(y_hi, y_lo) -> np.ndarray:
    """Host-side recombination to f64."""
    return np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64)
