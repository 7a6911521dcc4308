"""CSR5 SpMV executors.

Two executors over the same :class:`CSR5Matrix` format:

- :func:`csr5_spmv_xla` -- pure-XLA reference executor. Implements the
  tile/prefix/window decomposition (NOTES.md) with stock XLA ops (gather /
  cumsum / scatter-add). Runs everywhere (CPU test meshes, interpret-free),
  and is the independent oracle for the Pallas kernel; on TPU it is slow
  (XLA lowers gather/scatter serially) and exists for correctness and as
  the fallback for matrices outside the Pallas kernel's static limits.

- :func:`csr5_spmv_pallas` (ops/csr5_kernel.py) -- the production Pallas
  TPU kernel: single pass over all tiles, in-VMEM x page gather, roll-based
  tile prefix scan, routed window extraction, sequential-grid window
  accumulation. This is the TPU re-design of the reference's 3-kernel
  pipeline ``spmv_csr5_compute_kernel`` + ``spmv_csr5_calibrate_kernel`` +
  ``spmv_csr5_tail_partition_kernel`` (csr5_spmv_cuda.h:275-419): compute
  maps to the per-tile scan+window, calibrate/tail collapse into the
  sequential overlapping-window accumulation (csr5_spmv_cuda.h:313-419).

Both compute ``y = alpha * A @ x`` like ``anonymouslibHandle::spmv``
(anonymouslib_cuda.h:262-285).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..models.formats import CSR5Matrix, col_tiles_of


@jax.jit
def csr5_spmv_xla(a5: CSR5Matrix, x: jax.Array, alpha=1.0) -> jax.Array:
    """Reference executor for the CSR5 tile decomposition in stock XLA."""
    p = a5.num_tiles
    sig, omega = a5.sigma, a5.omega
    T = sig * omega
    m = a5.m

    xg = jnp.take(x, col_tiles_of(a5).reshape(-1), fill_value=0).reshape(
        p, sig, omega
    )
    prod = (a5.val_tiles * xg).astype(x.dtype)

    # tile-local inclusive prefix in element order (lane-major)
    elem = jnp.swapaxes(prod, 1, 2).reshape(p, T)  # [t, l*sig + s]
    P = jnp.cumsum(elem, axis=1)

    # routed window extraction: W_end[t, d] = P[t, win_end[t, d]]
    # (lane bits are 16-22; wrapped maps carry wrap-flag bits at 23/24)
    win_end = ((a5.win_map >> 16) & 127) * sig + (a5.win_map & 0xFFFF)
    W_end = jnp.take_along_axis(P, win_end, axis=1)

    rs = a5.tile_ptr[:-1]
    base = (rs // 128) * 128
    a = (rs - base)[:, None]  # (p, 1)
    d = jnp.arange(a5.capw)[None, :]
    if a5.win_rel:
        # wrapped maps (ops/convert.py): slot d = row base+d for
        # d >= rs%128, else base+capw+d; the wrap seam is consecutive rows
        W_prev = jnp.where(d == a, 0.0, jnp.roll(W_end, 1, axis=1))
        W2 = W_end - W_prev
        rows = base[:, None] + d + jnp.where(d < a, a5.capw, 0)
    else:
        # aligned maps: mask slots before the tile's first row
        W_prev = jnp.concatenate(
            [jnp.zeros((p, 1), P.dtype), W_end[:, :-1]], axis=1
        )
        W_prev = jnp.where(d - 1 >= a, W_prev, 0.0)
        W2 = jnp.where(d >= a, W_end - W_prev, 0.0)
        rows = base[:, None] + d  # (p, capw), all < m_pad
    y_pad = jnp.zeros(a5.m_pad, x.dtype).at[rows.reshape(-1)].add(W2.reshape(-1))
    return (alpha * y_pad[:m]).astype(x.dtype)


def csr5_spmv(a5: CSR5Matrix, x: jax.Array, alpha=1.0, backend: str = "auto") -> jax.Array:
    """Dispatching spmv(): Pallas on TPU, XLA elsewhere (spmv analogue,
    anonymouslib_cuda.h:262-285)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from .csr5_kernel import csr5_spmv_pallas

        return csr5_spmv_pallas(a5, x, alpha)
    return csr5_spmv_xla(a5, x, alpha)


@jax.jit
def csr5_spmm_xla(a5: CSR5Matrix, x: jax.Array, alpha=1.0) -> jax.Array:
    """Y = alpha * A @ X for X (n, R): XLA reference executor (vmapped
    over right-hand sides)."""
    return jax.vmap(
        lambda col: csr5_spmv_xla(a5, col, alpha), in_axes=1, out_axes=1
    )(x)


def csr5_spmm(
    a5: CSR5Matrix, x: jax.Array, alpha=1.0, backend: str = "auto"
) -> jax.Array:
    """Dispatching SpMM: multi-rhs Pallas kernel on TPU when supported."""
    from .csr5_kernel import csr5_spmm_pallas, pallas_spmm_supported

    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pallas_spmm_supported(a5, int(x.shape[1]))
            else "xla"
        )
    if backend == "pallas":
        return csr5_spmm_pallas(a5, x, alpha)
    return csr5_spmm_xla(a5, x, alpha)
