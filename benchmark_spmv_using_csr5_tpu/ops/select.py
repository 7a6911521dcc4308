"""Structure-driven format auto-selection: DIA / HYB5 / CSR5.

The reference library leaves format choice to the caller (the
``anonymouslibHandle`` state machine converts to whatever the user asks
for, ``anonymouslib_cuda.h:79-220``); its only auto-tuning is the sigma
heuristic. This module adds the missing piece for a framework with three
formats: ONE O(nnz) structural analysis of the diagonal occupancy decides
which format's kernel will win, using the measured TPU crossovers:

- **DIA** whenever the whole matrix fits dense diagonals (ndiag <=
  MAX_DIAGS, fill >= MIN_FILL): with the interleaved value layout the
  DIA kernel streams 4 B/nnz with zero gather work and measured FASTER
  than CSR5 at every tested size (tridiag500k 0.016 vs 0.06 ms,
  banded27-500k 0.118 vs 0.26, banded27-2M 0.46 vs 1.19; NOTES.md).
- **HYB5** when a dense-diagonal core holds a meaningful share of nnz
  but a scattered remainder rules pure DIA out (measured 1.32 ms vs
  3.27 pure-CSR5 on the mixed benchmark; ops/hyb.py).
- **CSR5** otherwise — the general path with its tiered gather.

``select_format`` only reads the structure (no conversion); callers then
build the chosen format. ``analyze_diagonals`` exposes the raw stats for
tooling.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .dia import MAX_DIAGS, MIN_FILL

#: a diagonal is HYB-dense when filled to at least this ratio of its
#: maximum length (ops/hyb.py default)
HYB_DIAG_FILL = 0.5
#: HYB pays two kernel launches + a y add; only worth it when the dense
#: diagonals carry at least this share of nnz (below it, CSR5's tiered
#: gather on the full matrix wins)
HYB_MIN_DIA_SHARE = 0.35


class DiagStats(NamedTuple):
    ndiag: int  #: distinct diagonals
    nnz: int
    #: nnz share on diagonals filled >= HYB_DIAG_FILL (capped at MAX_DIAGS)
    dense_share: float
    dense_diags: int
    #: True when build_dia would accept the whole matrix
    dia_ok: bool


def analyze_diagonals(
    row_ptr, col_idx, shape, max_diags: int = MAX_DIAGS
) -> DiagStats:
    """One pass over the structure: diagonal count, fill, dense share."""
    m, n = shape
    row_ptr = np.asarray(row_ptr, np.int64)
    col_idx = np.asarray(col_idx, np.int64)
    nnz = int(col_idx.shape[0])
    if nnz == 0:
        return DiagStats(0, 0, 0.0, 0, False)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(row_ptr))
    off = col_idx - rows
    uniq, counts = np.unique(off, return_counts=True)
    ndiag = int(len(uniq))
    length = np.minimum(m, n - uniq) - np.maximum(0, -uniq)
    fill = counts / np.maximum(length, 1)
    dense = fill >= HYB_DIAG_FILL
    if dense.sum() > max_diags:
        keep = np.argsort(fill[dense])[::-1][:max_diags]
        sel = np.flatnonzero(dense)[keep]
        dense = np.zeros_like(dense)
        dense[sel] = True
    dense_share = float(counts[dense].sum() / nnz)
    dia_ok = ndiag <= max_diags and nnz >= MIN_FILL * ndiag * m
    return DiagStats(ndiag, nnz, dense_share, int(dense.sum()), dia_ok)


def select_format(row_ptr, col_idx, shape) -> str:
    """Pick ``"dia"``, ``"hyb"`` or ``"csr5"`` from the structure alone."""
    st = analyze_diagonals(row_ptr, col_idx, shape)
    if st.dia_ok:
        return "dia"
    if st.dense_diags > 0 and st.dense_share >= HYB_MIN_DIA_SHARE:
        return "hyb"
    return "csr5"
