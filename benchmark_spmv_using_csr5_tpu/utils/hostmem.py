"""Host-memory allocation helpers for this platform's write pathology.

Measured (NOTES.md): the FIRST write to a fresh large (>~30 MB)
anonymous numpy mapping runs at ~8 MB/s on this host unless it goes
through memset/memcpy — ``np.empty`` + a C++ or SIMD store loop costs
tens of seconds per 100 MB (native tile transpose: 16.6 s into
``np.empty`` vs 0.14 s into a prefaulted buffer, same call). Prefault
with ``np.zeros`` + ``.fill(0)`` (memset faults pages at GB/s), then
in-place writes run at full speed. Slice-assignment/memcpy into lazy
``np.zeros`` pages is also fast; scattered or SIMD first writes are not.
"""

from __future__ import annotations

import numpy as np


def prefaulted(shape, dtype) -> np.ndarray:
    """A zeroed numpy buffer whose pages are already faulted in (safe to
    first-write with scattered/SIMD stores at full speed)."""
    a = np.zeros(shape, dtype=dtype)
    a.fill(0)
    return a


def chunked_random_integers(rng, lo, hi, out, chunk=1 << 21):
    """``rng.integers`` into a prefaulted buffer in cache-sized chunks
    (the one-shot call writes a fresh slow buffer)."""
    n = out.shape[0]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out[s:e] = rng.integers(lo, hi, size=e - s)
    return out
