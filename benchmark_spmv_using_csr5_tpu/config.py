"""Global configuration, tunables and status codes.

TPU-native re-design of the reference's shared constants layer:
  - status codes / format enum mirror ``CSR5_cuda/detail/common.h:13-22``
  - per-backend tile tunables (omega, sigma, thread-group sizes) mirror
    ``CSR5_cuda/detail/cuda/common_cuda.h:11-15`` and siblings; on TPU the
    lane count is fixed by hardware (128 vector lanes), so omega defaults to
    the VREG lane width instead of the warp/wavefront width.
  - the sigma auto-tuning heuristic mirrors
    ``CSR5_cuda/anonymouslib_cuda.h:295-318`` (CUDA) and
    ``CSR5_opencl_nvidia/anonymouslib_opencl.h:341-357`` (OpenCL), re-tuned
    for TPU sublane granularity.

The reference keeps six per-backend copies of these constants; here a single
:class:`CSR5Config` collapses them into one runtime-configurable object that
is hashable (usable as a static jit argument, the TPU analogue of the
reference's template parameters / OpenCL JIT re-specialisation,
``anonymouslib_opencl.h:363-479``).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Status codes (parity with ANONYMOUSLIB_* codes, detail/common.h:13-18).
# The TPU library raises exceptions instead of returning ints, but the codes
# are preserved for API compatibility with the reference benchmark drivers.
# ---------------------------------------------------------------------------


class Status(enum.IntEnum):
    SUCCESS = 0
    INVALID_HANDLE = -1
    UNSUPPORTED_CSR5_OMEGA = -2
    UNSUPPORTED_CSR5_SIGMA = -3
    UNSUPPORTED_COMPUTE_CAPABILITY = -4
    UNSUPPORTED_VALUE_TYPE = -5


class Format(enum.IntEnum):
    """Storage format state of a matrix handle (detail/common.h:20-22)."""

    CSR = 0
    CSR5 = 1
    HYB5 = 2  # declared but unused by the reference; kept for parity


#: Sentinel requesting the sigma auto-tune heuristic
#: (ANONYMOUSLIB_AUTO_TUNED_SIGMA, anonymouslib_cuda.h:299).
AUTO_TUNED_SIGMA = -1

# ---------------------------------------------------------------------------
# TPU hardware model (v4/v5 class defaults)
# ---------------------------------------------------------------------------

#: VPU lane width: the last dim of every vector register. The reference's
#: omega is the SIMD width of the target (32 CUDA warp / 4 AVX2 / 8 AVX-512 /
#: 64 AMD wavefront, SURVEY.md section 2.0); on TPU it is 128 lanes.
TPU_LANES = 128

#: VPU sublane count for float32 (second-to-last dim of a VREG).
TPU_SUBLANES = 8

#: Default per-chip HBM bandwidth used for roofline reporting when the
#: device cannot be queried (TPU v5e ~= 819 GB/s).
DEFAULT_HBM_GBPS = 819.0


@dataclasses.dataclass(frozen=True)
class CSR5Config:
    """Static CSR5 tiling configuration (jit-hashable).

    Mirrors the reference tunable set: omega/sigma
    (``common_cuda.h:11-15``) plus the launch-geometry knobs
    (THREAD_GROUP/THREAD_BUNCH → ``tiles_per_block``). A fresh config is a
    new static jit argument, i.e. changing sigma re-specialises the Pallas
    kernel, mirroring the OpenCL backend's re-JIT on ``setSigma``
    (``anonymouslib_opencl.h:363-479``).
    """

    #: Tile width = number of vector lanes cooperating on a tile.
    omega: int = TPU_LANES
    #: Tile height = consecutive nonzeros per lane.
    sigma: int = 16
    #: Tiles processed per Pallas grid step (the analogue of
    #: THREAD_GROUP / THREAD_BUNCH block shaping, common_cuda.h:14-15).
    #: Measured (round-4 TPU sweep, NOTES.md): with the batched window
    #: pass-2 the per-block fixed costs (two MXU scan matmuls + the
    #: (B,128) wrap/diff ops) amortize over B — B=128 runs the banded
    #: primary 21%% faster than the round-1 optimum B=32 (0.208 vs 0.246
    #: ms), banded2M -15%%, scattered/SpMM a wash. The kernel's
    #: ``_effective_block`` halves B automatically when the per-block
    #: SMEM meta block or the tile count cannot support it.
    tiles_per_block: int = 128
    #: Index dtype name (TPU-native int32; the reference templates iT/uiT).
    index_dtype: str = "int32"

    @property
    def tile_nnz(self) -> int:
        return self.omega * self.sigma

    @property
    def idt(self):
        return jnp.dtype(self.index_dtype)

    def __post_init__(self):
        if self.omega % TPU_LANES != 0:
            raise ValueError(
                f"omega={self.omega} must be a multiple of the TPU lane "
                f"width {TPU_LANES} (Status.UNSUPPORTED_CSR5_OMEGA)"
            )
        if self.sigma < 1 or self.sigma > 1024:
            raise ValueError(
                f"sigma={self.sigma} out of range (Status.UNSUPPORTED_CSR5_SIGMA)"
            )


def compute_sigma(m: int, nnz: int, sigma: int = AUTO_TUNED_SIGMA) -> int:
    """Sigma auto-tune heuristic.

    Behavioural parity with ``anonymouslibHandle::computeSigma``
    (``anonymouslib_cuda.h:295-318``): pick sigma from the mean nnz/row with
    breakpoints (r, s, t, u). The CUDA backend uses (4, 32, 256, 6); on TPU
    the sublane granularity favours multiples of 8, so the mapping is snapped
    to sublane multiples while keeping the same piecewise shape:

    - short rows (nnz/row <= r): small sigma
    - medium rows: sigma tracks nnz/row
    - long rows (nnz/row > t): small sigma again (fast-track tiles dominate)
    """
    if sigma != AUTO_TUNED_SIGMA:
        return int(sigma)
    r, s, t, u = 8, 32, 256, 8
    nnz_per_row = nnz / max(m, 1)
    if nnz_per_row <= r:
        sig = r
    elif nnz_per_row <= s:
        sig = int(nnz_per_row)
    elif nnz_per_row <= t:
        sig = s
    else:
        sig = u
    # snap to a sublane multiple for efficient (sigma, 128) VMEM tiling
    sig = max(TPU_SUBLANES, (sig // TPU_SUBLANES) * TPU_SUBLANES)
    return sig
