"""Probe: host->device upload anatomy for conversion planes (round 4).

Questions (banded2M-class, ~54M nnz):
1. What rate does jnp.array achieve on a warm arena buffer NOW, and is
   it shape-dependent (flat (nnz,) vs tiled (p, sigma, 128))?
2. Does chunked upload (jax.device_put per 64 MB slice + concat) beat
   one big put?
3. What does the on-device conversion (build_csr5_device) cost at this
   scale, steady-state, given device-resident CSR arrays?
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmark_spmv_using_csr5_tpu.utils import synth  # noqa: E402
from benchmark_spmv_using_csr5_tpu.utils.hostmem import arena_take  # noqa: E402


def wall(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
        # keep the result alive until timed, then drop
        del out
    return best


def main():
    m, bw = 2_000_000, 27
    a = synth.banded(m, bw, dtype=np.float32)
    nnz = a.nnz
    sig, om = 24, 128
    T = sig * om
    p = -(-nnz // T)
    p_pad = -(-p // 32) * 32
    nnz_pad = p_pad * T
    print(f"nnz={nnz} p_pad={p_pad} plane={nnz_pad * 4 / 1e6:.0f} MB", flush=True)

    flat = arena_take(nnz_pad, np.float32, "pr:flat", zero=False)
    flat[:nnz] = a.data
    flat[nnz:] = 0
    tiled = arena_take((p_pad, sig, om), np.float32, "pr:tiled", zero=False)
    tiled.reshape(-1)[:] = flat

    mb = nnz_pad * 4 / 1e6
    t = wall(lambda: jnp.array(flat))
    print(f"flat (nnz,) jnp.array:      {t:.2f} s = {mb / t / 1e3:.2f} GB/s", flush=True)
    t = wall(lambda: jnp.array(tiled))
    print(f"tiled (p,{sig},{om}) jnp.array: {t:.2f} s = {mb / t / 1e3:.2f} GB/s", flush=True)

    t = wall(lambda: jax.device_put(flat))
    print(f"flat device_put:            {t:.2f} s = {mb / t / 1e3:.2f} GB/s", flush=True)

    # chunked: 16 MB slices, device concat
    def chunked(chunk_elems=16 * 1024 * 1024 // 4):
        parts = [
            jax.device_put(flat[i : i + chunk_elems])
            for i in range(0, nnz_pad, chunk_elems)
        ]
        return jnp.concatenate(parts)

    t = wall(chunked)
    print(f"flat chunked 16MB + concat: {t:.2f} s = {mb / t / 1e3:.2f} GB/s", flush=True)

    # device-side conversion cost, steady state
    from benchmark_spmv_using_csr5_tpu.ops.convert_device import (
        build_csr5_device,
        plan_statics,
    )

    t0 = time.perf_counter()
    statics = plan_statics(a.indptr, a.indices, a.shape)
    t_statics = time.perf_counter() - t0
    print(f"plan_statics (host):        {t_statics:.2f} s", flush=True)

    t0 = time.perf_counter()
    rp_d = jnp.array(a.indptr.astype(np.int64))
    ci_d = jnp.array(a.indices.astype(np.int32))
    v_d = jnp.array(a.data)
    jax.block_until_ready((rp_d, ci_d, v_d))
    t_up = time.perf_counter() - t0
    print(
        f"raw CSR upload:             {t_up:.2f} s = "
        f"{(nnz * 8 + m * 8) / 1e6 / t_up / 1e3:.2f} GB/s",
        flush=True,
    )

    for it in range(3):
        t0 = time.perf_counter()
        a5 = build_csr5_device(rp_d, ci_d, v_d, statics)
        jax.block_until_ready(a5.val_tiles)
        print(
            f"build_csr5_device #{it}:      {time.perf_counter() - t0:.2f} s",
            flush=True,
        )
        del a5


if __name__ == "__main__":
    main()
