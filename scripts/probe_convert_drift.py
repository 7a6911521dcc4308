"""Reproduce the BENCH_r02 conversion-time drift (weak #6).

In ONE process, mirror the driver-case sequence (banded500k convert,
other work, banded500k convert again) with per-phase timings, on the CPU
backend (conversion is host-side; jnp.asarray upload is the only device
touch and the CPU backend copies immediately, an upper bound on the host
cost). Prints phase breakdowns so the slow step is identified, not
guessed.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def tmark(label, t0):
    t1 = time.perf_counter()
    print(f"  {label}: {(t1 - t0) * 1e3:.0f} ms", flush=True)
    return t1


def convert_once(tag, a, sigma):
    from benchmark_spmv_using_csr5_tpu.config import CSR5Config
    from benchmark_spmv_using_csr5_tpu.ops import convert

    t0 = time.perf_counter()
    a5 = convert.build_csr5(
        (a.indptr, a.indices, a.data, a.shape), CSR5Config(sigma=sigma)
    )
    jax.block_until_ready(a5.val_tiles)
    total = (time.perf_counter() - t0) * 1e3
    ph = " ".join(f"{k}={v:.0f}" for k, v in convert.last_convert_phases.items())
    print(f"[{tag}] total={total:.0f} ms  {ph}", flush=True)
    return a5


def main():
    from benchmark_spmv_using_csr5_tpu.utils import synth

    t0 = time.perf_counter()
    a500k = synth.banded(500_000, 27, dtype=np.float32)
    t0 = tmark("synth banded500k", t0)

    convert_once("banded500k #1", a500k, 24)
    t0 = tmark("(convert1 wall)", t0)

    # simulate intermediate cases touching memory: scatband300k + powerlaw
    a_sc = synth.scattered_band(300_000, 16, 6000, dtype=np.float32)
    t0 = tmark("synth scatband", t0)
    convert_once("scatband300k", a_sc, 8)
    del a_sc
    a_pl = synth.power_law(200_000, 200_000, 8.0, dtype=np.float32)
    t0 = tmark("synth powerlaw", t0)
    convert_once("powerlaw200k", a_pl, 8)
    del a_pl
    t0 = time.perf_counter()

    # second conversion of the SAME matrix (the spmm8 25.1 s observation)
    convert_once("banded500k #2", a500k, 24)
    t0 = tmark("(convert2 wall)", t0)

    # banded2M (the 85 s observation)
    a2m = synth.banded(2_000_000, 27, dtype=np.float32)
    t0 = tmark("synth banded2M", t0)
    convert_once("banded2M", a2m, 24)
    t0 = tmark("(convert 2M wall)", t0)


if __name__ == "__main__":
    main()
