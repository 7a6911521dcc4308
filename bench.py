#!/usr/bin/env python
"""Round benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: CSR5 SpMV percent of per-chip HBM speed-of-light (the
reference bytes model, detail/utils.h:10-16) on the structured-matrix
config (BASELINE.json configs[1] class). north_star = 80%% (BASELINE.md),
so vs_baseline = value / 80.

Each case runs in its own subprocess with a timeout + one retry: the TPU
tunnel occasionally 500s or hangs outright (a hang once swallowed a
whole 1100 s bench run, NOTES.md); isolating cases bounds the damage to
one case and guarantees the primary JSON line is emitted.
"""

import json
import os
import subprocess
import sys
import time

CASES = [
    "banded500k",
    "scatband300k",
    "powerlaw200k",
    "spmm8_banded500k",
    "dia_tridiag500k",
    "banded2M",  # slowest (conversion + 2M-scale oracle): always last
]
#: per-case wall limit (compile ~1-2 min + timed loops; generous margin)
CASE_TIMEOUT_S = 360
#: slower cases get their own limit (banded2M measured ~10 min end to
#: end: 2M-row synth + scipy oracle + conversion + compile)
CASE_TIMEOUT_OVERRIDE_S = {"banded2M": 780}
#: global budget: stop launching new attempts past this point so the
#: final JSON line is always emitted well before any driver timeout
TOTAL_BUDGET_S = 2700
_T0 = time.monotonic()
#: plausibility bounds (ms): a result far above the historical range
#: means the tunnel was degraded during the run (observed: powerlaw
#: measured 189 ms during a window where the next case hung outright,
#: vs its stable 7 ms) — rerun once and keep the faster result
SUSPECT_MS = {
    "banded500k": 1.0,
    "scatband300k": 3.0,
    "powerlaw200k": 30.0,
    "spmm8_banded500k": 6.0,
    "dia_tridiag500k": 0.5,
    "banded2M": 4.0,
}


def run_case(name: str):
    case_timeout = CASE_TIMEOUT_OVERRIDE_S.get(name, CASE_TIMEOUT_S)
    for attempt in (1, 2):
        if time.monotonic() - _T0 > TOTAL_BUDGET_S - case_timeout:
            print(
                f"[{name}] skipping attempt {attempt}: global budget "
                f"({TOTAL_BUDGET_S}s) nearly spent",
                file=sys.stderr,
            )
            return None
        try:
            proc = subprocess.run(
                [sys.executable, "-m",
                 "benchmark_spmv_using_csr5_tpu.bench.case_runner", name],
                capture_output=True,
                text=True,
                timeout=case_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            sys.stderr.write(proc.stderr[-4000:])
            if proc.returncode == 0:
                line = proc.stdout.strip().splitlines()[-1]
                return json.loads(line)
            print(
                f"[{name}] attempt {attempt}: exit {proc.returncode}",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(
                f"[{name}] attempt {attempt}: timed out after "
                f"{case_timeout}s (tunnel hang?)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"[{name}] attempt {attempt}: {type(e).__name__}: "
                f"{str(e)[:200]}",
                file=sys.stderr,
            )
    return None


def _summary(results: dict) -> dict:
    primary = results["banded500k"]
    return {
        "metric": "csr5_spmv_pct_hbm_roofline_banded500k_f32",
        "value": primary["pct_roofline"],
        "unit": "% of 819 GB/s roofline",
        "vs_baseline": round(primary["pct_roofline"] / 80.0, 4),
        "gflops": primary["gflops"],
        "gnnz_per_s": round(primary["nnz_per_sec"] / 1e9, 3),
        "check": all(r.get("check_ok", False) for r in results.values()),
        "extras": {
            k: {kk: vv for kk, vv in r.items() if kk != "name"}
            for k, r in results.items()
        },
    }


def main():
    results = {}
    for name in CASES:
        res = run_case(name)
        if res is not None and res.get("spmv_ms", 0) > SUSPECT_MS.get(
            name, float("inf")
        ):
            print(
                f"[{name}] {res['spmv_ms']} ms exceeds the plausibility "
                f"bound {SUSPECT_MS[name]} ms (degraded tunnel?); rerunning",
                file=sys.stderr,
            )
            res2 = run_case(name)
            if res2 is not None and res2.get("spmv_ms", 1e30) < res["spmv_ms"]:
                res = res2
        if res is not None:
            results[name] = res
        if name == "banded500k" and res is not None:
            # provisional primary-only line: if an external timeout kills
            # this process mid-suite, the round still records the
            # headline metric (the complete line printed at the end
            # supersedes this one for last-line parsers)
            print(json.dumps(_summary({name: res})), flush=True)

    primary = results.get("banded500k")
    if primary is None:
        print(
            json.dumps(
                {
                    "metric": "csr5_spmv_pct_hbm_roofline_banded500k_f32",
                    "value": 0.0,
                    "unit": "% of 819 GB/s roofline",
                    "vs_baseline": 0.0,
                    "check": False,
                    "error": "primary benchmark failed twice",
                    "extras": results,
                }
            )
        )
        return

    print(json.dumps(_summary(results)))


if __name__ == "__main__":
    main()
