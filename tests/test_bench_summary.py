"""The driver record must be machine-parseable (VERDICT r04 missing #1).

The driver captures only the last ~2 KB of bench.py stdout and parses the
FINAL line; r04's inline-extras summary outgrew that window and the round
officially landed parsed=null. These tests pin the contract: the compact
summary stays small no matter how many cases land, and the projection
tooling reads the compact form (with r02-era fallback).
"""

import importlib.util
import json
import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_here, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_results(n_cases):
    # representative per-case payload (the big convert_phases_ms dicts are
    # what blew the r04 line)
    case = {
        "gflops": 132.5,
        "pct_roofline": 99.0,
        "spmv_ms": 0.2122,
        "nnz_per_sec": 6.6e10,
        "backend": "pallas",
        "check_ok": True,
        "max_rel_err": 0.0,
        "sigma": 24,
        "convert_ms": 38400.0,
        "convert_phases_ms": {
            "malloc": 872.3,
            "tile_ptr": 196.7,
            "tile_desc": 217.8,
            "tpu_plan": 1651.1,
            "transpose": 3339.1,
            "upload": 29672.4,
        },
    }
    return {f"case{i}": dict(case) for i in range(n_cases)} | {
        "banded500k": dict(case)
    }


def test_compact_summary_fits_driver_tail():
    bench = _load("bench_mod", "bench.py")
    for n in (0, 1, 15, 40):
        line = json.dumps(bench._summary(_fake_results(n)))
        assert len(line) < 1024, (n, len(line))
    s = bench._summary(_fake_results(15))
    assert s["value"] == 99.0
    assert s["primary_ms"] == 0.2122
    assert s["check"] is True
    assert "extras" not in s
    full = bench._full_record(_fake_results(15))
    assert "extras" in full and "banded500k" in full["extras"]


def test_compact_summary_without_primary():
    bench = _load("bench_mod", "bench.py")
    s = bench._summary({})
    assert s["value"] == 0.0 and "error" in s
    assert len(json.dumps(s)) < 1024


def test_driver_primary_ms_reads_compact_then_legacy(tmp_path, monkeypatch):
    ge = _load("graft_entry_mod", "__graft_entry__.py")
    monkeypatch.setattr(
        ge, "__file__", str(tmp_path / "__graft_entry__.py")
    )
    # no records -> builder fallback
    assert ge._driver_primary_ms() == 0.2122
    # a local bench.py full record beats the hardcoded fallback (covers
    # a driver ordering where multichip runs before BENCH_r05 lands)
    (tmp_path / "BENCH_full.json").write_text(
        json.dumps({"primary_ms": 0.212, "value": 99.07})
    )
    assert ge._driver_primary_ms() == 0.212
    # legacy (r02) inline-extras form
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            {"parsed": {"extras": {"banded500k": {"spmv_ms": 0.2751}}}}
        )
    )
    assert ge._driver_primary_ms() == 0.2751
    # r04-shaped breakage: parsed null is skipped, falls through to r02
    (tmp_path / "BENCH_r04.json").write_text(json.dumps({"parsed": None}))
    assert ge._driver_primary_ms() == 0.2751
    # r05 compact form wins (newest first)
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": {"primary_ms": 0.2122, "value": 99.0}})
    )
    assert ge._driver_primary_ms() == 0.2122
