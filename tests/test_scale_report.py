"""scale_bench report plumbing: --report must regenerate BENCH/BASELINE.md
from the durable per-run log (an interrupted campaign loses nothing), and
the efficiency/anchor arithmetic must be what the docs claim.

Pure-python (no Spark): scale_bench is imported as a module and driven
against a temp ROOT with a synthetic scale_runs.jsonl + kernel anchor.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(tmp_path, monkeypatch, rows=1000, levels="8,16,32", reps=2):
    monkeypatch.setenv("SCALE_BENCH_ROWS", str(rows))
    monkeypatch.setenv("SCALE_BENCH_LEVELS", levels)
    monkeypatch.setenv("SCALE_BENCH_REPS", str(reps))
    spec = importlib.util.spec_from_file_location(
        "scale_bench_under_test", os.path.join(REPO, "scale_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # point every artifact path at the temp root
    mod.ROOT = str(tmp_path)
    return mod


def _run(cpus, wall, warm_wall, docs=1000):
    return {
        "cpus": cpus,
        "wall_sec": wall,
        "warm_wall_sec": warm_wall,
        "docs": docs,
        "edges": 7,
        "clusters": 3,
        "docs_per_sec": round(docs / wall, 1),
        "warm_docs_per_sec": round(docs / warm_wall, 1),
        "cpu_sec": 1.0,
        "cpu_util": 0.5,
        "steal_pct": 0.1,
    }


def test_report_from_log_roundtrip(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    bench = tmp_path / "BENCH"
    bench.mkdir()
    # perfect 2x scaling at each doubling -> every efficiency 1.0; the log
    # also carries entries the filter must SKIP: a legacy cold-only run
    # (no warm_wall_sec), a different-size run, and an unknown level
    runs = [
        _run(8, 100.0, 80.0),
        _run(16, 50.0, 40.0),
        _run(32, 25.0, 20.0),
        _run(8, 100.0, 80.0),
        _run(16, 50.0, 40.0),
        _run(32, 25.0, 20.0),
    ]
    skipped = [
        {k: v for k, v in _run(8, 1.0, 1.0).items() if k != "warm_wall_sec"},
        _run(8, 1.0, 1.0, docs=999),
        _run(4, 1.0, 1.0),
    ]
    with open(bench / "scale_runs.jsonl", "w") as f:
        for r in runs + skipped:
            f.write(json.dumps(r) + "\n")
    with open(bench / "kernel_scaling_1000.json", "w") as f:
        json.dump(
            {"n_docs": 1000, "efficiency_8_to_32": 0.5,
             "efficiency_8_to_32_warm": 0.8},
            f,
        )

    parsed = mod._runs_from_log()
    assert {c: len(v) for c, v in parsed.items()} == {8: 2, 16: 2, 32: 2}
    mod._write_report(parsed)

    text = (bench / "BASELINE.md").read_text()
    # perfect scaling: cold and warm 8->32 efficiency 1.0
    assert "cold = 1.0, warm (steady-state) =\n1.0" in text
    # anchor normalization: cold 1.0/0.5, warm 1.0/0.8
    assert "cold = 2.0, warm =\n1.25" in text
    assert "cold 0.5, warm 0.8 at 1,000 docs" in text
    # the skipped entries never reach the tables
    assert "999" not in text and "local[4]" not in text


def test_report_missing_level_fails_loudly(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    bench = tmp_path / "BENCH"
    bench.mkdir()
    with open(bench / "scale_runs.jsonl", "w") as f:
        f.write(json.dumps(_run(8, 100.0, 80.0)) + "\n")
    with pytest.raises(SystemExit, match=r"levels \[16, 32\]"):
        mod._runs_from_log()


def test_report_handles_uneven_rep_counts(tmp_path, monkeypatch):
    mod = _load(tmp_path, monkeypatch)
    bench = tmp_path / "BENCH"
    bench.mkdir()
    runs = [
        _run(8, 100.0, 80.0),
        _run(8, 200.0, 90.0),
        _run(8, 300.0, 100.0),
        _run(16, 50.0, 40.0),
        _run(16, 60.0, 50.0),
        _run(32, 25.0, 20.0),
    ]
    with open(bench / "scale_runs.jsonl", "w") as f:
        for r in runs:
            f.write(json.dumps(r) + "\n")
    mod._write_report(mod._runs_from_log())
    text = (bench / "BASELINE.md").read_text()
    # medians: 8 -> 200 (odd count), 16 -> 55 (midpoint), 32 -> 25
    assert "| local[8] | 200.0 |" in text
    assert "| local[16] | 55.0 |" in text
    assert "MEDIANS of 1-3 runs per level" in text
    # no kernel anchor artifact at this size: report says so, no crash
    assert "no kernel_scaling artifact found" in text
