"""Host-health probe sanity (sparkdedup.hosthealth) + bench pass-validity
thresholds (bench.py) — the measurement-integrity layer is code too."""

import os
import time


def test_box_cpu_monotone_and_shaped():
    from sparkdedup.hosthealth import box_cpu

    b0, s0, t0 = box_cpu()
    # burn a little CPU so busy strictly advances
    x = 0
    deadline = time.time() + 0.3
    while time.time() < deadline:
        x += 1
    b1, s1, t1 = box_cpu()
    assert t1 > t0 and b1 >= b0 and s1 >= s0
    assert b1 - b0 <= (t1 - t0) + 1e-6


def test_tree_cpu_counts_self_and_child():
    import subprocess

    from sparkdedup.hosthealth import tree_cpu

    c0 = tree_cpu()
    # a live child burning CPU must be attributed to our tree
    proc = subprocess.Popen(
        ["python", "-c", "import time;e=time.time()+1.0\nwhile time.time()<e: pass"]
    )
    time.sleep(0.8)
    c1 = tree_cpu()
    proc.wait()
    assert c1 > c0 + 0.3  # child's busy time visible while it lives


def test_bench_pass_invalid_thresholds(monkeypatch):
    import bench

    host = os.cpu_count() or 1
    ok = {"steal_pct": 0.5, "other_cores": 0.0}
    assert bench._pass_invalid(ok) is None
    assert "steal_pct" in bench._pass_invalid({"steal_pct": 3.5, "other_cores": 0.0})
    assert "host load" in bench._pass_invalid(
        {"steal_pct": 0.0, "other_cores": host / 4 + 0.5}
    )
