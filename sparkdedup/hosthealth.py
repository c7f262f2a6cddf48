"""Shared /proc-based host-health probes used by the measurement
harnesses (bench.py, scale_bench.py) so the three /proc parsers can't
drift apart (round-4 review finding).

These exist because the sandbox is a shared VM whose run-to-run wall
variance (up to 4x) comes from host contention and first-touch page
faults; every benchmark records these signals in-band so a contaminated
measurement is identifiable instead of masquerading as a regression."""

from __future__ import annotations

import os

_HZ = float(os.sysconf("SC_CLK_TCK"))


def box_cpu() -> tuple[float, float, float]:
    """(busy_sec, steal_sec, total_sec) across all cores from /proc/stat."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = (vals[3] + vals[4]) / _HZ  # idle + iowait
    steal = (vals[7] if len(vals) > 7 else 0) / _HZ
    total = sum(vals) / _HZ
    return total - idle, steal, total


def tree_cpu(root_pid: int | None = None) -> float:
    """CPU seconds consumed so far by ``root_pid`` (default: this
    process) and every LIVE descendant (python driver, py4j-launched
    JVM, pyspark worker daemons), via one /proc walk.  Children that
    exited mid-window are missed until reaped — acceptable for
    benchmarking because the JVM and worker daemons persist for the
    whole run; the result is a LOWER bound on "our" CPU, i.e. an upper
    bound on other-process CPU."""
    me = root_pid if root_pid is not None else os.getpid()
    ppid_of: dict[int, int] = {}
    cpu_of: dict[int, float] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                st = f.read()
        except OSError:
            continue
        # fields after the parenthesized comm (which may contain spaces)
        rest = st.rsplit(")", 1)[1].split()
        pid = int(pid_s)
        ppid_of[pid] = int(rest[1])
        cpu_of[pid] = (int(rest[11]) + int(rest[12])) / _HZ  # utime+stime
    total = 0.0
    for pid in cpu_of:
        p = pid
        for _ in range(64):  # ancestor chain
            if p == me:
                total += cpu_of[pid]
                break
            p = ppid_of.get(p, 0)
            if p <= 1:
                break
    return total
