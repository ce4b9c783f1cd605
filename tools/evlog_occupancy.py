"""Attribute wall-clock to core occupancy from a Spark event log.

For every second of the application, counts how many task-cores were
busy. Wall where occupancy ~0 is pure driver/serial time (planning,
codegen, broadcast builds, Python worker spin-up, collect barriers) —
the component that caps N->4N scaling efficiency (Amdahl). Prints the
occupancy histogram plus the longest idle intervals with the job/SQL
execution active at that moment, so the serial cost can be attributed
to a pipeline phase.

Usage: python tools/evlog_occupancy.py <eventlog[.zstd]> [--cores 8]
"""

from __future__ import annotations

import argparse
import io
import json
import subprocess


def _open(path: str):
    if path.endswith((".zstd", ".zst")):
        proc = subprocess.Popen(["zstd", "-dc", path],
                                stdout=subprocess.PIPE)
        return io.TextIOWrapper(proc.stdout, errors="replace")
    return open(path, errors="replace")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    tasks: list[tuple[int, int]] = []      # (launch_ms, finish_ms)
    jobs: list[tuple[int, int, int, str]] = []  # (start, end, id, desc)
    app_start = app_end = None
    job_open: dict[int, tuple[int, str]] = {}
    with _open(args.log) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif t == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif t == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                lt, ft = ti.get("Launch Time"), ti.get("Finish Time")
                if lt and ft and ft > lt:
                    tasks.append((lt, ft))
            elif t == "SparkListenerJobStart":
                props = ev.get("Properties", {}) or {}
                desc = (props.get("spark.job.description")
                        or props.get("callSite.short", ""))[:60]
                job_open[ev["Job ID"]] = (ev["Submission Time"], desc)
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_open:
                    st, desc = job_open.pop(jid)
                    jobs.append((st, ev["Completion Time"], jid, desc))
    if app_start is None:
        print("no ApplicationStart event")
        return 1
    app_end = app_end or max((f for _, f in tasks), default=app_start)
    n_sec = int((app_end - app_start) / 1000) + 1
    busy = [0.0] * n_sec
    for lt, ft in tasks:
        a = (lt - app_start) / 1000
        b = (ft - app_start) / 1000
        for s in range(int(a), min(int(b) + 1, n_sec)):
            busy[s] += max(0.0, min(b, s + 1) - max(a, s))

    total = len(busy)
    idle = sum(1 for b in busy if b < 0.5)
    low = sum(1 for b in busy if 0.5 <= b < 1.5)
    half = sum(1 for b in busy if 1.5 <= b < args.cores / 2)
    full = total - idle - low - half
    print(f"wall={total}s  idle(<0.5 cores)={idle}s  ~1core={low}s  "
          f"under-half={half}s  busy={full}s")
    print(f"core-seconds used={sum(busy):.0f} of {total * args.cores} "
          f"({100 * sum(busy) / (total * args.cores):.0f}% occupancy)")

    # longest idle/low intervals with the active job at that time
    intervals = []
    s = 0
    while s < total:
        if busy[s] < 1.5:
            e = s
            while e < total and busy[e] < 1.5:
                e += 1
            intervals.append((e - s, s, e))
            s = e
        else:
            s += 1
    intervals.sort(reverse=True)
    print(f"\nlongest <1.5-core intervals (top {args.top}):")
    for dur, s, e in intervals[:args.top]:
        mid = app_start + (s + e) / 2 * 1000
        active = [f"j{jid}:{d}" for st, en, jid, d in jobs
                  if st <= mid <= en]
        gap = "" if active else " [NO JOB RUNNING — driver/planning]"
        print(f"  {s:>5}s +{dur:>4}s  {'; '.join(active) or '-'}{gap}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
