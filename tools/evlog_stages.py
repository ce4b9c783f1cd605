"""Summarize a Spark event log: per-stage wall, task count, total task
time, max-task share (serialization bottleneck detector).

Usage: python tools/evlog_stages.py /tmp/evl8/<app-id>[.zstd] [--top 30]
"""

from __future__ import annotations

import json
import sys


def _open(path: str):
    if path.endswith(".zstd") or path.endswith(".zst"):
        try:
            import zstandard

            return zstandard.ZstdDecompressor().stream_reader(
                open(path, "rb"))
        except ImportError:
            import io
            import subprocess

            proc = subprocess.Popen(["zstd", "-dc", path],
                                    stdout=subprocess.PIPE)
            return proc.stdout
    return open(path, "rb")


def main() -> int:
    path = sys.argv[1]
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    import io

    stages: dict[tuple[int, int], dict] = {}
    with io.TextIOWrapper(_open(path), encoding="utf-8",
                          errors="replace") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                st = stages.setdefault(key, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0})
                st["name"] = si["Stage Name"].split("\n")[0][:80]
                st["n_tasks"] = si["Number of Tasks"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                st["wall_ms"] = (comp - sub) if sub and comp else 0
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                st = stages.setdefault(key, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0})
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["tasks"] += 1
                st["task_ms"] += max(dur, 0)
                st["max_task_ms"] = max(st["max_task_ms"], dur)

    rows = sorted(stages.items(), key=lambda kv: -kv[1].get("wall_ms", 0))
    total_wall = sum(s.get("wall_ms", 0) for _, s in rows)
    total_task = sum(s.get("task_ms", 0) for _, s in rows)
    print(f"stages={len(rows)} sum_stage_wall={total_wall/1e3:.1f}s "
          f"sum_task_time={total_task/1e3:.1f}s")
    print(f"{'stage':>6} {'wall_s':>8} {'tasks':>6} {'task_s':>9} "
          f"{'max_t_s':>8} {'par_eff':>7}  name")
    for (sid, _), s in rows[:top]:
        wall = s.get("wall_ms", 0) / 1e3
        task = s.get("task_ms", 0) / 1e3
        mx = s.get("max_task_ms", 0) / 1e3
        # parallel efficiency proxy: total task time / (wall * n) is
        # meaningless without n cores; max-task/wall ~1 => serialized
        par = (mx / wall) if wall else 0
        print(f"{sid:>6} {wall:>8.1f} {s.get('tasks', 0):>6} {task:>9.1f} "
              f"{mx:>8.1f} {par:>7.2f}  {s.get('name', '?')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
