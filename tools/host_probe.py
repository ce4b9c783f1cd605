"""Spark-independent host 2->8 capacity probe.

Measures the box's OWN ability to express 4x parallel capacity on
pure pinned numpy int64 streams (fresh process per stream, identical
work per stream): runs K concurrent streams for K in {2, 8}, each
taskset to its own core, and reports

    capacity = (wall_2 / wall_8) * (8 / 2)   (ideal 4.0 -> prints 4.0)

A reading well under 4.0 means the host cannot currently express 4x
more aggregate memory throughput at 8 pinned streams than at 2 — the
straight-pinned Spark pair measured in that window inherits the same
ceiling regardless of plan quality (BENCH.md section 1h uses this to
attribute the clean-pair spread). Usage:

    python tools/host_probe.py [--reps 3]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

STREAM = r"""
import numpy as np, time
a = np.arange(40_000_000, dtype=np.int64)
t0 = time.monotonic()
for _ in range(12):
    a = (a * 1103515245 + 12345) & 0x7FFFFFFF
print(time.monotonic() - t0)
"""


def run_level(k: int) -> float:
    procs = []
    t0 = time.monotonic()
    for i in range(k):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", STREAM],
            stdout=subprocess.PIPE, text=True))
    for p in procs:
        p.wait()
    return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    for _ in range(args.reps):
        w2 = run_level(2)
        w8 = run_level(8)
        # ideal host: 8 pinned streams run as fast as 2 (w8 == w2)
        print(f"wall2={w2:.2f}s wall8={w8:.2f}s "
              f"capacity={4 * w2 / w8:.2f} of ideal 4.0")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
