"""North-rule scaling evidence harness: same job, two parallelism levels.

The rule's two-cluster-size criterion (throughput scaling efficiency
>= 0.8 from N to 4N executors) cannot use a real cluster in this
sandbox, so this runs the identical spark-submit bench at local[N] and
local[4N] on the same synthetic corpus and reports throughput at both
plus efficiency = (T_N / T_4N) / 4.

Usage:
    python tools/scaling.py --servers 40000 --n 8 --samples 3 \
        [--max-per-key 1000] [--out /tmp/scaling.json]

Runs are interleaved (N, 4N, N, 4N, ...) so slow drift in co-tenant
load hits both levels equally; the report carries per-sample wall
times and the 1-minute load average before/after each run so variance
is auditable. Two estimators are reported: MEDIAN per level, and MIN
per level. On a machine shared with invisible co-tenants the
interference is strictly additive, so the minimum over repeated
identical runs is the standard estimator of intrinsic runtime; the
headline efficiency uses the min, with the median carried alongside.
(Measured on this box 2026-08-17: the same 200k-server bench at
local[8] ranged 248s..741s purely with co-tenant load.)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_pkg() -> str:
    path = os.path.join(tempfile.gettempdir(), "askg_spark_scaling.zip")
    with zipfile.ZipFile(path, "w") as zf:
        pkg = os.path.join(REPO, "askg_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def _load_avg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _steal_ticks() -> int:
    """Cumulative hypervisor steal ticks (all vCPUs). This box is a VM
    whose host is shared: steal reached ~25% of user time historically,
    and steal inflates every nanoTime-based duration in both the bench
    and Spark's own task metrics. Recording the per-sample delta makes
    co-tenant interference auditable per run, not just per level."""
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def _materialize_pages(servers: int, zip_path: str, timeout: int) -> str:
    """Render the synthetic corpus ONCE to parquet (tmpfs) and return
    the path. The scaling samples then run the pipeline over a real
    input table (`bench --pages`), which is the north-rule shape — an
    Iceberg-style table of (url, warc_ts, html, text, lang) — and keeps
    one-time corpus *generation* (Python HTML rendering) out of every
    measured sample."""
    out = f"/dev/shm/askg-scaling-pages-{servers}"
    if os.path.isdir(out):
        return out
    script = "/dev/shm/askg-scaling-gen.py"
    with open(script, "w") as fh:
        fh.write(
            "from askg_spark.session import get_spark\n"
            "from askg_spark.fixtures import generate_pages\n"
            "spark = get_spark('scaling-gen')\n"
            f"generate_pages(spark, n_servers={servers}, seed=42)"
            f".write.mode('overwrite').parquet({out!r})\n")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[16]", "--driver-memory",
         os.environ.get("ASKG_DRIVER_MEM", "48g"), "--py-files", zip_path,
         script],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    if not os.path.isdir(out):
        raise RuntimeError("page materialization failed:\n"
                           + proc.stderr[-2000:])
    return out


def _run(cores: int, servers: int, zip_path: str,
         max_per_key: int | None, timeout: int,
         pages: str | None = None, pin: bool = False) -> dict:
    cmd = []
    if pin:
        # Bound the ENTIRE process tree (JVM + shuffle/GC threads +
        # Python workers) to exactly `cores` physical cores. Unpinned
        # local[N] undercounts the resources a level really uses: a
        # mapInPandas task keeps ~2 threads runnable (JVM Arrow writer
        # + Python worker), so unpinned local[2] consumes ~4-6 cores of
        # machine — the levels are not 4x apart and measured efficiency
        # is biased DOWN. A real N->4N executor comparison holds
        # cores-per-executor fixed; taskset is the single-box
        # equivalent (cores ratio exactly 4).
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("ASKG_DRIVER_MEM", "48g"),
        "--py-files", zip_path,
        os.path.join(REPO, "askg_spark", "cli.py"),
        "bench", "--servers", str(servers),
    ]
    if pages:
        cmd += ["--pages", pages]
    if max_per_key is not None:
        cmd += ["--max-per-key", str(max_per_key)]
    load = _load_avg()
    steal0 = _steal_ticks()
    t0 = time.monotonic()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, cwd=REPO)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(
            f"bench produced no JSON (rc={proc.returncode}):\n"
            + proc.stderr[-8000:])
    rec = json.loads(line[-1])
    wall = time.monotonic() - t0
    # steal% of one core over the sample window (ticks are 10ms)
    steal_pct = 100 * (_steal_ticks() - steal0) * 0.01 / wall
    rec.update(cores=cores, load_before=load, load_after=_load_avg(),
               steal_corepct=round(steal_pct, 1),
               harness_wall=round(wall, 1))
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--servers", type=int, default=40000)
    ap.add_argument("--n", type=int, default=8, help="small level N")
    ap.add_argument("--samples", type=int, default=3, help="per level")
    ap.add_argument("--max-per-key", type=int, default=None,
                    help="forwarded to cli.py bench (default: pipeline "
                         "default cap)")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--bench-md", type=str, default=None,
                    help="patch this BENCH.md's SCALING block with the "
                         "rendered table")
    ap.add_argument("--no-materialize", action="store_true",
                    help="fuse synthetic generation into the measured "
                         "run instead of pre-rendering the page table")
    ap.add_argument("--pin", action="store_true",
                    help="taskset the whole job tree to exactly "
                         "`cores` CPUs per level (cluster-faithful "
                         "N vs 4N: resource ratio exactly 4)")
    args = ap.parse_args()

    zip_path = _zip_pkg()
    pages = (None if args.no_materialize
             else _materialize_pages(args.servers, zip_path, args.timeout))
    levels = [args.n, 4 * args.n]
    runs: dict[int, list[dict]] = {lv: [] for lv in levels}
    for s in range(args.samples):
        for lv in levels:                      # interleaved
            rec = _run(lv, args.servers, zip_path, args.max_per_key,
                       args.timeout, pages=pages, pin=args.pin)
            runs[lv].append(rec)
            print(f"sample {s} local[{lv}]: {rec['sec']}s "
                  f"({rec['pages_per_sec']} pages/s, load "
                  f"{rec['load_before']}, steal {rec['steal_corepct']}% "
                  "of a core)", file=sys.stderr, flush=True)

    med = {lv: statistics.median(r["sec"] for r in runs[lv])
           for lv in levels}
    best = {lv: min(r["sec"] for r in runs[lv]) for lv in levels}
    thr = {lv: statistics.median(r["pages_per_sec"] for r in runs[lv])
           for lv in levels}
    eff_med = (med[levels[0]] / med[levels[1]]) / 4.0
    eff_min = (best[levels[0]] / best[levels[1]]) / 4.0
    # stage breakdown of the *fastest* run per level: least polluted
    fastest = {lv: min(runs[lv], key=lambda r: r["sec"]) for lv in levels}
    report = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff_min, 3),
        "value_estimator": "min-of-samples (shared-box noise is additive)",
        "value_median": round(eff_med, 3),
        "unit": "fraction (1.0 = linear)",
        "servers": args.servers,
        "input": ("pre-materialized page parquet" if pages
                  else "fused synthetic generation"),
        "pinned_cores": bool(args.pin),
        "levels": {str(lv): {
            "min_sec": best[lv],
            "median_sec": med[lv],
            "median_pages_per_sec": thr[lv],
            "samples_sec": [r["sec"] for r in runs[lv]],
            "steal_corepct": [r["steal_corepct"] for r in runs[lv]],
            "load_before": [r["load_before"] for r in runs[lv]],
            "load_after": [r.get("load_after") for r in runs[lv]],
        } for lv in levels},
        "stage_sec_fastest": {str(lv): fastest[lv].get("stage_sec")
                              for lv in levels},
    }
    out = json.dumps(report)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    if args.bench_md:
        patch_bench_md(args.bench_md, report)
    return 0


def render_md(report: dict) -> str:
    """Markdown table for the BENCH.md SCALING block."""
    lvls = sorted(report["levels"], key=int)
    lines = [
        f"{report['servers']}-server corpus, input = "
        f"{report.get('input', 'fused synthetic generation')}; "
        "interleaved samples, per-sample 1-min load "
        "and hypervisor-steal recorded.",
        "",
        "| level | samples (s) | min s | median s | median pages/s "
        "| steal %core |",
        "|---|---|---|---|---|---|",
    ]
    for lv in lvls:
        d = report["levels"][lv]
        samples = ", ".join(f"{s:.0f}" for s in d["samples_sec"])
        steals = ", ".join(str(s) for s in d.get("steal_corepct", []))
        lines.append(
            f"| local[{lv}] | {samples} | {d['min_sec']:.1f} | "
            f"{d['median_sec']:.1f} | {d['median_pages_per_sec']} | "
            f"{steals} |")
    lines += [
        "",
        f"**Efficiency N→4N (min-of-samples): "
        f"{report['value']}** (median-of-samples: "
        f"{report['value_median']}). Estimator rationale in "
        "`tools/scaling.py` docstring; raw JSON in the committed "
        "`.scaling_r2*.json` files.",
    ]
    return "\n".join(lines)


def patch_bench_md(path: str, report: dict) -> None:
    begin, end = "<!-- SCALING:BEGIN -->", "<!-- SCALING:END -->"
    with open(path) as fh:
        text = fh.read()
    i, j = text.index(begin) + len(begin), text.index(end)
    with open(path, "w") as fh:
        fh.write(text[:i] + "\n" + render_md(report) + "\n" + text[j:])


if __name__ == "__main__":
    sys.exit(main())
