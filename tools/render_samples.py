"""Render a quiet_sampler JSONL into the scaling report + BENCH.md table.

Usage:
    python tools/render_samples.py .scaling_r2b_1600k_pin.jsonl \
        [--bench-md BENCH.md] [--servers 1600000]

Builds the same report dict `tools/scaling.py` emits (min-of-samples
headline, medians alongside, per-sample steal/load disclosure) from the
gated sampler's append-only records, prints it as one JSON line, and
optionally patches the BENCH.md SCALING block.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from scaling import patch_bench_md  # noqa: E402


def build_report(records: list[dict], servers: int | None) -> dict:
    levels = sorted({r["cores"] for r in records})
    if len(levels) != 2 or levels[1] != 4 * levels[0]:
        print(f"warning: levels {levels} are not N/4N", file=sys.stderr)
    runs = {lv: [r for r in records if r["cores"] == lv] for lv in levels}
    med = {lv: statistics.median(r["sec"] for r in runs[lv]) for lv in levels}
    best = {lv: min(r["sec"] for r in runs[lv]) for lv in levels}
    thr = {lv: statistics.median(r["pages_per_sec"] for r in runs[lv])
           for lv in levels}
    fastest = {lv: min(runs[lv], key=lambda r: r["sec"]) for lv in levels}
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round((best[levels[0]] / best[levels[1]]) / 4.0, 3),
        "value_estimator": "min-of-samples (shared-box noise is additive)",
        "value_median": round((med[levels[0]] / med[levels[1]]) / 4.0, 3),
        "unit": "fraction (1.0 = linear)",
        "servers": servers or records[0].get("pages"),
        "input": "pre-materialized page parquet",
        "pinned_cores": True,
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--bench-md", default=None)
    ap.add_argument("--servers", type=int, default=None)
    args = ap.parse_args()
    with open(args.jsonl) as fh:
        records = [json.loads(ln) for ln in fh if ln.strip()]
    report = build_report(records, args.servers)
    print(json.dumps(report))
    if args.bench_md:
        patch_bench_md(args.bench_md, report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
