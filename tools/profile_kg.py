"""Phase-timed run of the driver-contract kg_triples path at a given
sf dir — the same work bench.py's kg_triples row measures, split by
pipeline stage plus the triples count action.

Usage: python tools/profile_kg.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from askg_spark.session import get_spark
    from askg_spark.pipeline import PipelineConfig, run_pipeline
    from askg_spark.webcorpus import render_pages

    spark = get_spark("askg-profile")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    pages = render_pages(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    res = run_pipeline(spark, pages, PipelineConfig())
    t1 = time.monotonic()
    n = res.triples.count()
    t2 = time.monotonic()
    out = {r["stage"]: r["sec"] for r in res.timer.records}
    out["count_triples"] = round(t2 - t1, 2)
    out["total"] = round(t2 - t0, 2)
    out["n_triples"] = n
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
