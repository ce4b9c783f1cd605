"""spark-submit entrypoint (north_rule deployment contract).

Usage:
    spark-submit --py-files askg_spark.zip askg_spark/cli.py build \
        --servers 1000 --out /tmp/askg_out [--force]
    spark-submit ... cli.py bench --servers 20000 --out /tmp/askg_bench

`build` runs the full materialized pipeline (resumable); `bench` runs
it in-memory and prints one JSON line with throughput.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="askg-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("build", "bench"):
        p = sub.add_parser(name)
        p.add_argument("--servers", type=int, default=1000,
                       help="synthetic corpus size (logical servers)")
        p.add_argument("--seed", type=int, default=42)
        p.add_argument("--pages", type=str, default=None,
                       help="read pages parquet from this path instead of "
                            "generating a synthetic corpus")
        p.add_argument("--out", type=str, default=None)
        p.add_argument("--force", action="store_true")
        p.add_argument("--max-per-key", type=int, default=None,
                       help="relation skew cap (top-M entities per hot "
                            "key); 0 = uncapped all-pairs; default = "
                            "PipelineConfig default (1000)")
        p.add_argument("--include-hierarchy", action="store_true",
                       help="append the static HAS_SUBCATEGORY ontology "
                            "edges to the triple set (default off — "
                            "reference parity)")
    args = ap.parse_args(argv)

    from askg_spark.fixtures import count_pages, generate_pages
    from askg_spark.pipeline import (PipelineConfig, run_pipeline,
                                     run_pipeline_materialized)
    from askg_spark.session import get_spark

    spark = get_spark("askg-" + args.cmd, master=None)
    spark.sparkContext.setLogLevel("WARN")
    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = generate_pages(spark, n_servers=args.servers, seed=args.seed)
    if args.max_per_key is None:
        cfg = PipelineConfig()  # config default cap
    else:
        cfg = PipelineConfig(max_entities_per_key=args.max_per_key or None)
    cfg.include_hierarchy = args.include_hierarchy

    # input-corpus metadata, not pipeline work: count before the timer
    # (for synthetic corpora via profile arithmetic — counting the
    # rendered frame would re-run the HTML renderer, 792 core-s @ 200k)
    n_pages = (pages.count() if args.pages
               else count_pages(spark, args.servers, args.seed))

    t0 = time.monotonic()
    if args.cmd == "build":
        if not args.out:
            ap.error("build requires --out")
        out = run_pipeline_materialized(
            spark, pages, args.out, cfg, force=args.force)
        n_triples = out["triples"].count()
        wall = time.monotonic() - t0
        print(json.dumps({
            "cmd": "build", "skipped": out["skipped"],
            "triples": n_triples, "sec": round(wall, 2),
            "triples_per_sec": round(n_triples / wall, 1),
            "out": args.out,
        }))
    else:
        res = run_pipeline(spark, pages, cfg)
        # the relations/triples stage timers cover lazy plan
        # construction only; this count is the real materialization
        n_triples = res.timer.time("materialize", res.triples.count)
        wall = time.monotonic() - t0
        print(json.dumps({
            "cmd": "bench", "pages": n_pages, "triples": n_triples,
            "sec": round(wall, 2),
            "pages_per_sec": round(n_pages / wall, 1),
            "triples_per_sec": round(n_triples / wall, 1),
            "stage_sec": res.timer.records,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
