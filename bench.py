"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

  {"metric": "headline_suite", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, ...extras}

Extras carry throughput (docs/sec into the KG pipeline, triples/sec
out) and the LSH-ANN recall vs the exact top-k — the numbers
BENCH.md's scaling table is built from.
"""
from __future__ import annotations

import json
import os
import sys
import time


def _steal_ticks() -> int:
    """Cumulative hypervisor-steal jiffies across all vCPUs. The
    sandbox is a shared VM whose identical runs vary up to 2x with
    co-tenant load (BENCH.md measurement protocol); recording the
    per-run steal delta + load makes each recorded sample auditable."""
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from askg_spark.session import get_spark

    spark = get_spark("askg-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name: str, action=None):
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        out = df.count() if action is None else action(df)
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # UNTIMED session warmup (disclosed in BENCH.md §movers-r5): a
    # 200-doc pipeline pass spins up the Arrow python-worker pool
    # (32 workers importing pandas/numpy) and compiles the hot
    # whole-stage-codegen paths. Measured at sf0.1: the first
    # pipeline run in a session costs ~22s, every later one ~11.5s
    # with identical work — the ~10.9s delta is one-time JVM/worker
    # startup, and without this pass it all lands on whichever query
    # runs first (kg_triples), misattributing session setup as query
    # cost. Per-query rows below are steady-state.
    from askg_spark.pipeline import PipelineConfig, run_pipeline
    from askg_spark.webcorpus import render_pages
    warm_res = run_pipeline(
        spark,
        render_pages(
            spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)),
        PipelineConfig())
    warm_res.triples.count()

    t_all = time.monotonic()
    steal0 = _steal_ticks()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_triples = run("kg_triples")
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = n_triples
    extras["kg_docs_per_sec"] = round(n_docs / timings["kg_triples"], 1)
    extras["kg_triples_per_sec"] = round(n_triples / timings["kg_triples"], 1)

    run("dedup_exact_groups")
    run("dedup_substring_spans")
    run("dedup_incremental")
    run("corpus_domain_stats")
    run("events_anomaly_hours")
    run("doc_top_terms")
    run("corpus_collocations")
    run("stream_windowed_mentions")
    run("doc_chunks")
    run("web_anchor_texts")
    run("doc_lm_perplexity")
    run("part_cooccur_kcore")
    run("dedup_ngram_pairs")
    run("dedup_minhash_pairs")
    run("dedup_simhash_pairs")
    run("dedup_embedding_pairs")

    t0 = time.monotonic()
    exact = {(r["query_id"], r["neighbor_id"])
             for r in qs["ann_topk"](spark, sf_dir).collect()}
    timings["ann_topk"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    approx = {(r["query_id"], r["neighbor_id"])
              for r in qs["ann_lsh_topk"](spark, sf_dir).collect()}
    timings["ann_lsh_topk"] = round(time.monotonic() - t0, 3)
    extras["ann_lsh_recall"] = round(
        len(exact & approx) / len(exact), 4) if exact else 1.0
    t0 = time.monotonic()
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in qs["ann_ivf_topk"](spark, sf_dir).collect()}
    timings["ann_ivf_topk"] = round(time.monotonic() - t0, 3)
    extras["ann_ivf_recall"] = round(
        len(exact & ivf) / len(exact), 4) if exact else 1.0

    run("kg_negative_samples")
    run("kg_random_walks")
    run("kg_similar_servers")
    run("kg_triples_diff")
    run("kg_degree_topk", lambda df: len(df.collect()))
    run("kg_two_hop", lambda df: len(df.collect()))
    run("ann_recall_report", lambda df: len(df.collect()))
    run("kg_semantic_search")
    run("kg_category_hierarchy")
    run("kg_clean_cypher")
    run("multimodal_decode_stats")
    run("multimodal_resize_stats")
    run("multimodal_frame_stats")
    run("multimodal_bmp_stats")
    run("multimodal_audio_stats")
    run("multimodal_gif_stats")
    run("multimodal_jpeg_stats")
    run("multimodal_quarantine_stats")
    run("warc_roundtrip")
    run("kg_ntriples_export")
    run("web_robots_filter")
    run("catalog_pruned_scan")
    run("graph_bfs_depths")
    run("corpus_bpe_merges")
    run("corpus_bpe_encode")
    run("web_surt_keys")
    run("web_cdx_index")
    run("web_fetch_schedule")
    run("events_quantile_sketch")
    run("doc_dsir_scores")
    run("part_cooccur_triangles")
    run("events_distinct_sketch")
    run("doc_eval_holdout")
    run("web_canonical_urls")
    run("registry_completeness")
    run("doc_token_stats")
    run("doc_lang_id")
    run("doc_repetition_stats")
    run("doc_pii_scan")
    run("doc_quality_report", lambda df: len(df.collect()))
    run("doc_sample_mixture")
    run("doc_line_dedup")
    run("corpus_token_vocab", lambda df: len(df.collect()))
    run("doc_normalize_text")
    run("doc_oov_rate")
    run("doc_pack_assignments")
    run("doc_length_quantiles", lambda df: len(df.collect()))
    run("doc_contamination")
    run("emb_label_centroids")
    run("web_owner_indegree")
    run("web_pagerank_topk", lambda df: len(df.collect()))
    run("web_pagerank_quantized", lambda df: len(df.collect()))
    run("events_latest_per_user")
    run("events_asof_join")
    run("events_sessions")
    run("events_funnel", lambda df: len(df.collect()))
    run("events_rolling_weekly")
    run("events_type_pivot")
    run("events_cohort_retention", lambda df: len(df.collect()))
    run("events_hourly_counts")
    run("top_customers_by_revenue", lambda df: len(df.collect()))
    run("lineitem_pricing_summary", lambda df: len(df.collect()))
    run("nation_lineitem_volume", lambda df: len(df.collect()))

    total = round(time.monotonic() - t_all, 2)
    # steal as % of ONE core over the suite window (jiffy = 10 ms)
    extras["steal_corepct"] = round(
        100 * (_steal_ticks() - steal0) * 0.01 / max(total, 1e-9), 1)
    print(json.dumps({
        "metric": "headline_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        **extras,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
