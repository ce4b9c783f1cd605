"""Structured Streaming incremental ingest (C1/C2 semantics) and the
deterministic search fallback (§3.3 parity)."""
from __future__ import annotations

from askg_spark.fixtures import generate_pages
from askg_spark.search import search_entities
from askg_spark.streaming import incremental_extract


def test_incremental_extract_processes_each_file_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")

    generate_pages(spark, n_servers=6, seed=1).write.mode("append") \
        .parquet(pages_dir)
    n1 = incremental_extract(spark, pages_dir, out_dir, ckpt)
    assert n1 > 0

    # no new input -> checkpoint suppresses reprocessing
    n2 = incremental_extract(spark, pages_dir, out_dir, ckpt)
    assert n2 == 0

    # new files -> only the delta is processed
    generate_pages(spark, n_servers=12, seed=2).write.mode("append") \
        .parquet(pages_dir)
    n3 = incremental_extract(spark, pages_dir, out_dir, ckpt)
    assert n3 > 0
    total = spark.read.parquet(out_dir).count()
    assert total == n1 + n3
    # no duplicate mention ids across increments beyond genuine repeats
    assert spark.read.parquet(out_dir).select("url").distinct().count() > 0


def test_search_entities_scoring_and_ranking(spark):
    rows = [
        ("a1", "postgres-kit", "a database connector", 100),
        ("a2", "filer", "database tools inside", None),
        ("a3", "other", "nothing relevant", 5000),
        ("a4", "database-hub", "the database of databases", 50),
    ]
    ents = spark.createDataFrame(
        rows, "id string, name string, description string, popularity_score long")
    got = search_entities(ents, "database", limit=3).collect()
    # name+desc hit (18.x) beats desc-only (8.x); popularity breaks ties
    assert [r["id"] for r in got] == ["a4", "a1", "a2"]
    assert got[0]["score"] == 18.05
    assert got[1]["score"] == 8.1  # desc hit + 100*0.001
