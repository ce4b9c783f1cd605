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


def test_changed_pages_stateful_freshness_gate(spark, tmp_path):
    """applyInPandasWithState freshness cache: per-url state suppresses
    byte-identical re-crawls across SEPARATE AvailableNow invocations
    (state survives via the checkpoint), passes changed/new urls."""
    import datetime as dt

    from askg_spark.streaming import changed_pages_extract

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "changed")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2025, 6, 1)

    def page(url, ts_off, body):
        return (url, t0 + dt.timedelta(seconds=ts_off),
                body.encode(), body, "en")

    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    spark.createDataFrame(
        [page("u1", 0, "<html>a</html>"), page("u2", 1, "<html>b</html>")],
        schema).write.mode("append").parquet(pages_dir)
    n1 = changed_pages_extract(spark, pages_dir, out_dir, ckpt)
    assert n1 == 2  # both urls brand-new

    # u1 re-crawled byte-identical (suppressed by state), u2 changed,
    # u3 new; plus an in-batch flip for u3 (two rows, both emitted)
    spark.createDataFrame(
        [page("u1", 100, "<html>a</html>"),
         page("u2", 101, "<html>B2</html>"),
         page("u3", 102, "<html>c</html>"),
         page("u3", 103, "<html>c2</html>")],
        schema).write.mode("append").parquet(pages_dir)
    n2 = changed_pages_extract(spark, pages_dir, out_dir, ckpt)
    assert n2 == 3  # u2 change + u3 twice; u1 suppressed

    got = spark.read.parquet(out_dir)
    assert got.count() == 5
    assert got.filter("url = 'u1'").count() == 1

    # third run, no new files: checkpoint drains nothing
    assert changed_pages_extract(spark, pages_dir, out_dir, ckpt) == 0
