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


def test_windowed_counts_watermark_closes_windows_and_drops_late(
        spark, tmp_path):
    """Append-mode event-time windows with a 10-minute watermark across
    three checkpointed AvailableNow runs: a window is emitted only
    once its end falls behind the watermark, and a late row arriving
    after its window closed is DROPPED (no duplicate/updated row)."""
    from askg_spark.streaming import windowed_mention_counts
    from askg_spark.webcorpus import render_pages

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_pages(sec_offsets):
        # warc_ts = EPOCH + doc_id seconds (webcorpus), so the offset
        # IS the doc id: exact event-time control
        docs = spark.createDataFrame(
            [(int(s), f"body {s}", "en", "srcA", 10) for s in sec_offsets],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        render_pages(docs).write.mode("append").parquet(pages_dir)

    def run_once():
        q = (windowed_mention_counts(spark, pages_dir,
                                     watermark="10 minutes",
                                     window="1 hour")
             .writeStream.outputMode("append")
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    H = 3600
    # run 1: 10:05 and 12:30 -> watermark ends at 12:20; append emits
    # nothing yet (emission happens the batch AFTER the watermark moves)
    write_pages([10 * H + 300, 12 * H + 1800])
    run_once()
    # run 2: a LATE row at 10:20 (far below the 12:20 watermark ->
    # dropped) plus 13:45; the closed 10:00 window is emitted
    write_pages([10 * H + 1200, 13 * H + 2700])
    run_once()
    # run 3: 15:00 advances the watermark past 13:00, emitting the
    # 12:00 window
    write_pages([15 * H])
    run_once()

    out = spark.read.parquet(out_dir)
    rows = {(r["window"]["start"].hour, r["n_mentions"])
            for r in out.collect()}
    # windows whose end fell behind the final 14:50 watermark emitted
    # exactly once each (the trailing no-data micro-batch flushes
    # 13:00 too); the late 10:20 row did NOT bump or re-emit 10:00
    assert rows == {(10, 1), (12, 1), (13, 1)}, rows
    assert out.count() == 3, out.collect()


def test_watermark_boundary_tie_drops_late_row(spark, tmp_path):
    """Pins the evict-at-equality rule the stream_windowed_mentions
    oracle mirrors with strict `window_end > watermark`: a late row
    whose window END equals the current watermark is DROPPED, while
    one window later (end > wm) is accepted and emitted."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = str(tmp_path)

    def write(rows):
        spark.createDataFrame([(t,) for t in rows], "ts timestamp") \
            .write.mode("append").parquet(f"{base}/in")

    def run():
        df = (spark.readStream.schema("ts timestamp")
              .parquet(f"{base}/in")
              .withWatermark("ts", "1 hour")
              .groupBy(F.window("ts", "1 hour"))
              .agg(F.count(F.lit(1)).alias("n")))
        q = (df.select(F.col("window.start").alias("ws"), "n")
             .writeStream.outputMode("append").format("parquet")
             .option("path", f"{base}/out")
             .option("checkpointLocation", f"{base}/ck")
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    d0 = dt.datetime(2024, 1, 1)
    write([d0 + dt.timedelta(hours=2)])       # run 1 -> wm = 01:00
    run()
    # late 00:30 (window end 01:00 == wm: the TIE) + 01:30 (end 02:00)
    write([d0 + dt.timedelta(minutes=30), d0 + dt.timedelta(minutes=90)])
    run()
    write([d0 + dt.timedelta(hours=20)])      # flush
    run()
    write([d0 + dt.timedelta(hours=22)])      # flush (emission lags 1)
    run()
    got = {str(r["ws"]): r["n"]
           for r in spark.read.parquet(f"{base}/out").collect()}
    assert "2024-01-01 00:00:00" not in got   # tie row dropped
    assert got["2024-01-01 01:00:00"] == 1    # end > wm accepted
    assert got["2024-01-01 02:00:00"] == 1
