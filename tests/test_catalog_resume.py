"""Catalog snapshots, MERGE upsert, retention + checkpointed resume
(reference semantics: master_data.py currency check, keep-N cleanup)."""
from __future__ import annotations

import pytest

from askg_spark.catalog import Catalog
from askg_spark.fixtures import generate_pages
from askg_spark.pipeline import run_pipeline_materialized


def test_snapshot_append_read_timetravel(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df1 = spark.range(5).withColumnRenamed("id", "k")
    df2 = spark.range(8).withColumnRenamed("id", "k")
    s1 = cat.write_snapshot(df1, "t")
    s2 = cat.write_snapshot(df2, "t")
    assert cat.read(spark, "t").count() == 8              # current
    assert cat.read(spark, "t", snapshot_id=s1).count() == 5  # time travel
    assert s2 == s1 + 1


def test_merge_upsert_key_semantics(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    cat.write_snapshot(old, "t")
    cat.merge_upsert(spark, new, "t", key="k")
    got = {r["k"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_expire_snapshots_keeps_n(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    for i in range(7):
        cat.write_snapshot(spark.range(i + 1), "t")
    removed = cat.expire_snapshots("t", keep=5)
    assert removed == 2
    man = cat.manifest("t")
    assert [s["id"] for s in man["snapshots"]] == [3, 4, 5, 6, 7]
    assert cat.read(spark, "t").count() == 7  # current snapshot intact


@pytest.mark.slow
def test_materialized_resume_skips_unchanged_input(spark, tmp_path):
    pages = generate_pages(spark, n_servers=8, seed=7)
    out = str(tmp_path / "kg")
    r1 = run_pipeline_materialized(spark, pages, out)
    assert r1["skipped"] is False
    t1 = {(r["subj"], r["pred"], r["obj"]) for r in r1["triples"].collect()}
    # second run, same input fingerprint -> all stages skipped
    r2 = run_pipeline_materialized(spark, pages, out)
    assert r2["skipped"] is True
    t2 = {(r["subj"], r["pred"], r["obj"]) for r in r2["triples"].collect()}
    assert t1 == t2
    # lineage rows exist for every stage
    lin = Catalog(out).read(spark, "lineage")
    stages = {r["stage"] for r in lin.collect()}
    assert {"mentions", "entities", "triples"} <= stages
    # changed input -> recompute
    pages2 = generate_pages(spark, n_servers=12, seed=7)
    r3 = run_pipeline_materialized(spark, pages2, out)
    assert r3["skipped"] is False


def test_compact_snapshot_reduces_files_preserves_rows(spark, tmp_path):
    from askg_spark.catalog import Catalog
    import glob

    cat = Catalog(str(tmp_path / "cat"))
    # fragmented write: 16 files for 200 rows
    df = spark.range(0, 200).repartition(16)
    s1 = cat.write_snapshot(df, "t")
    frag = glob.glob(cat.manifest("t")["snapshots"][0]["path"]
                     + "/part-*.parquet")
    assert len(frag) == 16

    s2 = cat.compact_snapshot(spark, "t", target_rows_per_file=100)
    assert s2 == s1 + 1
    snap = next(s for s in cat.manifest("t")["snapshots"] if s["id"] == s2)
    compacted = glob.glob(snap["path"] + "/part-*.parquet")
    assert len(compacted) == 2      # ceil(200 / 100)
    assert snap["properties"]["compacted_from"] == s1
    # content identical; time travel to the fragmented snapshot works
    assert sorted(r["id"] for r in cat.read(spark, "t").collect()) \
        == list(range(200))
    assert cat.read(spark, "t", snapshot_id=s1).count() == 200
