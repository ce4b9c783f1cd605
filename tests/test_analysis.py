"""Dedup-analysis reports (askg_spark.analysis) — hand-computed
expectations on tiny frames, covering the cascade branches the driver's
union corpus can't reach (name-only and content-hash ids, multiple
repo domains, null-name mentions)."""
from __future__ import annotations

from askg_spark.analysis import (dedup_effectiveness,
                                 id_standardization_stats,
                                 repo_domain_stats)

ENT_SCHEMA = ("id string, name string, author string, repository string, "
              "description string, tools array<struct<name:string,"
              "description:string>>, completeness double")


def test_id_standardization_kinds(spark):
    ents = spark.createDataFrame(
        [
            # repository id wins over author/name
            ("a/one", "one", "alice", "https://github.com/a/one", "d",
             None, 1.0),
            # no repo -> author/name
            ("bob/two", "two", "bob", None, "d", None, 1.0),
            # no repo, no author -> bare name
            ("three", "three", None, None, "d", None, 1.0),
            # nothing usable -> content hash (empty name + author)
            ("server-x", "", "", None, "d", None, 1.0),
            # repo present but unparseable (no path) -> falls through
            ("carol/five", "five", "carol", "https://example.com", "d",
             None, 1.0),
        ],
        ENT_SCHEMA)
    got = {r["id_kind"]: r["n"]
           for r in id_standardization_stats(ents).collect()}
    assert got == {"repository": 1, "author_name": 2, "name": 1,
                   "content_hash": 1}


def test_repo_domain_stats(spark):
    m = spark.createDataFrame(
        [
            ("m1", "https://github.com/a/x"),
            ("m2", "https://github.com/a/x"),       # same repo, 2 mentions
            ("m3", "https://www.github.com/b/y"),   # www. strip
            ("m4", "https://gitlab.com/c/z"),
            ("m5", None),                           # excluded
            ("m6", ""),                             # excluded
        ],
        "mention_id string, repository string")
    got = {r["domain"]: (r["n_mentions"], r["n_repos"])
           for r in repo_domain_stats(m).collect()}
    assert got == {"github.com": (3, 2), "gitlab.com": (1, 1)}


def test_dedup_effectiveness_row(spark):
    mentions = spark.createDataFrame(
        [("m1", "one"), ("m2", "one"), ("m3", "two"), ("m4", None)],
        "mention_id string, norm_name string")
    entities = spark.createDataFrame([("e1",), ("e2",), ("e3",)],
                                     "id string")
    row = dedup_effectiveness(mentions, entities).collect()[0]
    assert row["n_before"] == 4
    assert row["n_after"] == 3
    assert row["n_removed"] == 1
    assert row["dedup_rate_pct"] == 25.0
    # null norm_name excluded from name stats
    assert row["n_norm_names"] == 2
    assert row["n_dup_names"] == 1
