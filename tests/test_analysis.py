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


def test_bfs_depths_path_graph(spark):
    from askg_spark.graphops import bfs_depths

    # path 0-1-2-...-9 plus a detached pair (10, 11)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(10, 11)],
        "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.depth
           for r in bfs_depths(edges, seeds, max_depth=4).collect()}
    # exactly nodes within 4 hops, at their true distances; the
    # detached component and nodes beyond the horizon are absent
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    # multi-source: min over seeds; undirectedness (seed at the end)
    seeds2 = spark.createDataFrame([(0,), (9,)], "node long")
    got2 = {r.node: r.depth
            for r in bfs_depths(edges, seeds2, max_depth=4).collect()}
    assert got2[9] == 0 and got2[5] == 4 and got2[8] == 1
    assert 10 not in got2

    # early exit: horizon larger than the graph terminates
    got3 = {r.node: r.depth
            for r in bfs_depths(edges, seeds, max_depth=50).collect()}
    assert got3[9] == 9 and len(got3) == 10
