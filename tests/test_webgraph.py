"""webgraph: outlink extraction, owner in-degree, PageRank vs a NumPy
power-iteration reference (same formula, same fixed iteration count)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from askg_spark import webgraph


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary")


def test_extract_outlinks_order_and_multiplicity(spark):
    pages = _pages(spark, [
        ("p1", '<a href="https://x.com/a">1</a><a href="https://x.com/a">'
               '2</a><a href="https://y.com/b/c">3</a>'),
        ("p2", "<p>no links</p>"),
    ])
    out = webgraph.extract_outlinks(pages).collect()
    assert [(r["src_url"], r["href"]) for r in out] == [
        ("p1", "https://x.com/a"),
        ("p1", "https://x.com/a"),
        ("p1", "https://y.com/b/c"),
    ]


def test_normalize_and_owner(spark):
    df_in = [("https://www.x.com/A/b/c/",), ("http://y.org",),
             ("https://github.com/own/repo",)]
    df = spark.createDataFrame(df_in, "href string")
    out = df.select(
        webgraph.normalize_target(F.col("href")).alias("t")).collect()
    assert [r["t"] for r in out] == ["x.com/A/b/c", "y.org",
                                     "github.com/own/repo"]
    owners = df.select(webgraph.target_owner(
        webgraph.normalize_target(F.col("href"))).alias("o")).collect()
    assert [r["o"] for r in owners] == ["x.com/A", "y.org",
                                        "github.com/own"]


def test_owner_indegree_counts(spark):
    pages = _pages(spark, [
        ("p1", '<a href="https://github.com/o1/r1">x</a>'
               '<a href="https://github.com/o1/r2">y</a>'),
        ("p2", '<a href="https://github.com/o1/r1">x</a>'),
        ("p3", '<a href="https://z.net/">x</a>'),
    ])
    rows = {r["owner"]: r for r in webgraph.owner_indegree(pages).collect()}
    assert rows["github.com/o1"]["n_links"] == 3
    assert rows["github.com/o1"]["n_targets"] == 2
    assert rows["github.com/o1"]["n_src_pages"] == 2
    assert rows["z.net"]["n_links"] == 1


def _numpy_pagerank(edges, iters, d):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    adj = np.zeros((n, n))
    for u, v in set(edges):
        adj[ix[v], ix[u]] += 1.0
        out[ix[u]] += 1.0
    r = np.full(n, 1.0 / n)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(out > 0, 1.0 / out, 0.0)
    for _ in range(iters):
        linked = r[out > 0].sum()
        dang = 1.0 - linked
        r = (1 - d) / n + d * (adj @ (r * w) + dang / n)
    return {v: r[ix[v]] for v in nodes}


@pytest.mark.parametrize("iters", [1, 7])
def test_pagerank_matches_numpy_reference(spark, iters):
    rng = np.random.default_rng(7)
    n = 40
    edges = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, n, size=(160, 2)) if a != b]
    # guarantee some dangling nodes: n37..n39 receive only
    edges = [(u, v) for u, v in edges if not u.startswith("n3")] + \
            [("n0", "n37"), ("n1", "n38"), ("n2", "n39")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in webgraph.pagerank(df, iterations=iters,
                                      checkpoint_every=3).collect()}
    want = _numpy_pagerank(edges, iters, 0.85)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert webgraph.pagerank(df, iterations=2).count() == 0


def test_conf_contexts_isolated_to_child_session(spark):
    """The AQE-off / shuffle-width context managers applied to a child
    session must leave the parent session's conf untouched WHILE held
    (the leak the advisory flagged), and restore the child on exit."""
    parent_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    parent_w = spark.conf.get("spark.sql.shuffle.partitions")
    child = spark.newSession()
    with webgraph._AqeOff(child), webgraph._ShufflePartitions(child, 1):
        assert spark.conf.get("spark.sql.adaptive.enabled",
                              "true") == parent_aqe
        assert spark.conf.get("spark.sql.shuffle.partitions") == parent_w
        assert child.conf.get("spark.sql.adaptive.enabled") == "false"
        assert child.conf.get("spark.sql.shuffle.partitions") == "1"
    assert child.conf.get("spark.sql.adaptive.enabled") == parent_aqe
    assert child.conf.get("spark.sql.shuffle.partitions") == parent_w


def test_pagerank_runs_on_child_session_and_cleans_views(spark):
    """pagerank's loop frames live on a child session (isolated conf);
    the parent's conf is unchanged afterwards and the bridging global
    temp views are dropped."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    before = (spark.conf.get("spark.sql.adaptive.enabled", "true"),
              spark.conf.get("spark.sql.shuffle.partitions"))
    ranks = webgraph.pagerank(df, iterations=3)
    assert ranks.sparkSession is not spark
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    want = _numpy_pagerank([("a", "b"), ("b", "c"), ("c", "a"),
                            ("a", "c")], 3, 0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    after = (spark.conf.get("spark.sql.adaptive.enabled", "true"),
             spark.conf.get("spark.sql.shuffle.partitions"))
    assert after == before
    leftover = [t.name for t in spark.catalog.listTables("global_temp")
                if t.name.startswith("askg_pr_")]
    assert leftover == []


def test_canonicalize_url_rules(spark):
    from askg_spark.webgraph import canonicalize_url

    cases = [
        # scheme+host lowercased, www/default port/trailing slash/
        # fragment stripped, tracking dropped, params sorted
        ("HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&b=2&a=1#frag",
         "https://example.com/A/B?a=1&b=2"),
        ("http://example.com:80/", "http://example.com"),
        # non-default port and param values preserved
        ("http://example.com:8080/p?z=Z%20Q&A=2",
         "http://example.com:8080/p?A=2&z=Z%20Q"),
        # tracking-only query -> no '?'
        ("https://example.com/p?utm_campaign=c&fbclid=1",
         "https://example.com/p"),
        # no query, no changes needed
        ("https://example.com/a", "https://example.com/a"),
        # no scheme: host casing preserved, steps 1/4/5 still apply
        ("Example.com/Path/?b=1&utm_source=s#x", "Example.com/Path?b=1"),
        # empty query string after '?' -> dropped
        ("https://example.com/a?", "https://example.com/a"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c"))
           .collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_surt_key_shapes(spark):
    from pyspark.sql import functions as F

    from askg_spark.webgraph import surt_key

    cases = [
        ("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&z=1#frag",
         "com,example)/A/b?z=1"),
        ("http://sub.host.co.uk/x", "uk,co,host,sub)/x"),
        ("https://plain.org", "org,plain)/"),
        ("https://one.two/path/", "two,one)/path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.s for r in df.select(surt_key(F.col("url")).alias("s"))
           .collect()]
    assert got == [e for _, e in cases]


def test_canonicalize_port_strip_is_scheme_conditional(spark):
    from pyspark.sql import functions as F

    from askg_spark.webgraph import canonicalize_url

    cases = [
        ("http://h.com:443/x", "http://h.com:443/x"),   # NOT default
        ("https://h.com:80/x", "https://h.com:80/x"),   # NOT default
        ("http://h.com:80/x", "http://h.com/x"),
        ("https://h.com:443/x", "https://h.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_target_anchor_stats_counts_and_ranks(spark):
    """Anchor extraction + per-owner ranking on a handcrafted page
    set: repeated (target, anchor) pairs aggregate, distinct anchors
    for one target stay separate rows, rank orders by (n_links DESC,
    target, anchor)."""
    pages = spark.createDataFrame(
        [("p1", '<a href="https://github.com/o/r1">code</a>'
                '<a href="https://github.com/o/r1">code</a>'
                '<a href="https://github.com/o/r2">docs</a>'),
         ("p2", '<a href="https://github.com/o/r1">source</a>'
                '<a href="https://www.other.net/x/">x</a>')],
        "url string, html string") \
        .select("url", F.col("html").cast("binary").alias("html"))
    rows = {(r["owner"], r["target"], r["anchor"]):
            (r["n_links"], r["rnk"])
            for r in webgraph.target_anchor_stats(pages).collect()}
    assert rows[("github.com/o", "github.com/o/r1", "code")] == (2, 1)
    assert rows[("github.com/o", "github.com/o/r1", "source")][0] == 1
    assert rows[("github.com/o", "github.com/o/r2", "docs")][0] == 1
    # ties at n_links=1 break by (target, anchor) ascending
    assert rows[("github.com/o", "github.com/o/r1", "source")][1] == 2
    assert rows[("github.com/o", "github.com/o/r2", "docs")][1] == 3
    # www. + trailing slash normalize away; owner of a bare-host path
    assert rows[("other.net/x", "other.net/x", "x")] == (1, 1)
