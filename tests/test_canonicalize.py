"""Canonical merge laws (A2/A3) + deterministic global IDs (P11)."""
from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from askg_spark.canonicalize import assign_global_ids, canonical_entities

TS1 = datetime(2025, 6, 1, tzinfo=timezone.utc)
TS2 = datetime(2025, 6, 2, tzinfo=timezone.utc)

MENTION_SCHEMA = (
    "component string, url string, warc_ts timestamp, registry string, "
    "name string, author string, description string, repository string, "
    "homepage string, license string, version string, "
    "implementation_language string, "
    "tools array<struct<name:string,description:string>>, "
    "resources array<struct<uri:string,name:string,description:string,"
    "mime_type:string>>, "
    "prompts array<struct<name:string,description:string>>, "
    "categories array<string>, operations array<string>, "
    "data_types array<string>, popularity_score long, download_count long, "
    "completeness long"
)


def _m(component, url, ts, **kw):
    base = dict(
        component=component, url=url, warc_ts=ts, registry="mcp.so",
        name=None, author=None, description=None, repository=None,
        homepage=None, license=None, version=None,
        implementation_language=None, tools=None, resources=None,
        prompts=None, categories=[],
        operations=[], data_types=[], popularity_score=None,
        download_count=None, completeness=0)
    base.update(kw)
    return tuple(base[k.split(" ")[0]] for k in MENTION_SCHEMA.split(", "))


def test_merge_prefers_most_complete_and_unions(spark):
    rows = [
        _m("c1", "u1", TS1, name="short", description=None,
           categories=["other"], operations=["read"],
           popularity_score=5, completeness=1),
        _m("c1", "u2", TS2, name="better-name", author="alice",
           description="full desc", repository="https://github.com/a/b",
           tools=[("t1", "d1")], categories=["database"],
           operations=["write"], popularity_score=3, completeness=9),
        _m("c1", "u3", TS1, name=None, author=None, license="MIT",
           tools=[("t1", "other"), ("t2", None)],
           categories=["database", "search"], operations=["read"],
           completeness=3),
    ]
    df = spark.createDataFrame(rows, MENTION_SCHEMA)
    ent = canonical_entities(df).collect()
    assert len(ent) == 1
    e = ent[0]
    assert e["name"] == "better-name"          # most complete wins
    assert e["author"] == "alice"
    assert e["license"] == "MIT"               # filled from less complete
    assert e["categories"] == ["database", "other", "search"]
    assert e["operations"] == ["read", "write"]
    assert e["popularity_score"] == 5          # max across members
    assert e["last_updated"].replace(tzinfo=timezone.utc) == TS2
    # tools union by name, first occurrence (in completeness order) wins
    assert [(t["name"], t["description"]) for t in e["tools"]] == [
        ("t1", "d1"), ("t2", None)]
    assert e["member_urls"] == ["u1", "u2", "u3"]


def test_global_id_cascade_and_collision_suffix(spark):
    schema = (
        "component string, name string, author string, description string, "
        "repository string, tools array<struct<name:string,description:string>>, "
        "completeness long, member_urls array<string>")
    rows = [
        # repo-backed -> owner/repo id
        ("c1", "X", "o", None, "https://github.com/owner/repo", None, 9, ["u1"]),
        # same candidate id, lower completeness -> suffixed -2
        ("c2", "Y", "o", None, "https://github.com/Owner/Repo/", None, 5, ["u2"]),
        # author/name fallback
        ("c3", "My Tool", "alice", None, None, None, 4, ["u3"]),
        # name-only fallback
        ("c4", "Solo Thing", None, None, None, None, 2, ["u4"]),
        # hash fallback (nothing usable)
        ("c5", None, None, "only a description", None, None, 1, ["u5"]),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["component"]: r["id"] for r in assign_global_ids(df).collect()}
    assert got["c1"] == "owner/repo"
    assert got["c2"] == "owner/repo-2"
    assert got["c3"] == "alice/my-tool"
    assert got["c4"] == "solo-thing"
    assert got["c5"].startswith("server-") and len(got["c5"]) == len("server-") + 12


def test_global_ids_stable_across_runs(spark):
    """Reference property (tests/test_global_ids.py:151-169): same input
    -> same ids, all unique."""
    schema = ("component string, name string, author string, description string, "
              "repository string, tools array<struct<name:string,description:string>>, "
              "completeness long, member_urls array<string>")
    rows = [(f"c{i}", f"name-{i % 7}", f"auth-{i % 3}", None, None, None,
             i % 5, [f"u{i}"]) for i in range(30)]
    df = spark.createDataFrame(rows, schema)
    ids1 = sorted(r["id"] for r in assign_global_ids(df).collect())
    ids2 = sorted(r["id"] for r in assign_global_ids(df).collect())
    assert ids1 == ids2
    assert len(set(ids1)) == len(ids1)


def test_ord_column_not_leaked(spark):
    df = spark.createDataFrame(
        [_m("c1", "u1", TS1, name="n", completeness=1)], MENTION_SCHEMA)
    cols = canonical_entities(df).columns
    assert "ord" not in cols and "_tool_lists" not in cols


def test_resources_and_prompts_merge_by_key(spark):
    # resources union by uri, prompts by name, first (most complete
    # member) wins on conflicts — same law as tools-by-name
    r1 = [{"uri": "file:///a", "name": "a-hi", "description": "from r1",
           "mime_type": "text/plain"}]
    r2 = [{"uri": "file:///a", "name": "a-lo", "description": "from r2",
           "mime_type": None},
          {"uri": "file:///b", "name": "b", "description": None,
           "mime_type": "application/json"}]
    p1 = [{"name": "p", "description": "win"}]
    p2 = [{"name": "p", "description": "lose"},
          {"name": "q", "description": None}]
    rows = [
        _m("c1", "u1", TS1, name="x", description="full desc",
           resources=r1, prompts=p1, completeness=5),
        _m("c1", "u2", TS1, name="x", resources=r2, prompts=p2,
           completeness=1),
    ]
    df = spark.createDataFrame(rows, MENTION_SCHEMA)
    ent = canonical_entities(df).collect()[0]
    res = {r["uri"]: r for r in ent["resources"]}
    assert set(res) == {"file:///a", "file:///b"}
    assert res["file:///a"]["name"] == "a-hi"          # first-by-ord wins
    assert res["file:///b"]["mime_type"] == "application/json"
    pr = {p["name"]: p for p in ent["prompts"]}
    assert set(pr) == {"p", "q"}
    assert pr["p"]["description"] == "win"


def test_resources_absent_stay_null(spark):
    rows = [_m("c1", "u1", TS1, name="x")]
    ent = canonical_entities(
        spark.createDataFrame(rows, MENTION_SCHEMA)).collect()[0]
    assert ent["resources"] is None and ent["prompts"] is None
