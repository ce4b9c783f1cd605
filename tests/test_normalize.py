"""Normalizers P5-P10: Spark Column exprs vs the pure-Python oracle
(which mirrors the reference regexes verbatim). Key-equality semantics —
byte-exactness asserted on adversarial inputs."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from askg_spark import normalize as N
from tests import ref_oracle as O

NAMES = [
    "Playwright MCP", "mcp-playwright-server", "playwright_mcp",
    "MCP Server", "mcp", "", "Orbit-Bridge-3", "orbit bridge 3",
    "weird!!name##", "MCP-Foo_Bar server", "a", "über-server",
    "name  with   spaces ", "mcpish-tool",
]

URLS = [
    "https://GitHub.com/Owner/Repo.git", "https://github.com/owner/repo/",
    "http://github.com/o/r.git///", "https://gitlab.com/a/b",
    "https://bitbucket.org/x/y.git", "https://codeberg.org/c/d",
    "https://www.github.com/w/v", "https://example.com/not/git",
    "https://github.com/onlyowner", "https://github.com/o/r?tab=readme#x",
]

RAW_IDS = [
    "Some Name_With Specials!", "a" * 150, "--lead-trail--",
    "MiXeD/case/path", "x__y  z",
]


def _col_vals(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(expr_fn(F.col("v")).alias("o")).collect()]


def test_norm_name_matches_reference(spark):
    got = _col_vals(spark, NAMES, N.norm_name)
    want = [O.norm_name(v) for v in NAMES]
    assert got == want


def test_norm_repo_url_matches_reference(spark):
    got = _col_vals(spark, URLS, N.norm_repo_url)
    want = [O.norm_repo_url(v) for v in URLS]
    assert got == want


def test_extract_repository_id_matches_reference(spark):
    got = _col_vals(spark, URLS, N.extract_repository_id)
    want = [O.extract_repository_id(v) for v in URLS]
    assert got == want


def test_normalize_id_matches_reference(spark):
    got = _col_vals(spark, RAW_IDS, N.normalize_id)
    want = [O.normalize_id(v) for v in RAW_IDS]
    assert got == want


@pytest.mark.parametrize("cats,ops", [
    (["ai_ml", "database"], ["read"]),
    ([], []),
    (["other"], ["read", "write", "query"]),
])
def test_content_hash_matches_reference(spark, cats, ops):
    m = {"name": "Foo MCP", "author": "Bar", "description": "D" * 300,
         "categories": cats, "operations": ops}
    df = spark.createDataFrame(
        [(m["name"], m["author"], m["description"], cats, ops)],
        "name string, author string, description string, "
        "categories array<string>, operations array<string>")
    got = df.select(N.content_hash(
        F.col("name"), F.col("author"), F.col("description"),
        F.col("categories"), F.col("operations")).alias("h")).collect()[0][0]
    assert got == O.content_hash(m)


def test_content_hash_id_matches_reference(spark):
    m = {"name": "Foo", "author": "Bar", "description": "desc",
         "repository": "https://github.com/bar/foo",
         "tools": [{"name": "b_tool"}, {"name": "a_tool"}]}
    df = spark.createDataFrame(
        [(m["name"], m["author"], m["description"], m["repository"],
          ["b_tool", "a_tool"])],
        "name string, author string, description string, repository string, "
        "tool_names array<string>")
    got = df.select(N.content_hash_id(
        F.col("name"), F.col("author"), F.col("description"),
        F.col("repository"), F.col("tool_names")).alias("h")).collect()[0][0]
    assert got == O.content_hash_id(m)
    # empty tools branch (reference: `if tools`)
    m2 = dict(m, tools=[])
    df2 = spark.createDataFrame(
        [(m["name"], m["author"], m["description"], m["repository"], [])],
        "name string, author string, description string, repository string, "
        "tool_names array<string>")
    got2 = df2.select(N.content_hash_id(
        F.col("name"), F.col("author"), F.col("description"),
        F.col("repository"), F.col("tool_names")).alias("h")).collect()[0][0]
    assert got2 == O.content_hash_id(m2)
