"""P1/P2/P3 classifiers: Spark Column exprs vs pure-Python oracle."""
from __future__ import annotations

from pyspark.sql import functions as F

from askg_spark.ontology import (classify_categories, classify_operations,
                                 is_mcp_server)
from tests import ref_oracle as O

CASES = [
    ("pg-bridge", "A postgres database connector"),
    ("file-kit", "filesystem storage manager"),
    ("multi", "database api cloud slack search ai"),
    ("plain", "nothing that matches here"),
    (None, None),
    ("Model Hub", None),            # name-only probe ("model" -> ai_ml)
    ("x", "machine learning with metrics and oauth"),
]

TOOLSETS = [
    ["get_records", "write_items"],
    ["search_entries"],
    ["noop_tool"],                  # no keyword -> dropped; default read
    [],
    None,
    ["run_job", "create_x", "fetch_y", "query_z"],
]


def test_classify_categories_matches_reference(spark):
    df = spark.createDataFrame(CASES, "name string, description string")
    got = [r[0] for r in df.select(
        classify_categories(F.col("name"), F.col("description")).alias("c")
    ).collect()]
    want = [O.categorize(n, d) for n, d in CASES]
    assert got == want


def test_classify_operations_matches_reference(spark):
    df = spark.createDataFrame(
        [(t,) for t in TOOLSETS], "tool_names array<string>")
    got = [r[0] for r in df.select(
        classify_operations(F.col("tool_names")).alias("o")).collect()]
    want = [O.operations_of(
        [{"name": n} for n in t] if t is not None else None)
        for t in TOOLSETS]
    assert got == want


def test_is_mcp_server_predicate(spark):
    rows = [
        ("This is an MCP Server for postgres", True),
        ("model context protocol implementation", True),
        ("uses mcp-server framework", True),
        ("works with Claude Desktop", True),
        ("see mcp.json config", True),
        ("a model-context-protocol shim", True),
        ("a general purpose library", False),
        ("", False),
    ]
    df = spark.createDataFrame(rows, "t string, want boolean")
    got = df.select(is_mcp_server(F.col("t")).alias("g"), "want").collect()
    for r in got:
        assert r["g"] == r["want"]


def test_ontology_dimension_covers_enum_with_grounded_parents(spark):
    """The static dimension covers the 12-value ServerCategory enum
    exactly; every parent is itself a predefined root, and each
    non-root's grounding keyword appears in its parent's own pattern
    lists (the documented attachment rule)."""
    from askg_spark.ontology import (ONTOLOGY_CATEGORIES,
                                     SERVER_CATEGORIES,
                                     ontology_categories)
    by_id = {c["id"]: c for c in ONTOLOGY_CATEGORIES}
    assert sorted(by_id) == sorted(SERVER_CATEGORIES)
    grounding = {"authentication": "oauth", "monitoring": "monitor",
                 "search": "search"}
    for c in ONTOLOGY_CATEGORIES:
        p = c["parent_category_id"]
        if p is None:
            continue
        parent = by_id[p]
        assert parent["parent_category_id"] is None, "one-level hierarchy"
        kw = grounding[c["id"]]
        assert (kw in parent["operational_patterns"]
                or kw in parent["integration_patterns"])
    df = ontology_categories(spark)
    assert df.count() == 12
    # the dimension is a driver-local relation — no file scan, no
    # shuffle can originate here (Spark plans createDataFrame of a
    # local list as LocalTableScan or Scan ExistingRDD by codepath)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "Exchange" not in plan


def test_category_hierarchy_triples_static(spark):
    from askg_spark.triples import category_hierarchy_triples
    got = {(r["subj"], r["pred"], r["obj"])
           for r in category_hierarchy_triples(spark).collect()}
    assert got == {
        ("api_integration", "HAS_SUBCATEGORY", "authentication"),
        ("cloud_services", "HAS_SUBCATEGORY", "monitoring"),
        ("file_system", "HAS_SUBCATEGORY", "search"),
    }
