"""Agent/server/capability ontology: enums, keyword tables, classifiers.

Semantics mirror the reference (cited per item); implementation is pure
Spark ``Column`` expressions — substring containment compiled to JVM-side
``contains``, no Python in the hot path.

Reference semantics reproduced:
  * category keyword map   -> /root/reference/src/scrapers.py:115-138 (P2)
  * operation keyword map  -> /root/reference/src/scrapers.py:140-156 (P3)
  * MCP-server predicate   -> /root/reference/src/scrapers.py:309-337 (P1)
  * enum value sets        -> /root/reference/src/models.py:8-38,96-105
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- enum value sets (models.py:8-38) ---------------------------------------

SERVER_CATEGORIES = [
    "database", "file_system", "api_integration", "development_tools",
    "data_processing", "cloud_services", "communication", "authentication",
    "monitoring", "search", "ai_ml", "other",
]

OPERATION_TYPES = [
    "read", "write", "query", "execute", "transform", "analyze", "sync",
    "stream",
]

REGISTRY_SOURCES = ["github", "mcp.so", "glama", "mcpmarket.com"]

RELATIONSHIP_TYPES = [
    "similar_functionality", "complementary", "depends_on", "alternative_to",
    "extends", "integrates_with", "same_author", "same_category", "data_flow",
]

# --- keyword tables ----------------------------------------------------------

# scrapers.py:119-132 — *substring* containment over lower(description+" "+name),
# matched in dict order; every matching category is appended; default "other".
CATEGORY_KEYWORDS: list[tuple[str, list[str]]] = [
    ("database", ["database", "sql", "postgres", "mysql", "mongodb", "redis"]),
    ("file_system", ["file", "filesystem", "directory", "folder", "storage"]),
    ("api_integration", ["api", "rest", "graphql", "webhook", "http"]),
    ("development_tools", ["git", "github", "code", "development", "build"]),
    ("data_processing", ["data", "etl", "transform", "process", "analytics"]),
    ("cloud_services", ["aws", "azure", "gcp", "cloud", "kubernetes"]),
    ("communication", ["slack", "discord", "email", "notification", "message"]),
    ("authentication", ["auth", "oauth", "login", "security", "jwt"]),
    ("monitoring", ["monitor", "metrics", "logging", "observability"]),
    ("search", ["search", "index", "elasticsearch", "solr"]),
    ("ai_ml", ["ai", "ml", "machine learning", "neural", "model"]),
]

# scrapers.py:146-154 — per-tool first-match-wins (if/elif chain),
# union over tools, default ["read"].
OPERATION_KEYWORDS: list[tuple[str, list[str]]] = [
    ("read", ["get", "read", "fetch", "list"]),
    ("write", ["create", "write", "update", "delete"]),
    ("query", ["query", "search", "find"]),
    ("execute", ["execute", "run", "call"]),
]

# scrapers.py:322-326 — README-level MCP indicators (substring, lowercase).
MCP_INDICATORS = [
    "mcp server", "model context protocol", "mcp-server",
    "claude desktop", "mcp.json", "model-context-protocol",
]


# --- Column-expression classifiers -------------------------------------------

def _contains_any(text: Column, keywords: list[str]) -> Column:
    """substring-containment OR-chain, stays in whole-stage codegen."""
    cond = F.lit(False)
    for kw in keywords:
        cond = cond | text.contains(kw)
    return cond


def is_mcp_server(text_col: Column) -> Column:
    """P1: page-text predicate; scrapers.py:309-337 semantics
    (lowercased substring containment of any indicator)."""
    return _contains_any(F.lower(text_col), MCP_INDICATORS)


def classify_categories(name: Column, description: Column) -> Column:
    """P2: keyword mention detection -> array<string> of categories.

    Matches scrapers.py:115-138: probe text is
    ``lower(description + " " + name)``; every matching category appended
    in keyword-table order; default ``["other"]``.
    """
    probe = F.lower(
        F.concat_ws(" ", F.coalesce(description, F.lit("")), F.coalesce(name, F.lit("")))
    )
    hits = F.array(*[
        F.when(_contains_any(probe, kws), F.lit(cat)) for cat, kws in CATEGORY_KEYWORDS
    ])
    compacted = F.array_compact(hits)
    return F.when(F.size(compacted) > 0, compacted).otherwise(F.array(F.lit("other")))


def classify_operations(tool_names: Column) -> Column:
    """P3: per-tool first-match-wins op classification -> array<string>.

    Matches scrapers.py:140-156: for each tool name (lowercased), the
    if/elif chain assigns the FIRST matching operation class; result is the
    distinct union over tools, default ``["read"]`` (also when no tools).
    """
    def tool_op(t: Column) -> Column:
        lt = F.lower(t)
        expr = F.lit(None).cast("string")
        # build the elif chain bottom-up so "read" wins over "write" etc.
        for op, kws in reversed(OPERATION_KEYWORDS):
            expr = F.when(_contains_any(lt, kws), F.lit(op)).otherwise(expr)
        return expr

    ops = F.array_compact(F.transform(tool_names, tool_op))
    dedup = F.array_sort(F.array_distinct(ops))
    return F.when(
        tool_names.isNull() | (F.size(F.array_compact(dedup)) == 0),
        F.array(F.lit("read")),
    ).otherwise(dedup)
