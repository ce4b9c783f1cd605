"""Mention enrichment: classification + all dedup/link keys as Column exprs.

Everything here stays inside whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from askg_spark import normalize as N
from askg_spark.ontology import classify_categories, classify_operations


def enrich_mentions(mentions: DataFrame) -> DataFrame:
    """Add ontology classes, normalized keys and the completeness score.

    * categories: P2 over lower(description + " " + name)
      (reference ignores tags in categorize_server despite passing them)
    * operations: P3 over tool names; mcp.so mentions carry no tools so
      they default to ["read"] exactly like the reference's
      determine_operations({"tags": ...}) call [scrapers.py:684]
    * data_types: tags for mcp.so mentions [scrapers.py:685]
    * completeness: A3 [deduplication.py:440-455]
    """
    tool_names = F.transform(F.col("tools"), lambda t: t["name"])
    df = mentions.withColumns({
        "categories": classify_categories(F.col("name"), F.col("description")),
        "operations": classify_operations(tool_names),
        "data_types": F.when(
            F.col("registry") == "mcp.so", F.coalesce(F.col("tags"), F.array())
        ).otherwise(F.array().cast("array<string>")),
    })
    df = df.withColumns({
        "norm_name": N.norm_name(F.col("name")),
        "norm_author": N.norm_name(F.col("author")),
        "norm_repo": F.when(
            F.col("repository").isNotNull(), N.norm_repo_url(F.col("repository"))
        ),
        "content_hash": N.content_hash(
            F.col("name"), F.col("author"), F.col("description"),
            F.col("categories"), F.col("operations")),
        "repo_id": N.extract_repository_id(F.col("repository")),
        "github_org": F.when(
            F.col("repository").isNotNull(),
            F.element_at(F.split(F.col("repository"), "/"), 4)),
        "mention_id": F.md5(F.concat_ws(
            "\x01", F.col("url"), F.coalesce(F.col("name"), F.lit("")),
            F.coalesce(F.col("author"), F.lit("")))),
        "completeness": (
            F.when(F.col("description").isNotNull() & (F.col("description") != ""), 2).otherwise(0)
            + F.when(F.col("author").isNotNull() & (F.col("author") != ""), 1).otherwise(0)
            + F.when(F.col("repository").isNotNull(), 2).otherwise(0)
            + F.when(F.col("version").isNotNull(), 1).otherwise(0)
            + F.when(F.col("license").isNotNull(), 1).otherwise(0)
            + F.when(F.col("homepage").isNotNull(), 1).otherwise(0)
            + F.coalesce(F.size(F.col("tools")), F.lit(0))
            + F.coalesce(F.size(F.col("categories")), F.lit(0))
            + F.when(F.col("popularity_score").isNotNull() & (F.col("popularity_score") != 0), 1).otherwise(0)
        ).cast("long"),
    })
    # name+author composite key (J2) — only defined when both present
    df = df.withColumn(
        "name_author_key",
        F.when(
            F.col("name").isNotNull() & (F.col("name") != "")
            & F.col("author").isNotNull() & (F.col("author") != ""),
            F.concat_ws("|", F.col("norm_name"), F.col("norm_author")),
        ),
    )
    return df
