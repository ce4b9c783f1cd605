"""Deterministic keyword search over the canonical entity table —
parity with the reference's no-LLM fallback scorer
(/root/reference/src/text2cypher.py:254-305: name-contains 10.0,
description-contains 8.0, popularity*0.001 tie-break, threshold,
ORDER BY score DESC LIMIT k).

A trivial DataFrame query (filter + score expr + TakeOrdered) — listed
as an operator because the reference ships it as its query surface; the
LLM text2cypher path is out of scope (external API, non-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def search_entities(entities: DataFrame, term: str,
                    min_confidence: float = 0.0, limit: int = 10) -> DataFrame:
    """-> (id, name, score) for entities matching `term`, ranked."""
    t = term.lower()
    name_hit = F.lower(F.coalesce(F.col("name"), F.lit(""))).contains(t)
    desc_hit = F.lower(F.coalesce(F.col("description"), F.lit(""))).contains(t)
    score = (
        F.when(name_hit, F.lit(10.0)).otherwise(0.0)
        + F.when(desc_hit, F.lit(8.0)).otherwise(0.0)
        + F.coalesce(F.col("popularity_score"), F.lit(0)).cast("double") * 0.001
    )
    return (
        entities.withColumn("score", score)
        .filter((F.col("score") > 0) & (F.col("score") >= min_confidence))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(limit)
        .select("id", "name", "score")
    )
