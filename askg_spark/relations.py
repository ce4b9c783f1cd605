"""Typed relationship derivation between canonical entities.

The reference infers 0-4 edges per *all-pairs* nested loop
(/root/reference/src/neo4j_integration.py:552-631). Pairwise semantics
are reproduced exactly, but pair *generation* is decomposed into
equi-joins so it scales (SURVEY §2.3 J7):

  same_author            self-join on author        (confidence 1.0)
  similar_functionality  self-join on exploded category, then exact
                         |∩cats| / max(|c1|,|c2|)
  complementary          pairs with >= 2 common operations, conf
                         |∩ops| / max(|ops1|,|ops2|) * 0.8
  alternative_to         same implementation_language AND >=1 common
                         category, conf 0.6

Pair orientation is normalized to id_lo < id_hi (the reference uses
input list order, which does not exist distributed; triples are compared
on normalized (subj, pred, obj) keys per the north rule).

Skew policy (explicit, logged): hot join keys (a popular author, the
ai_ml category) generate O(k²) pairs. `max_entities_per_key` caps each
key's contribution to its top-M entities by (popularity DESC, id ASC)
before pairing — a documented, deterministic truncation for web scale
(None disables it; fixture tests run uncapped). AQE skew-join splitting
is on for the joins themselves (session.py).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger(__name__)

_PAIR_FIELDS = ["id", "author", "categories", "operations",
                "implementation_language", "popularity_score"]


def _capped(df: DataFrame, key_col: str, max_per_key: int | None) -> DataFrame:
    if max_per_key is None:
        return df
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(
        F.desc_nulls_last("popularity_score"), F.asc("id"))
    out = (df.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= max_per_key).drop("_rk"))
    log.info("relations: capped key %s to top-%d entities by popularity",
             key_col, max_per_key)
    return out


def _pair_join(left_keyed: DataFrame, key: str) -> DataFrame:
    """self equi-join on `key`, keeping each unordered pair once."""
    a = left_keyed.select(F.col(key).alias("_k"),
                          F.struct(*_PAIR_FIELDS).alias("e1"))
    b = left_keyed.select(F.col(key).alias("_k"),
                          F.struct(*_PAIR_FIELDS).alias("e2"))
    return (
        a.join(b, "_k")
        .filter(F.col("e1.id") < F.col("e2.id"))
        .select("e1", "e2")
        .dropDuplicates()
    )


def _common(c1, c2):
    return F.array_intersect(c1, c2)


def infer_relationship_edges(
    entities: DataFrame, max_entities_per_key: int | None = None
) -> DataFrame:
    """-> edges(src, dst, rel_type, confidence, description, evidence)."""
    ent = entities.select(*_PAIR_FIELDS)

    # same_author: equi-join on exact author (neo4j_integration.py:571-582)
    by_author = _capped(
        ent.filter(F.col("author").isNotNull() & (F.col("author") != "")),
        "author", max_entities_per_key)
    same_author = _pair_join(by_author, "author").select(
        "e1", "e2",
        F.lit("same_author").alias("rel_type"),
        F.lit(1.0).alias("confidence"),
        F.concat(F.lit("Both servers created by "), F.col("e1.author")
                 ).alias("description"),
        F.array(F.concat(F.lit("Author: "), F.col("e1.author"))).alias("evidence"),
    )

    # category-pair base: explode categories, join, dedupe pair
    cat_keyed = _capped(
        ent.withColumn("category", F.explode("categories")),
        "category", max_entities_per_key)
    cat_pairs = _pair_join(cat_keyed, "category").withColumn(
        "common_cats", F.array_sort(_common(F.col("e1.categories"),
                                            F.col("e2.categories"))))

    # similar_functionality (neo4j_integration.py:584-597)
    similar = cat_pairs.filter(F.size("common_cats") > 0).select(
        "e1", "e2",
        F.lit("similar_functionality").alias("rel_type"),
        (F.size("common_cats") /
         F.greatest(F.size("e1.categories"), F.size("e2.categories"))
         ).cast("double").alias("confidence"),
        F.concat(F.lit("Share "), F.size("common_cats"),
                 F.lit(" common categories")).alias("description"),
        F.array(F.concat(F.lit("Common categories: "),
                         F.array_join("common_cats", ", "))).alias("evidence"),
    )

    # complementary: >= 2 common operations (neo4j_integration.py:599-612).
    # Ops live in a tiny 8-value domain, so pair generation via the
    # category/author joins would miss op-only pairs; explode ops instead.
    op_keyed = _capped(
        ent.withColumn("op", F.explode("operations")),
        "op", max_entities_per_key)
    op_pairs = _pair_join(op_keyed, "op").withColumn(
        "common_ops", F.array_sort(_common(F.col("e1.operations"),
                                           F.col("e2.operations"))))
    complementary = op_pairs.filter(F.size("common_ops") >= 2).select(
        "e1", "e2",
        F.lit("complementary").alias("rel_type"),
        (F.size("common_ops") /
         F.greatest(F.size("e1.operations"), F.size("e2.operations")) * 0.8
         ).cast("double").alias("confidence"),
        F.concat(F.lit("Share "), F.size("common_ops"),
                 F.lit(" common operations")).alias("description"),
        F.array(F.concat(F.lit("Common operations: "),
                         F.array_join("common_ops", ", "))).alias("evidence"),
    )

    # alternative_to: same language + common categories
    # (neo4j_integration.py:615-628)
    alternative = (
        cat_pairs
        .filter(F.size("common_cats") > 0)
        .filter(
            F.col("e1.implementation_language").isNotNull()
            & (F.col("e1.implementation_language")
               == F.col("e2.implementation_language")))
        .select(
            "e1", "e2",
            F.lit("alternative_to").alias("rel_type"),
            F.lit(0.6).alias("confidence"),
            F.concat(F.lit("Alternative implementations in "),
                     F.col("e1.implementation_language")).alias("description"),
            F.array(
                F.concat(F.lit("Same language: "),
                         F.col("e1.implementation_language")),
                F.lit("Similar categories"),
            ).alias("evidence"),
        )
    )

    return (
        same_author.unionByName(similar)
        .unionByName(complementary)
        .unionByName(alternative)
        .select(
            F.col("e1.id").alias("src"), F.col("e2.id").alias("dst"),
            "rel_type", "confidence", "description", "evidence")
    )
