"""Query surface over the canonical entity table.

  search_entities     the reference's no-LLM fallback scorer
                      (/root/reference/src/text2cypher.py:254-305:
                      name-contains 10.0, description-contains 8.0,
                      popularity*0.001 tie-break, threshold, top-k)
  extract_search_terms  P14 term extraction: keyword -> category /
                      operation mapping + stopword-filtered keywords
                      (/root/reference/mcp/server.py:314-365,
                      text2cypher.py:183-207)
  semantic_search     multi-term scoring: text 3.0/2.0, matched
                      categories x2.0, matched operations x1.5,
                      popularity x0.1, threshold, top-k
                      (/root/reference/mcp/server.py:426-461)
  similar_servers     W3 entity-similarity top-k per server:
                      2*|∩cats| + |∩ops| + same_author + same_lang > 0
                      (/root/reference/src/neo4j_integration.py:468-488)

All are plain DataFrame queries; similar_servers generates pairs with
the salted equi-joins from relations.py (the reference runs one O(n)
Cypher scan per query server — here the all-servers variant is a
single distributed job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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


# --- P14: search-term extraction (mcp/server.py:314-365) --------------------

SEARCH_CATEGORY_KEYWORDS: dict[str, list[str]] = {
    "database": ["database", "db", "sql", "nosql", "query", "store"],
    "file_system": ["file", "filesystem", "fs", "storage", "read", "write"],
    "api_integration": ["api", "rest", "graphql", "http", "webhook"],
    "development_tools": ["dev", "development", "tool", "utility"],
    "data_processing": ["process", "transform", "analyze", "etl"],
    "cloud_services": ["cloud", "aws", "azure", "gcp", "s3"],
    "communication": ["chat", "message", "email", "notification"],
    "authentication": ["auth", "login", "oauth", "jwt", "security"],
    "monitoring": ["monitor", "log", "metric", "alert"],
    "search": ["search", "index", "elasticsearch", "lucene"],
    "ai_ml": ["ai", "ml", "machine learning", "model", "prediction"],
}

SEARCH_OPERATION_KEYWORDS: dict[str, list[str]] = {
    "read": ["read", "get", "fetch", "retrieve"],
    "write": ["write", "save", "store", "create", "update"],
    "execute": ["execute", "run", "call", "invoke"],
    "query": ["query", "search", "find", "filter"],
    "transform": ["transform", "convert", "process", "analyze"],
    "monitor": ["monitor", "watch", "observe", "track"],
}

# text2cypher.py:191 — words dropped from the keyword list
SEARCH_STOPWORDS = {
    "find", "show", "me", "the", "best", "popular", "servers", "tools",
    "for", "that", "can", "and", "or", "with", "are", "what", "how",
    "when", "where", "why",
}


def extract_search_terms(prompt: str) -> dict:
    """P14: map a free-text prompt to matched categories / operations
    plus stopword-filtered keywords. Pure driver-side function — the
    prompt is one string, not data; the RESULT parameterizes the
    distributed scoring query."""
    low = prompt.lower()
    categories = [c for c, kws in SEARCH_CATEGORY_KEYWORDS.items()
                  if any(k in low for k in kws)]
    operations = [o for o, kws in SEARCH_OPERATION_KEYWORDS.items()
                  if any(k in low for k in kws)]
    keywords = [w for w in prompt.split()
                if w.lower() not in SEARCH_STOPWORDS]
    return {"categories": categories, "operations": operations,
            "keywords": keywords, "original_prompt": prompt}


def semantic_search(entities: DataFrame, prompt: str,
                    min_confidence: float = 0.0, limit: int = 10) -> DataFrame:
    """Multi-term ranked search (mcp/server.py:426-461): text relevance
    (name-contains 3.0 elif description-contains 2.0) + 2.0 per matched
    category + 1.5 per matched operation + popularity * 0.1; threshold
    + top-k with a deterministic id tie-break."""
    terms = extract_search_terms(prompt)
    low = prompt.lower()
    cats = F.array(*[F.lit(c) for c in terms["categories"]]) \
        if terms["categories"] else F.array().cast("array<string>")
    ops = F.array(*[F.lit(o) for o in terms["operations"]]) \
        if terms["operations"] else F.array().cast("array<string>")
    text_score = (
        F.when(F.lower(F.coalesce(F.col("name"), F.lit(""))).contains(low),
               F.lit(3.0))
        .when(F.lower(F.coalesce(F.col("description"), F.lit(""))).contains(low),
              F.lit(2.0))
        .otherwise(F.lit(0.0)))
    cat_score = F.size(F.array_intersect(
        F.coalesce(F.col("categories"), F.array().cast("array<string>")),
        cats)) * 2.0
    op_score = F.size(F.array_intersect(
        F.coalesce(F.col("operations"), F.array().cast("array<string>")),
        ops)) * 1.5
    pop_bonus = F.coalesce(F.col("popularity_score"), F.lit(0)) \
        .cast("double") * 0.1
    total = (text_score + cat_score + op_score + pop_bonus).alias("score")
    return (
        entities.withColumn("score", total)
        .filter(F.col("score") >= min_confidence)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(limit)
        .select("id", "name", "score")
    )


# --- W3: similar-servers top-k (neo4j_integration.py:468-488) ---------------

def similar_servers(entities: DataFrame, limit: int = 10,
                    n_salt: int = 32,
                    max_entities_per_key: int | None = None) -> DataFrame:
    """Top-`limit` similar servers for EVERY server:
    score = 2*|∩categories| + |∩operations| + same_author + same_lang,
    kept when > 0, ranked (score DESC, similar_id ASC).

    The reference runs this as one Cypher scan per query server
    (O(n) each); here pair scores come from four salted equi-joins
    (category / operation / author / language) whose weighted union
    aggregates to exactly the reference's formula, then a per-server
    window takes the top-k. Hot keys (a category held by most of the
    corpus) are salted n_salt ways, and ``max_entities_per_key``
    applies the same documented top-M-by-popularity truncation as
    relations.py (all-pairs per shared attribute is O(n²) for any
    engine at web scale; None = exact, the oracle-checked default)."""
    from askg_spark.relations import _capped, _salted_pairs

    ent = entities.select(
        "id", "author", "categories", "operations", "popularity_score",
        F.col("implementation_language").alias("lang"),
    ).withColumn("idx", F.xxhash64("id"))

    def keyed(df, key):
        return _capped(df, key, max_entities_per_key)

    contribs = []
    cat_keyed = keyed(ent.select("idx", "id", "popularity_score",
                                 F.explode("categories").alias("category")),
                      "category")
    contribs.append(_salted_pairs(cat_keyed, "category", n_salt)
                    .select("ia", "ib", F.lit(2).alias("w")))
    op_keyed = keyed(ent.select("idx", "id", "popularity_score",
                                F.explode("operations").alias("op")), "op")
    contribs.append(_salted_pairs(op_keyed, "op", n_salt)
                    .select("ia", "ib", F.lit(1).alias("w")))
    auth_keyed = keyed(ent.filter(
        F.col("author").isNotNull() & (F.col("author") != ""))
        .select("idx", "id", "popularity_score", "author"), "author")
    contribs.append(_salted_pairs(auth_keyed, "author", n_salt)
                    .select("ia", "ib", F.lit(1).alias("w")))
    lang_keyed = keyed(ent.filter(F.col("lang").isNotNull())
                       .select("idx", "id", "popularity_score", "lang"),
                       "lang")
    contribs.append(_salted_pairs(lang_keyed, "lang", n_salt)
                    .select("ia", "ib", F.lit(1).alias("w")))
    undirected = contribs[0]
    for c in contribs[1:]:
        undirected = undirected.unionByName(c)
    # integer-keyed aggregation (see relations.py scale notes); string
    # ids attach only after the quadratic row count is reduced
    scores = (undirected.groupBy("ia", "ib")
              .agg(F.sum("w").cast("long").alias("score")))
    ids = ent.select("idx", "id")
    scores = (
        scores
        .join(ids.select(F.col("idx").alias("ia"), F.col("id").alias("id_a")),
              "ia")
        .join(ids.select(F.col("idx").alias("ib"), F.col("id").alias("id_b")),
              "ib"))
    directed = scores.select(
        F.col("id_a").alias("server_id"), F.col("id_b").alias("similar_id"),
        "score",
    ).unionByName(scores.select(
        F.col("id_b").alias("server_id"), F.col("id_a").alias("similar_id"),
        "score"))
    w = Window.partitionBy("server_id").orderBy(
        F.desc("score"), F.asc("similar_id"))
    return (
        directed.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= limit)
        .select("server_id", "similar_id", "score", "rank")
    )
