"""Deduplication / ID-quality analysis reports.

Distributed analogs of the reference's snapshot-analysis script
/root/reference/src/analyze_deduplication.py — every printed report
becomes a small DataFrame so it is oracle-checkable and composable:

  * id_standardization_stats   analyze_id_standardization  (:51-88)
  * repo_domain_stats          analyze_repository_urls     (:91-121)
  * dedup_effectiveness        analyze_name_similarity     (:124-151)
                               + test_deduplication_effectiveness
                                 (:154-180)
  * (metadata completeness %   metrics.metadata_completeness, A5)

Scale design: each report is one groupBy aggregation over mentions or
entities (frames already bounded by the corpus' mention count) — no
windows, no joins except single-row cross-joins of already-aggregated
frames, all safely broadcast at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from askg_spark import normalize as N


def id_standardization_stats(entities: DataFrame) -> DataFrame:
    """(id_kind, n) — which branch of the global-ID cascade produced
    each canonical id (repository | author_name | name | content_hash),
    mirroring the reference's per-strategy ID-quality report
    (analyze_deduplication.py:51-88; the published quality number is
    '97.5% repository-based IDs', docs/ASSESSMENT_SUMMARY.md). The
    branch conditions replicate canonicalize.assign_global_ids
    column-for-column."""
    repo_id = F.nullif(
        N.normalize_id(N.extract_repository_id(F.col("repository"))),
        F.lit(""))
    name_ok = F.col("name").isNotNull() & (F.col("name") != "")
    author_ok = F.col("author").isNotNull() & (F.col("author") != "")
    author_name_id = F.nullif(
        N.normalize_id(F.concat_ws("/", F.col("author"), F.col("name"))),
        F.lit(""))
    name_id = F.nullif(N.normalize_id(F.col("name")), F.lit(""))
    kind = (
        F.when(repo_id.isNotNull(), F.lit("repository"))
        .when(name_ok & author_ok & author_name_id.isNotNull(),
              F.lit("author_name"))
        .when(name_ok & name_id.isNotNull(), F.lit("name"))
        .otherwise(F.lit("content_hash"))
    )
    return (entities.groupBy(kind.alias("id_kind"))
            .agg(F.count(F.lit(1)).alias("n")))


def repo_domain_stats(mentions: DataFrame) -> DataFrame:
    """(domain, n_mentions, n_repos) over mentions that carry a
    repository URL — the domain distribution + unique-repo counts of
    analyze_repository_urls (analyze_deduplication.py:91-121)."""
    host = F.lower(F.regexp_extract(
        F.col("repository"), r"^[a-z]+://(?:www\.)?([^/]+)", 1))
    return (
        mentions
        .filter(F.col("repository").isNotNull() & (F.col("repository") != ""))
        .select(host.alias("domain"), "repository")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_mentions"),
             F.countDistinct("repository").alias("n_repos"))
    )


def dedup_effectiveness(mentions: DataFrame,
                        entities: DataFrame) -> DataFrame:
    """One-row report: mentions before dedup, canonical entities after,
    duplicates removed, dedup rate %, distinct normalized names and
    names shared by >1 mention — test_deduplication_effectiveness +
    analyze_name_similarity (analyze_deduplication.py:124-180; the
    reference's published figure is a 3.5% dedup rate on its
    3-registry corpus, scale_assessment.py:75-76)."""
    name_groups = (
        mentions.filter(F.col("norm_name").isNotNull()
                        & (F.col("norm_name") != ""))
        .groupBy("norm_name").agg(F.count(F.lit(1)).alias("cnt")))
    name_stats = name_groups.agg(
        F.count(F.lit(1)).alias("n_norm_names"),
        F.sum((F.col("cnt") > 1).cast("long")).alias("n_dup_names"))
    before = mentions.agg(F.count(F.lit(1)).alias("n_before"))
    after = entities.agg(F.count(F.lit(1)).alias("n_after"))
    return (
        before.crossJoin(after).crossJoin(name_stats)
        .withColumn("n_removed", F.col("n_before") - F.col("n_after"))
        .withColumn("dedup_rate_pct",
                    F.col("n_removed") * 100.0 / F.col("n_before"))
        .select("n_before", "n_after", "n_removed", "dedup_rate_pct",
                "n_norm_names", "n_dup_names")
    )
