"""Scale policies: relation skew cap (top-M per hot key) and the
TF-IDF cosine candidate prune — both must be no-ops semantically on the
fixture (identical descriptions / uncapped) and take effect when armed."""
from __future__ import annotations

from pyspark.sql import functions as F

from askg_spark.enrich import enrich_mentions
from askg_spark.extract import extract_mentions
from askg_spark.fixtures import generate_pages
from askg_spark.linking import LinkConfig, description_idf, lsh_candidates, score_pairs
from askg_spark.relations import infer_relationship_edges


def _entities(spark, n=10):
    """Tiny entity frame with one hot author and one hot category."""
    rows = []
    for i in range(n):
        rows.append((
            f"e{i:02d}",
            "hot-author" if i < 6 else f"solo-{i}",
            ["ai_ml"] if i < 8 else ["database"],
            ["read", "write"],
            "python",
            100 - i,
        ))
    return spark.createDataFrame(
        rows, "id string, author string, categories array<string>, "
              "operations array<string>, implementation_language string, "
              "popularity_score long")


def test_relation_skew_cap_bounds_hot_keys(spark):
    ents = _entities(spark)
    uncapped = infer_relationship_edges(ents, max_entities_per_key=None)
    capped = infer_relationship_edges(ents, max_entities_per_key=3)
    sa_un = uncapped.filter(F.col("rel_type") == "same_author").count()
    sa_cap = capped.filter(F.col("rel_type") == "same_author").count()
    assert sa_un == 15          # C(6,2) for the hot author
    assert sa_cap == 3          # C(3,2) after top-3 cap
    # capped keeps the top entities by (popularity desc, id) — e00..e02
    kept = {(r["src"], r["dst"]) for r in
            capped.filter(F.col("rel_type") == "same_author").collect()}
    assert kept == {("e00", "e01"), ("e00", "e02"), ("e01", "e02")}
    # similar_functionality: C(8,2) ai_ml + C(2,2) database = 29;
    # capped: C(3,2) + C(2,2) = 4
    assert uncapped.filter(
        F.col("rel_type") == "similar_functionality").count() == 29
    assert capped.filter(
        F.col("rel_type") == "similar_functionality").count() == 4


def test_tfidf_prune_preserves_fixture_decisions(spark):
    """Fixture duplicate pairs share (near-)identical descriptions, so
    an armed prune must not drop any accepted pair."""
    pages = generate_pages(spark, n_servers=16, seed=42)
    mentions, _ = extract_mentions(pages)
    e = enrich_mentions(mentions).persist()
    cands = lsh_candidates(e, LinkConfig()).persist()
    base = {(r["src"], r["dst"])
            for r in score_pairs(cands, LinkConfig()).collect()}
    idf, n_docs = description_idf(e)
    assert n_docs > 0 and len(idf) > 0
    pruned_cfg = LinkConfig(tfidf_prune=0.5)
    pruned = {(r["src"], r["dst"])
              for r in score_pairs(cands, pruned_cfg, idf).collect()}
    assert pruned == base
    # a prune above 1.0 kills every pair that has both descriptions
    killall = {(r["src"], r["dst"])
               for r in score_pairs(cands, LinkConfig(tfidf_prune=1.01),
                                    idf).collect()}
    assert len(killall) < len(base) or not base
