"""Deduplication operators for a web-scale training-data pipeline.

Five strategies over a `documents(doc_id, text, ...)` table, each a
DataFrame -> DataFrame function designed for 100 TB inputs:

  exact        hash-groupBy on a canonical md5 fingerprint (one shuffle
               on the hash key; map-side partial agg free from Catalyst)
  ngram        token n-gram Jaccard via an inverted-index equi-join —
               never all-pairs; optional stop-gram cap bounds the
               posting-list blowup on hot shingles (skew policy)
  minhash      MinHashLSH blocking (pyspark.ml) + exact Jaccard rescore
               of candidates — the sub-quadratic scale path
  simhash      64-bit sign-sum sketch from md5 token hashes; near-dups
               collide on band keys (4 x 16-bit bands, Hamming<=3-ish)
  embedding    cosine over a normalized embedding column; exact
               threshold join at test scale, LSH-bucketed in simsearch

Output contracts carry exact integers (intersection/union sizes), not
float ratios, so the DuckDB oracles hash identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from askg_spark.textops import fingerprints, tokens


# ---------------------------------------------------------------- exact

def exact_duplicate_groups(df: DataFrame) -> DataFrame:
    """Groups of byte-identical (modulo case/whitespace) documents:
    -> (fingerprint, n_docs, canonical_doc_id=min, doc_ids sorted).
    Only groups with >1 member — the dedup worklist."""
    fp = fingerprints(df)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("canonical_doc_id"),
             F.array_sort(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame) -> DataFrame:
    """Keep the min doc_id per fingerprint (deterministic survivor)."""
    fp = fingerprints(df).groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"))
    return df.join(fp.select("doc_id"), "doc_id", "left_semi")


# ---------------------------------------------------------------- n-grams

def token_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined); < n tokens -> empty."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.5,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold.

    Inverted-index plan: explode grams -> self equi-join on gram ->
    per-pair intersection count -> join per-doc set sizes. Shuffles on
    (gram) then (pair) — linear in posting-list mass, never |docs|².

    ``max_gram_df`` drops grams appearing in more than that many docs
    (stop-grams): at web scale a boilerplate shingle ("all rights
    reserved...") creates a quadratic posting list; capping it is the
    standard, explicitly-logged recall trade (pairs supported ONLY by
    stop-grams are lost). None = exact (tests, oracle parity).
    """
    g = df.select("doc_id", F.explode(token_ngrams(F.col("text"), n))
                  .alias("gram"))
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    if max_gram_df is not None:
        hot = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df_"))
        g = g.join(hot.filter(F.col("df_") <= max_gram_df).select("gram"),
                   "gram", "left_semi")
    a = g.select(F.col("doc_id").alias("doc_a"), "gram")
    b = g.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .filter(F.col("n_common") >= F.lit(threshold) * F.col("n_union"))
        .select("doc_a", "doc_b", "n_common", "n_union")
    )


# ---------------------------------------------------------------- minhash

def minhash_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                  num_hash_tables: int = 8,
                  num_features: int = 1 << 18) -> DataFrame:
    """MinHashLSH candidate blocking + exact-on-features Jaccard.

    The scale path for ngram_jaccard_pairs: LSH banding makes candidate
    generation sub-quadratic; the reported distance is exact Jaccard on
    the hashed gram sets (collision error ~|grams|/2^18). Approximate by
    construction — recall vs the exact join is measured in tests."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = df.select("doc_id", token_ngrams(F.col("text"), n).alias("grams")) \
             .filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", binary=True,
                   numFeatures=num_features)
    feats = tf.transform(base)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - threshold,
                                       distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(F.col("datasetA.doc_id").alias("doc_a"),
                F.col("datasetB.doc_id").alias("doc_b"))
    )


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 60


def simhash_sketches(df: DataFrame, n: int = 3) -> DataFrame:
    """-> (doc_id, simhash): 60-bit sign-sum sketch over DISTINCT word
    n-gram shingles; shingle hash = first 60 bits of md5 (stable across
    engines and platforms — no JVM/Python hash seeding).

    Shingles, not unigrams: on corpora sharing a vocabulary, distinct
    token SETS are near-identical across unrelated docs — word order is
    what distinguishes them, and n-grams carry it (Charikar simhash is
    conventionally computed over shingle features for exactly this
    reason).

    Arrow-batched pandas UDF by design: the per-bit vote loop is a dense
    numpy popcount-style kernel; as a Column expression it would expand
    to a 60-term aggregate tree with the md5 re-evaluated per bit."""
    import numpy as np
    import pandas as pd
    from hashlib import md5 as _md5
    from pyspark.sql.types import LongType, StructField, StructType

    def run(batches):
        masks = (np.uint64(1) << np.arange(SIMHASH_BITS, dtype=np.uint64))
        for pdf in batches:
            out_ids, out_sh = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = (text or "").split()
                toks = {" ".join(ws[i:i + n])
                        for i in range(len(ws) - n + 1)}
                if not toks:
                    out_ids.append(doc_id); out_sh.append(0)
                    continue
                hs = np.array(
                    [int(_md5(t.encode()).hexdigest()[:15], 16)
                     for t in toks], dtype=np.uint64)
                votes = ((hs[:, None] & masks) != 0).sum(axis=0) * 2 \
                    - len(hs)
                sketch = int(masks[votes > 0].sum())
                out_ids.append(doc_id); out_sh.append(sketch)
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sh})

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", LongType())])
    return df.select("doc_id", "text").mapInPandas(run, schema=schema)


def simhash_pairs(df: DataFrame, band_bits: int = 10,
                  max_hamming: int = 5) -> DataFrame:
    """Near-dup pairs by simhash banding: 6 bands of 10 bits; pairs
    agreeing on >=1 band are candidates (catches ALL pairs with
    Hamming distance <= 5 by pigeonhole), then exact Hamming filter."""
    sh = simhash_sketches(df)
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(i), F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1)))
            for i in range(60 // band_bits)
        ])).alias("band"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sh_a"), "band")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("sh_b"), "band")
    cands = (
        a.join(b, "band").filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b").dropDuplicates()
    )
    return (
        cands.withColumn("hamming", F.bit_count(
            F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------- embeddings

def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.4,
                        block_size: int = 4096) -> DataFrame:
    """Pairs with cosine >= threshold over `embedding: array<float>`.

    Plan: broadcast the corpus as one numpy matrix; each Arrow batch of
    rows computes a dense GEMM against it (batch x corpus block) and
    emits only qualifying pairs — vectorized BLAS instead of a per-pair
    interpreted fold, no crossJoin row blowup. Broadcast-side memory is
    |corpus| x dim x 8B (100 TB path: the LSH-bucketed variant in
    simsearch.py replaces the broadcast with a band equi-join)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def run(batches):
        cids, cmat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdf["vec_id"].to_numpy()
            out_a, out_b = [], []
            for lo in range(0, len(cids), block_size):
                sims = q @ cmat[lo:lo + block_size].T
                ai, bi = np.nonzero(sims >= threshold)
                a = qids[ai]
                b = cids[lo:lo + block_size][bi]
                keep = a < b
                out_a.append(a[keep]); out_b.append(b[keep])
            yield pd.DataFrame({
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else []})

    schema = StructType([StructField("vec_a", LongType()),
                         StructField("vec_b", LongType())])
    return emb.select("vec_id", "embedding").mapInPandas(run, schema=schema)
