"""Entity linking: exact blocking joins + MinHash-LSH fuzzy candidates
+ exact rescoring -> candidate-match edge set for connected components.

Reference semantics reproduced (decision thresholds are exact):
  * J1 exact repo-url / J2 name+author / J3 content-hash equi-keys
        /root/reference/src/deduplication.py:117-156
  * J4 fuzzy gate: SequenceMatcher(norm_name) > 0.85
        deduplication.py:202-221
  * J5 composite: .3 author + .2 desc[:100] + .2 cat-overlap + .1 lang
        + .2 same-github-org  > 0.7      deduplication.py:223-262
  * J6 cross-registry merge: J5 AND detailed score > 0.9 where detailed =
        .4 name + .2 author + .2 repo-netloc + .1 full-desc + .1 cat-jaccard
        deduplication.py:375-426

Scale design:
  * Exact keys never pairwise-join: each key-group contributes a star to
    its group-min mention (linear edges, no O(group²) blowup).
  * Fuzzy candidates come from banded MinHash LSH over char-3-gram
    sets of norm_name (pure xxhash64 Column expressions — no MLlib,
    no fit pass). Both fuzzy decisions mathematically require
    high name similarity (phase-1 gates on ratio > 0.85; phase-2's
    detailed > 0.9 forces name_sim >= 0.75 because the other components
    sum to at most 0.6), so name-based blocking bounds recall loss; the
    LSH Jaccard-distance threshold is calibrated in tests to recover
    100% of fixture fuzzy pairs.
  * TF-IDF cosine over descriptions (hashed-bucket idf, numpy batch)
    is computed per candidate pair and used as a cheap prune at scale
    (cfg.tfidf_prune); the final decision is the reference-exact difflib
    scorer in an Arrow-batched pandas UDF over candidate pairs only.
"""

from __future__ import annotations

from dataclasses import dataclass
from difflib import SequenceMatcher
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class LinkConfig:
    lsh_num_hashes: int = 16             # minhash functions
    lsh_band_rows: int = 2               # hashes per band (r); b = n/r
    # Drop band buckets larger than this outright (skew guard AND the
    # linear-growth bound: with any fixed cap, candidate pairs are
    # O(cap x bands x n) = O(n); uncapped they grow quadratically with
    # corpus size as same-vocabulary name cliques fatten every bucket —
    # measured 6.7M pairs at 42k mentions, 600M at 423k). Hot buckets
    # are stop-shingle artifacts: true variant pairs co-occur in SMALL
    # rare-shingle buckets too (the minhash of a near-identical shingle
    # set lands on the pair's server-unique shingles in at least one of
    # the 8 bands with high probability), so dropping hot buckets costs
    # ~no recall: cap 2000 -> 256 -> 64 left the accepted edge set
    # bit-identical at 20k servers (28,717 edges) with candidates cut
    # 6.7M -> 2.1M -> 1.0M, and fixture recall stays 100% (tests).
    # 64 -> 32: bit-identical triples at 40k servers (count AND
    # (s,p,o) hash-sum); at 800k servers (2M pages) the two caps
    # diverge by 2,111 of 60.8M triples (0.003% — buckets grow with
    # the corpus, so a fixed cap trims more pairs at larger scale)
    # while cutting the link phase 263s -> 152s at pinned local[8].
    # That loss/cost point is the documented skew policy; raise the
    # cap where recall of rare name variants outweighs join cost.
    lsh_bucket_cap: int = 32
    shingle_size: int = 3
    tfidf_prune: float | None = None     # e.g. 0.05 at 100TB scale; None = off
    name_ratio_gate: float = 0.85        # deduplication.py:215
    composite_threshold: float = 0.7     # deduplication.py:262
    merge_threshold: float = 0.9         # deduplication.py:382


PAIR_COLS = [
    "mention_id", "registry", "name", "author", "description",
    "norm_name", "norm_author", "categories", "implementation_language",
    "repository", "github_org",
]


def exact_edges(mentions: DataFrame) -> DataFrame:
    """J1/J2/J3 as group-star edges: within every non-null key group,
    connect each mention to the group-min mention_id. Connectivity is
    identical to all-pairs, edge count is linear in group size.

    All three key families are melted into ONE (key_type, key) frame
    first: the per-key-family plan (3 x groupBy + 3 x join + union) ran
    ~8 exchanges of the same mention projection; melted, it is one agg
    exchange + one join that reuses the agg's (kt, k) partitioning —
    the exchange count is what dominates this sub-second phase's wall
    in a multi-executor cluster (each AQE-materialized exchange is a
    driver round-trip)."""
    keyed = (
        mentions.select(
            "mention_id",
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("kt"), F.col(k).alias("k"))
                for i, k in enumerate(
                    ["norm_repo", "name_author_key", "content_hash"])
            ])).alias("e"))
        .filter(F.col("e.k").isNotNull() & (F.col("e.k") != ""))
        .select(F.col("e.kt").alias("kt"), F.col("e.k").alias("k"),
                "mention_id")
    )
    roots = keyed.groupBy("kt", "k").agg(F.min("mention_id").alias("root"))
    return (
        keyed.join(roots, ["kt", "k"])
        .filter(F.col("mention_id") != F.col("root"))
        .select(F.col("mention_id").alias("src"),
                F.col("root").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _padded_for_shingles(col, n: int):
    """despace + pad-short-names projection; MUST be materialized as a
    real column before :func:`_shingle_col` (see that docstring).

    NB: rpad TRUNCATES strings longer than its length argument — pad
    only the short-name case (so 1-2 char names still yield a shingle)."""
    d = F.regexp_replace(col, " ", "")
    return F.when(F.length(d) < n, F.rpad(d, n, "_")).otherwise(d)


def _shingle_col(padded, n: int):
    """char n-grams of a pre-padded string COLUMN -> array<string>.

    `padded` must be a plain column reference (project
    :func:`_padded_for_shingles` first): Catalyst inlines a
    higher-order lambda's free expressions per use site, so an inline
    regexp_replace/rpad tree here would re-run once per shingle —
    measured 5.7s -> 1.4s per 1M names at local[8] with the projection
    (the same pathology as dedup.ngrams_from_tokens)."""
    idx = F.sequence(F.lit(1), F.length(padded) - (n - 1))
    return F.array_distinct(F.transform(idx, lambda i: padded.substr(i, F.lit(n))))


def _lsh_pair_ids(mentions: DataFrame, cfg: LinkConfig):
    """Banded MinHash-LSH blocking on char-3-gram sets of norm_name.

    Returns ``(base, pairs)``: the shingled mention frame and the
    NARROW candidate id pairs (ia, ib) as xxhash64 longs with ia < ib.
    Same-norm_name pairs are filtered by the callers (those are covered
    by J2/J3 or are legitimately distinct — reference skips the exact-
    name bucket in the fuzzy scan, deduplication.py:206-209).

    Design notes (all measured on a 22k-mention corpus):
    * Shingles come from the DESPACED norm_name — the reference's fuzzy
      matches are overwhelmingly separator/affix variants of one name
      ("orbit bridge 3" / "orbitbridge3"), and spaces shift every char
      shingle; despaced, variant pairs have near-identical shingle sets.
    * Banding r=2 (pairs of minhashes) instead of MLlib's
      `approxSimilarityJoin` (single-hash tables, r=1): with r=1 a
      random pair at background Jaccard j becomes a bucket pair with
      probability ~n*j — common shingles make hot buckets whose
      quadratic join stragglers dominate the whole pipeline wall time.
      r=2 squares the background rate (j²·b) while keeping recall at
      the match range: P(candidate | J=0.5) = 1-(1-0.25)^8 = 0.90,
      J=0.8 -> 0.9998; fixture recall stays 100% (tests).
    * `lsh_bucket_cap` drops hotter buckets outright — the explicit,
      logged skew guard: a pair supported ONLY by a stop-shingle bucket
      is lost, everything else keeps its other 7 bands.
    * No exact-distance post-filter: the scorer's cheap name-ratio gate
      rejects non-matches at ~1us/pair, cheaper than computing exact
      Jaccard on feature vectors for the same pairs.
    * Minhashes are pure Column expressions — h_i(S) = min over
      shingles s of xxhash64(i, s) — entirely inside whole-stage
      codegen, no fit pass, no per-row MLlib vector allocation. The
      round-2a version used HashingTF + MinHashLSH; the event log
      showed that subtree burning 1,658 core-s (83% JVM CPU + 255s GC)
      at 423k mentions — the 16 `vector_to_array(minhashes[i])`
      projections re-evaluated the LSH ScalaUDF per reference under
      the band explode (no CSE), each call allocating 16 DenseVectors
      behind a fresh 2^18-dim sparse TF vector. The xxhash64 minhash
      is the same LSH family (min over a universal hash of the
      shingle set) at ~1% of the cost, and removes the lsh.fit
      barrier from the link phase entirely.
    """
    base = (
        mentions.filter(F.col("norm_name").isNotNull() & (F.length("norm_name") >= 2))
        .select(*PAIR_COLS)
        .withColumn("_padded", _padded_for_shingles(F.col("norm_name"),
                                                    cfg.shingle_size))
        .withColumn("shingles", _shingle_col(F.col("_padded"),
                                             cfg.shingle_size))
        .drop("_padded")
    )
    n_bands = cfg.lsh_num_hashes // cfg.lsh_band_rows
    # NB: F.transform invokes the lambda eagerly while the Column is
    # being built, so `i` is captured by value here (same pattern as
    # dedup.minhash_pairs).
    mh = F.array(*[
        F.array_min(F.transform("shingles",
                                lambda s: F.xxhash64(F.lit(i), s)))
        for i in range(cfg.lsh_num_hashes)
    ])
    # NARROW pair generation (same scale pattern as relations.py): the
    # band explode, the band exchange and the pair dropDuplicates all
    # carry only idx = xxhash64(mention_id) longs — the round-2a
    # version shuffled two full mention structs (name, description, …)
    # per band row and per candidate pair, which left the link phase
    # flat across core counts (shuffle-byte-bound, ~45s at 21k
    # mentions whether 8 or 32 cores). Structs attach AFTER the narrow
    # dedup via two joins against the (tiny) mention dim, and the pair
    # is re-oriented to mention_id order there. Collision bound as in
    # relations.py (~n^2/2^65).
    # band key = xxhash64(band_index, minhash_r ...) — a LONG, not a
    # concat string: the band exchange + in-bucket pair generation is
    # the biggest JVM stage of the link phase (330 CPU-s at 423k
    # mentions on ~45-byte string keys before hash-coding); long keys
    # hash/compare/sort in registers. A 64-bit band collision
    # (~(b*n)^2/2^65) only creates a spurious candidate pair, which the
    # exact scorer rejects.
    # nh = hash of the (spaced) norm_name rides along so SAME-NAME
    # candidate pairs are dropped inside the per-bucket pair explode,
    # before the pair dropDuplicates exchange. Same-norm_name pairs are
    # filtered by every consumer anyway (reference skips the exact-name
    # bucket, deduplication.py:206-209), but they are the worst
    # candidates to generate: identical names -> identical shingle sets
    # -> identical minhashes -> the pair collides in ALL b bands (b
    # rows into the dedup shuffle each), and registry cross-listings
    # make same-name groups of 3-4 per server corpus-wide. Filtering on
    # the 8-byte hash keeps the pair frame narrow; a 64-bit collision
    # only drops a would-be candidate whose names differ (P ~ n²/2^65,
    # and the pair usually survives via its other bands' non-colliding
    # partners).
    bands = base.withColumn("_mh", mh).select(
        F.xxhash64("mention_id").alias("idx"),
        F.xxhash64("norm_name").alias("nh"),
        F.explode(F.array(*[
            F.xxhash64(F.lit(i), *[
                F.element_at("_mh", i * cfg.lsh_band_rows + r + 1)
                for r in range(cfg.lsh_band_rows)
            ])
            for i in range(n_bands)
        ])).alias("band"),
    )
    # ONE exchange for the whole blocking step. The round-2g version
    # shuffled the band frame three times (hot-bucket count agg +
    # both sides of a band self-join) behind an eagerly-built persist;
    # the local-cluster[4,8] event log showed that chain as ~10
    # consecutive 128-task stages at 3-26% parallel efficiency — each
    # AQE-materialized exchange is a driver round-trip on a frame this
    # narrow, so exchange COUNT, not bytes, dominated the link wall.
    # Here the band exchange happens once (the window's hash partition
    # + in-partition sort): the bucket-size count, the hot-bucket drop
    # (sz > cap — identical semantics to the old anti-join) and the
    # per-bucket pair generation all run inside that one stage.
    # collect_list is memory-safe because it only ever sees buckets
    # already filtered to <= cap rows (the window count runs BEFORE
    # the collect; hot stop-shingle buckets never materialize a list),
    # and WindowExec sort-spills, so a pathological bucket costs disk,
    # not heap. Per-bucket pair explode is O(cap^2) = <= 1024 structs.
    from pyspark.sql import Window

    kept = bands.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy("band")))
    if cfg.lsh_bucket_cap is not None:
        kept = kept.filter(F.col("sz") <= cfg.lsh_bucket_cap)
    grouped = kept.groupBy("band").agg(
        F.collect_list(F.struct("idx", "nh")).alias("ms"))
    pair_arr = F.filter(
        F.flatten(F.transform("ms", lambda a: F.transform(
            F.col("ms"),
            lambda b: F.struct(a["idx"].alias("ia"), b["idx"].alias("ib"),
                               a["nh"].alias("na"), b["nh"].alias("nb"))))),
        lambda p: (p["ia"] < p["ib"]) & (p["na"] != p["nb"]))
    # Hash-repartition on the pair key itself: the dedup agg reuses
    # this clustering (no second exchange), partitions are balanced by
    # construction (dedup keys are unique), and the explicit width
    # pins the downstream Python gate stage's parallelism — the same
    # guarantee _cpu_partitioned gave, minus its extra round-robin
    # exchange.
    par = base.sparkSession.sparkContext.defaultParallelism
    pairs = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.ia").alias("ia"), F.col("p.ib").alias("ib"))
        .repartition(2 * par, "ia", "ib")
        .dropDuplicates(["ia", "ib"])
    )
    return base, pairs


def lsh_candidates(mentions: DataFrame, cfg: LinkConfig) -> DataFrame:
    """Candidate pairs as (a struct, b struct) with a.mention_id <
    b.mention_id — the struct surface used by the tests and ad-hoc
    callers. The pipeline path (`fuzzy_edges`) stays narrow instead:
    attaching two full structs to every one of ~10^2 x overgenerated
    candidates is the single largest Arrow/shuffle cost in the link
    phase, and ~99% of candidates die on the name gate anyway."""
    base, pairs = _lsh_pair_ids(mentions, cfg)
    dims = base.select(F.xxhash64("mention_id").alias("idx"),
                        F.struct(*PAIR_COLS).alias("m"))
    cands = (
        pairs
        .join(dims.select(F.col("idx").alias("ia"), F.col("m").alias("x")),
              "ia")
        .join(dims.select(F.col("idx").alias("ib"), F.col("m").alias("y")),
              "ib")
        .filter(F.col("x.norm_name") != F.col("y.norm_name"))
    )
    lt = F.col("x.mention_id") < F.col("y.mention_id")
    return cands.select(
        F.when(lt, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(lt, F.col("y")).otherwise(F.col("x")).alias("b"),
    )


def _ratio(x: str | None, y: str | None) -> float:
    if x is None or y is None:
        return 0.0
    return SequenceMatcher(None, x, y).ratio()


def _ratio_above(x: str | None, y: str | None, floor: float) -> float:
    """Exact ratio if it can exceed ``floor``, else -1 (rejected).

    difflib's own documented cascade: quick_ratio (character-multiset
    overlap, O(n)) is a proven upper bound on ratio (O(n^2)-ish), so a
    pair whose quick_ratio <= floor is rejected without running the
    full matcher — decision-identical, ~10x cheaper for the LSH
    candidate bulk whose names share shingles but not characters."""
    if x is None or y is None:
        return -1.0
    sm = SequenceMatcher(None, x, y)
    if sm.quick_ratio() <= floor:
        return -1.0
    return sm.ratio()


TFIDF_DIM = 1 << 14


def description_idf(mentions: DataFrame) -> tuple[dict[int, float], int]:
    """One aggregation over the corpus: hashed-token document
    frequencies of `description` -> {bucket: idf} (smoothed ln).
    The dict is tiny (<= TFIDF_DIM entries) and broadcast to the
    scorer. Tokens are lowercased whitespace words; bucket =
    crc32(token) % TFIDF_DIM — same hash in the Python scorer.

    The per-BUCKET aggregation happens in Spark (crc32 % TFIDF_DIM is
    a JVM expression), so the driver collects at most TFIDF_DIM =
    16,384 rows regardless of corpus vocabulary size — at web scale
    the distinct-token set alone would exceed driver memory (round-1
    collected every distinct token; fixed per VERDICT r1 item 9).
    Colliding buckets keep the LARGER document frequency (smaller,
    more conservative idf), same rule as before."""
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.coalesce(F.col("description"), F.lit("")))),
                r"\s+"))
    rows = (
        mentions.select(F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
        .groupBy(F.pmod(F.crc32(F.encode("tok", "utf-8")),
                        F.lit(TFIDF_DIM)).cast("int").alias("bucket"))
        .agg(F.max("df_").alias("df_"))
        .collect()
    )
    n_docs = mentions.count()
    import math
    idf = {r["bucket"]: math.log((n_docs + 1) / (r["df_"] + 1)) + 1.0
           for r in rows}
    return idf, n_docs


def _min_gate(cfg: LinkConfig) -> float:
    """Floor any accepted pair's name_ratio must exceed.

    detailed = 0.4*name + (terms summing to <= 0.6): the cross-registry
    branch can only fire when 0.4*name_ratio > merge_threshold - 0.6;
    the same-registry branch needs name_ratio > name_ratio_gate."""
    min_name_high = max(0.0, (cfg.merge_threshold - 0.6) / 0.4)
    return min(cfg.name_ratio_gate, min_name_high)


def _gate(name_ratio: float, a_registry, b_registry,
          cfg: LinkConfig) -> bool:
    """True iff a pair with this name_ratio can still be accepted by
    either branch (fuzzy_dup needs > name_ratio_gate outright; the
    cross-registry high_merge branch only needs > (merge_threshold -
    0.6) / 0.4). The name ratio is a ~15-char compare; the description
    ratios in the full scorer are 100+-char quadratic difflib calls —
    gating first removes them for the bulk of LSH candidates."""
    if name_ratio <= _min_gate(cfg):
        return False
    if name_ratio <= cfg.name_ratio_gate and a_registry == b_registry:
        return False
    return True


def _score_one(r, name_ratio: float, cfg: LinkConfig) -> tuple[bool, bool]:
    """Full reference scoring for one gated pair (namedtuple with
    a_*/b_* fields) -> (fuzzy_dup, high_merge). Symmetric in a/b."""
    # --- composite (J5), deduplication.py:223-262
    comp = 0.0
    if r.a_author and r.b_author:
        comp += _ratio(r.a_norm_author, r.b_norm_author) * 0.3
    if r.a_description and r.b_description:
        comp += _ratio(r.a_description.lower()[:100],
                       r.b_description.lower()[:100]) * 0.2
    # array columns arrive as numpy arrays (ambiguous truth value)
    ca = set(r.a_categories) if r.a_categories is not None else set()
    cb = set(r.b_categories) if r.b_categories is not None else set()
    if ca and cb:
        comp += (len(ca & cb) / max(len(ca), len(cb))) * 0.2
    if (r.a_implementation_language and r.b_implementation_language
            and r.a_implementation_language == r.b_implementation_language):
        comp += 0.1
    if r.a_repository and r.b_repository:
        pa = str(r.a_repository).split("/")
        pb = str(r.b_repository).split("/")
        if len(pa) >= 4 and len(pb) >= 4 and pa[3] == pb[3]:
            comp += 0.2
    similar = comp > cfg.composite_threshold
    fuzzy_dup = name_ratio > cfg.name_ratio_gate and similar
    # --- detailed (J6), deduplication.py:384-426
    det = name_ratio * 0.4
    if r.a_author and r.b_author:
        det += _ratio(r.a_norm_author, r.b_norm_author) * 0.2
    if r.a_repository and r.b_repository:
        na = str(r.a_repository).split("/")
        nb = str(r.b_repository).split("/")
        if len(na) >= 3 and len(nb) >= 3 and na[2] == nb[2]:
            det += 0.2   # same netloc
    if r.a_description and r.b_description:
        det += _ratio(r.a_description.lower(), r.b_description.lower()) * 0.1
    if ca and cb and (ca | cb):
        det += (len(ca & cb) / len(ca | cb)) * 0.1
    high = (similar and det > cfg.merge_threshold
            and r.a_registry != r.b_registry)
    return fuzzy_dup, high


def _make_tfidf_cos(idf: dict[int, float] | None):
    """Vectorized hashed-TF-IDF cosine over two description Series;
    pairs where either side lacks a description score 1.0 (never
    pruned — the reference's composite score treats missing
    descriptions as no-evidence, not negative evidence)."""
    import math
    import zlib

    import numpy as np

    default_idf = math.log(2.0) + 1.0

    def cos(col_a: pd.Series, col_b: pd.Series) -> "np.ndarray":
        def vec(text):
            if not text:
                return None
            buckets: dict[int, float] = {}
            for tok in set(text.lower().split()):
                b = zlib.crc32(tok.encode()) % TFIDF_DIM
                buckets[b] = (idf or {}).get(b, default_idf)
            norm = math.sqrt(sum(w * w for w in buckets.values())) or 1.0
            return {b: w / norm for b, w in buckets.items()}

        out = np.ones(len(col_a))
        for i, (ta, tb) in enumerate(zip(col_a, col_b)):
            va, vb = vec(ta), vec(tb)
            if va is None or vb is None:
                out[i] = 1.0          # no evidence -> never pruned
            else:
                out[i] = sum(w * vb.get(b, 0.0) for b, w in va.items())
        return out

    return cos


def _cpu_partitioned(df: DataFrame) -> DataFrame:
    """Round-robin repartition to 2x the session's parallelism before
    a CPU-bound Python stage: AQE coalesces upstream join output by
    BYTES (64 MB advisory), and a few MB of candidate pairs collapse
    to 1-2 partitions — which serializes difflib scoring on one Python
    worker no matter how many cores the cluster has (measured: the
    link phase was FLAT from 8 to 32 cores before this). 2x instead of
    1x: row counts are balanced but per-pair difflib cost is not, and
    with exactly one wave the slowest task idles every other slot for
    its tail (two waves halve the straggler exposure at negligible
    batch overhead)."""
    return df.repartition(
        2 * df.sparkSession.sparkContext.defaultParallelism)


def _ratio_bound_filter(df: DataFrame, a_name: str, b_name: str,
                        threshold: float) -> DataFrame:
    """JVM-side exact prefilter: difflib ratio is at most
    2*min(|a|,|b|)/(|a|+|b|) (every matched char is in both strings),
    so pairs whose bound <= threshold can never pass the name gate —
    dropped before any Arrow transfer or Python work."""
    la, lb = F.length(a_name), F.length(b_name)
    return df.filter((F.lit(2) * F.least(la, lb) / (la + lb))
                     > F.lit(threshold))


# byte -> histogram bucket for _np_quick_ratio: the 37 closed-charset
# chars get distinct buckets (exact multiset counts); any foreign byte
# maps to a shared 38th bucket, which can only OVERcount the
# intersection (min of sums >= sum of mins) — still a sound upper
# bound on ratio, so rejection stays decision-identical.
def _byte_bucket_lut():
    import numpy as np
    lut = np.full(256, 37, dtype=np.int64)
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz0123456789 "):
        lut[ord(ch)] = i
    return lut


_BYTE_BUCKET = _byte_bucket_lut()


def _np_quick_ratio(a: "pd.Series", b: "pd.Series") -> "object":
    """difflib SequenceMatcher.quick_ratio computed EXACTLY for a whole
    Arrow batch in vectorized numpy: 2 * multiset-char-intersection /
    (|a|+|b|) — the same 2.0*M/T double difflib computes
    (difflib.py _calculate_ratio), so rejecting `qr <= floor` here is
    decision-identical to the per-row cascade in `_ratio_above` while
    costing ~2.4us/pair instead of ~16-20us (microbenched on 1M pairs;
    no SequenceMatcher object, no per-row Counter). norm_name's charset is closed ASCII (lower ->
    strip [^a-z0-9\\s] -> collapse spaces), so utf-8 bytes == chars and
    a 128-wide byte histogram is the exact multiset.

    Returns (qr ndarray, lengths la+lb ndarray); rows where both
    strings are empty get qr = 1.0 (difflib: two empty sequences have
    ratio 1.0).

    Two JVM-side variants of this gate were measured and REJECTED at a
    423k-mention corpus before landing here (identical decisions, worse
    plans): array<int> histograms with zip_with/aggregate are
    interpreted per element (~30-50us/pair, ~5,000 core-s), and 37
    scalar int histogram columns are codegen-cheap per pair but fatten
    the per-mention gate dimension past the AQE broadcast threshold —
    both id joins fell back to sort-merge, sorting the ~10^7-row
    candidate frame twice (link phase 119s -> 356s). The narrow
    broadcast-join plan + batch numpy inside the already-necessary
    Python stage keeps the join shape and removes ~95% of the difflib
    work."""
    import numpy as np

    n = len(a)
    # Histogram per UNIQUE name, not per pair row: every mention
    # appears in many candidate pairs, so a batch of 10k pairs holds
    # only a few thousand distinct names — factorize once, build the
    # small (uniques x 38) count matrix, then GATHER per pair. The
    # first cut of this function histogrammed per pair row at 256
    # buckets (np.bincount minlength = rows*256): ~100 MB of matrix
    # traffic per 10k-pair batch made it memory-bandwidth-bound at
    # ~41us/pair — 2.5x SLOWER than the difflib loop it replaced.
    codes, uniques = pd.factorize(
        pd.concat([a, b], ignore_index=True), sort=False)
    u = np.asarray(uniques, dtype=object)
    ulens = np.fromiter((len(x) for x in u), dtype=np.int64, count=len(u))
    buf = np.frombuffer(("".join(u)).encode("utf-8"), dtype=np.uint8)
    rows = np.repeat(np.arange(len(u), dtype=np.int64), ulens)
    hist = np.bincount(rows * 38 + _BYTE_BUCKET[buf],
                       minlength=len(u) * 38).reshape(len(u), 38)
    ca, cb = codes[:n], codes[n:]
    inter = np.minimum(hist[ca], hist[cb]).sum(axis=1)
    tot = ulens[ca] + ulens[cb]
    qr = np.where(tot > 0, 2.0 * inter / np.maximum(tot, 1), 1.0)
    return qr


def score_pairs(cands: DataFrame, cfg: LinkConfig,
                idf: dict[int, float] | None = None) -> DataFrame:
    """Arrow-batched exact rescoring of struct candidate pairs with the
    reference's difflib formulas; returns pairs that are edges.

    Test/ad-hoc surface over `lsh_candidates` structs; the pipeline
    uses the two-stage `fuzzy_edges` (same helpers, same decisions —
    parity asserted in tests) to avoid shipping full structs for
    pairs the name gate rejects.

    When ``cfg.tfidf_prune`` is set (the 100 TB path), a vectorized
    TF-IDF cosine over the pair's descriptions runs FIRST (numpy over
    the whole Arrow batch) and pairs below the prune threshold skip
    the per-pair difflib scoring entirely — the quadratic-ish ratio
    calls are the expensive part, the hashed cosine is a batch GEMV."""
    flat = cands.select(
        *[F.col(f"a.{c}").alias(f"a_{c}") for c in PAIR_COLS],
        *[F.col(f"b.{c}").alias(f"b_{c}") for c in PAIR_COLS],
    )
    flat = _ratio_bound_filter(flat, "a_norm_name", "b_norm_name",
                               _min_gate(cfg))
    prune = cfg.tfidf_prune
    tfidf_cos = _make_tfidf_cos(idf)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if prune is not None and len(pdf):
                cos = tfidf_cos(pdf["a_description"], pdf["b_description"])
                pdf = pdf[cos >= prune]
            out = {"src": [], "dst": [], "fuzzy_dup": [], "high_merge": []}
            min_gate = _min_gate(cfg)
            for r in pdf.itertuples(index=False):
                floor = (cfg.name_ratio_gate
                         if r.a_registry == r.b_registry else min_gate)
                name_ratio = _ratio_above(
                    r.a_norm_name, r.b_norm_name, floor)
                if name_ratio < 0 or not _gate(
                        name_ratio, r.a_registry, r.b_registry, cfg):
                    continue
                fuzzy_dup, high = _score_one(r, name_ratio, cfg)
                if fuzzy_dup or high:
                    out["src"].append(r.a_mention_id)
                    out["dst"].append(r.b_mention_id)
                    out["fuzzy_dup"].append(fuzzy_dup)
                    out["high_merge"].append(high)
            yield pd.DataFrame(out)

    return _cpu_partitioned(flat).mapInPandas(
        run, schema="src string, dst string, fuzzy_dup boolean, high_merge boolean")


def fuzzy_edges(mentions: DataFrame, cfg: LinkConfig,
                idf: dict[int, float] | None = None) -> DataFrame:
    """Pipeline fuzzy path: LSH narrow pairs -> batch-numpy name gate ->
    full scoring, all in one lazy plan.

    Scale design: ~99% of LSH candidates die on the name-ratio gate
    (measured 0.75% pass rate at 21k mentions), so the gate stage
    ships ONLY (ids, norm_name, registry) to Python — preceded by the
    JVM ratio-bound prefilter — and the 22-column attribute structs
    are joined to the tiny survivor set afterwards. Inside the gate
    stage the quick_ratio rejection runs EXACTLY but vectorized over
    the whole Arrow batch (`_np_quick_ratio`); per-row difflib only
    touches the few % of pairs whose quick_ratio clears the floor.
    Emits the same (src, dst, fuzzy_dup, high_merge) decisions as
    `score_pairs` on `lsh_candidates` (shared gate/scorer helpers;
    parity-tested)."""
    _, pairs = _lsh_pair_ids(mentions, cfg)
    gate_dim = mentions.select(F.xxhash64("mention_id").alias("idx"),
                               "norm_name", "registry")

    def side(tag: str, key: str) -> DataFrame:
        return gate_dim.select(
            F.col("idx").alias(key),
            F.col("norm_name").alias(f"{tag}_norm_name"),
            F.col("registry").alias(f"{tag}_registry"))

    # The NARROW pairs (two longs, ~32B/row) arrive already hash-
    # partitioned 2x-cores wide from _lsh_pair_ids' fused
    # repartition+dedup, so the gate-dim joins land in the SAME stage
    # as the Python gate with no further exchange (the round-2b
    # version repartitioned AFTER the joins — 1.9 GB / 145 core-s of
    # shuffle write at 423k mentions; round-2g round-robined before
    # them, one more exchange than the fused plan needs). The gate
    # dims broadcast at bench scale (AQE runtime decision under the
    # 64 MB threshold); where they don't (10^9+ mentions), AQE falls
    # back to shuffled joins — the narrow pair frame is still the
    # cheapest side to rebalance. The gate itself emits only (ia, ib,
    # name_ratio); mention ids attach with the full payload joins on
    # the ~1% survivor set below.
    gated = (
        pairs
        .join(side("a", "ia"), "ia").join(side("b", "ib"), "ib")
        .filter(F.col("a_norm_name") != F.col("b_norm_name"))
    )
    gated = _ratio_bound_filter(gated, "a_norm_name", "b_norm_name",
                                _min_gate(cfg))

    def gate_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        min_gate = _min_gate(cfg)
        gate = cfg.name_ratio_gate
        for pdf in batches:
            if not len(pdf):
                continue
            # exact quick_ratio for the whole batch in numpy, with the
            # per-pair floor (same-registry pairs must clear the
            # name_ratio_gate, cross-registry only min_gate): the
            # identical rejection `_ratio_above` makes per row, at
            # ~2.4us/pair instead of ~16-20us (1M-pair microbench)
            qr = _np_quick_ratio(pdf["a_norm_name"], pdf["b_norm_name"])
            floors = np.where(
                pdf["a_registry"].to_numpy() == pdf["b_registry"].to_numpy(),
                gate, min_gate)
            pdf = pdf[qr > floors]
            out = {"ia": [], "ib": [], "name_ratio": []}
            for r in pdf.itertuples(index=False):
                floor = (gate if r.a_registry == r.b_registry else min_gate)
                name_ratio = _ratio_above(
                    r.a_norm_name, r.b_norm_name, floor)
                if name_ratio < 0 or not _gate(
                        name_ratio, r.a_registry, r.b_registry, cfg):
                    continue
                out["ia"].append(r.ia)
                out["ib"].append(r.ib)
                out["name_ratio"].append(name_ratio)
            yield pd.DataFrame(out)

    survivors = gated.mapInPandas(
        gate_stage, schema="ia long, ib long, name_ratio double")

    full_a = mentions.select(
        F.xxhash64("mention_id").alias("ia"),
        *[F.col(c).alias(f"a_{c}") for c in PAIR_COLS])
    full_b = mentions.select(
        F.xxhash64("mention_id").alias("ib"),
        *[F.col(c).alias(f"b_{c}") for c in PAIR_COLS])
    full_in = survivors.join(full_a, "ia").join(full_b, "ib")
    prune = cfg.tfidf_prune
    tfidf_cos = _make_tfidf_cos(idf)

    def full_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if prune is not None and len(pdf):
                cos = tfidf_cos(pdf["a_description"], pdf["b_description"])
                pdf = pdf[cos >= prune]
            out = {"src": [], "dst": [], "fuzzy_dup": [], "high_merge": []}
            for r in pdf.itertuples(index=False):
                fuzzy_dup, high = _score_one(r, r.name_ratio, cfg)
                if fuzzy_dup or high:
                    # orient by mention_id (scoring is symmetric in a/b)
                    lo, hi = sorted((r.a_mention_id, r.b_mention_id))
                    out["src"].append(lo)
                    out["dst"].append(hi)
                    out["fuzzy_dup"].append(fuzzy_dup)
                    out["high_merge"].append(high)
            yield pd.DataFrame(out)

    return _cpu_partitioned(full_in).mapInPandas(
        full_stage,
        schema="src string, dst string, fuzzy_dup boolean, high_merge boolean")


def candidate_edges(mentions: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Full edge set for canonicalization: exact-key stars + fuzzy pairs."""
    cfg = cfg or LinkConfig()
    exact = exact_edges(mentions)
    idf = (description_idf(mentions)[0]
           if cfg.tfidf_prune is not None else None)
    fuzzy = fuzzy_edges(mentions, cfg, idf).select("src", "dst")
    return exact.unionByName(fuzzy).dropDuplicates(["src", "dst"])
