"""Text-analysis operators for a large-scale training-data pipeline:
tokenization stats, quality signals, language ID, fingerprinting,
ontology classification — all pure Column expressions (JVM-side,
whole-stage codegen; zero Python in the hot path).

Parity note: every function here has an exact ANSI-SQL oracle
(__spark_entry__.oracle_sql). Outputs are integers/strings only — no
floating-point ratios — so cross-engine value hashes match exactly; a
consumer derives ratios downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from askg_spark.ontology import classify_categories

# tiny function-word profiles for the language-ID heuristic; matched as
# whole tokens (not substrings) to keep the signal clean
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to"]),
    ("de", ["der", "die", "das", "und", "nicht"]),
    ("es", ["el", "los", "las", "que", "y"]),
    ("fr", ["le", "la", "les", "et", "ne"]),
    ("zh", ["的", "是", "了", "在", "我"]),
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/null text -> empty array."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# BPE-ish pretokenizer: the GPT-2 split classes (optionally space-
# prefixed letter runs / digit runs / punct runs) minus the lookahead
# tail rule, which RE2 (the DuckDB oracle engine) cannot express —
# whitespace between matches is simply not counted. ASCII classes so
# Java (Spark) and RE2 (DuckDB) agree byte-for-byte.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+"


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count: matches of BPE_TOKEN_RE (letter runs,
    digit runs, punctuation runs — each optionally space-prefixed).
    Tracks BPE vocab token counts far better than whitespace counting
    on punctuation-dense or CJK text; pure JVM regexp_count."""
    return F.regexp_count(F.coalesce(text, F.lit("")),
                          F.lit(BPE_TOKEN_RE)).cast("long")


def quality_counts(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signals as exact integer counts:
    n_tokens, n_stopword_tokens, n_long_tokens (len>20, a gibberish
    signal), n_chars, n_alpha_chars. Ratios are the consumer's division.
    """
    toks = tokens(F.col(text_col))
    stop = F.array([F.lit(w) for _, ws in LANG_MARKERS for w in ws])
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))
               ).cast("long").alias("n_stopword_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 20)
               ).cast("long").alias("n_long_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))
                 ).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(
            F.coalesce(F.col(text_col), F.lit("")), r"[^A-Za-z]", "")
        ).cast("long").alias("n_alpha_chars"),
        # explicit whitespace set: Java \s and RE2 \s differ on \x0B
        F.length(F.regexp_replace(
            F.coalesce(F.col(text_col), F.lit("")),
            r"[A-Za-z0-9 \t\n\r\f]", "")
        ).cast("long").alias("n_punct_chars"),
        bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"),
    )


# Gopher-style quality rules (Rae et al. 2021, table A1 shape) as pure
# integer arithmetic — no floats, so the DuckDB oracle hashes match
# exactly. Fixed emission order = list order.
QUALITY_RULES: list[tuple[str, str]] = [
    ("too_short", "n_tokens < {min_tokens}"),
    ("too_long", "n_tokens > {max_tokens}"),
    # mean word length outside [3, 10]: alpha chars per token, cross-
    # multiplied to stay integral
    ("bad_mean_word_len",
     "n_alpha_chars < 3 * n_tokens OR n_alpha_chars > 10 * n_tokens"),
    # stopword fraction < 0.06  <=>  50*stop < 3*tokens
    ("low_stopword", "50 * n_stopword_tokens < 3 * n_tokens"),
    # symbol-to-char ratio > 0.1
    ("high_symbol", "10 * n_punct_chars > n_chars"),
    # >10% of tokens longer than 20 chars (gibberish / base64 blobs)
    ("gibberish", "10 * n_long_tokens > n_tokens"),
]


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_tokens: int = 25,
                   max_tokens: int = 100_000) -> DataFrame:
    """Gopher-style document quality filter for training-data curation:
    -> (doc_id, keep 0/1, reasons comma-joined in QUALITY_RULES order).

    Every rule is an integer comparison over :func:`quality_counts`
    signals (whole-stage codegen; one scan, no shuffle), so the filter
    costs one projection at any corpus size and the exact SQL oracle
    reproduces it bit-for-bit. Thresholds are args, defaults tuned so
    the synthetic corpus (10-99-token docs) splits instead of
    degenerating to all-keep/all-reject."""
    qc = quality_counts(df, text_col=text_col, id_col=id_col)
    flags = [
        (name, F.expr(tmpl.format(min_tokens=min_tokens,
                                  max_tokens=max_tokens)))
        for name, tmpl in QUALITY_RULES
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in flags])
    return qc.select(
        F.col(id_col),
        (reasons == "").cast("long").alias("keep"),
        reasons.alias("reasons"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-token language ID: per language, count matching tokens;
    argmax with first-listed-language tie-break; 'und' when no marker
    hits. Deterministic, SQL-expressible, vocabulary-driven."""
    toks = tokens(F.col(text_col))

    def marker_score(ws: list[str]):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_score(ws) for lang, ws in LANG_MARKERS}
    # argmax with first-listed tie-break: greatest (score, -position)
    # struct — struct ordering is lexicographic, so max score wins and
    # the earliest language wins ties
    langs = [lang for lang, _ in LANG_MARKERS]
    top = F.greatest(*[
        F.struct(scores[lang].alias("s"), F.lit(-i).alias("p"),
                 F.lit(lang).alias("l"))
        for i, lang in enumerate(langs)
    ])
    best = F.when(top["s"] > 0, top["l"]).otherwise(F.lit("und"))
    return df.select(F.col(id_col), best.alias("lang_pred"))


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Canonical content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    norm = F.trim(F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def categorize_documents(df: DataFrame, text_col: str = "text",
                         name_col: Column | None = None) -> DataFrame:
    """Ontology mention detection (P2 classifier) over free text:
    -> (doc_id, category) one row per matched category."""
    name = name_col if name_col is not None else F.lit(None).cast("string")
    return df.select(
        "doc_id",
        F.explode(classify_categories(name, F.col(text_col))).alias("category"),
    )
