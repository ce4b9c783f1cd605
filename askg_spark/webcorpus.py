"""documents -> pages: render the driver's `documents` table as a
Common-Crawl-style `pages` corpus (BASELINE.json input_hint shape).

The KG pipeline's mandated input is an Iceberg/parquet table
``pages(url, warc_ts, html, text, lang)``; the sandbox testdata ships a
``documents(doc_id, text, lang, source, n_chars)`` table instead. This
module renders each document as a deterministic mcp.so-style detail page
(the page family of /root/reference/src/scrapers.py:611-690) so the full
pipeline — extraction, classification, linking, canonicalization,
relations, triples — runs over driver-scaled data at any sf.

Design notes:
  * Rendering is a pure Column-expression projection — no UDF, no
    shuffle; the scan stays columnar end-to-end.
  * Page name is ``<md5(doc_id)[:8]>-<doc_id>`` — the hash prefix keeps
    pairwise name similarity below the fuzzy-match gate (0.85), so a
    corpus with no planted duplicates canonicalizes 1:1 and the whole
    run has a closed-form SQL oracle (see __spark_entry__.oracle_sql).
  * warc_ts is a deterministic function of doc_id (fixed epoch + id
    seconds): identical at any parallelism, partition-prunable by day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EPOCH = "2025-06-01 00:00:00"


def doc_name(doc_id: F.Column) -> F.Column:
    """`<md5-prefix>-<id>` — collision-free, low mutual similarity."""
    return F.concat(
        F.substring(F.md5(doc_id.cast("string")), 1, 8),
        F.lit("-"), doc_id.cast("string"))


def render_glama_pages(documents: DataFrame) -> DataFrame:
    """documents -> planted cross-registry duplicates in the glama
    JSON-API page family (extract._parse_glama; scrapers.py:768-830).

    Each page carries the SAME (name, author) as render_pages' mcp.so
    page for the doc — an exact J2 (name+author) match — plus a
    repository URL the mcp.so page lacks, so the canonical merge's
    prefer-non-empty fill (A2) and the global-ID cascade's repo-id
    branch (P9/P11) are exercised on an oracle-checkable path: the
    repo-id normalizes to the same `author/name` id the mcp.so-only
    entity would get, keeping the group id closed-form in SQL."""
    name = doc_name(F.col("doc_id"))
    author = F.col("source")
    body = F.to_json(F.struct(F.array(F.struct(
        name.alias("name"),
        author.alias("author"),
        F.concat(F.lit("https://github.com/"), author, F.lit("/"), name
                 ).alias("repository"),
    )).alias("servers")))
    return documents.select(
        F.concat(F.lit("https://glama.ai/api/servers/"), name).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double") + F.lit(0.5))
         ).alias("warc_ts"),
        body.cast("binary").alias("html"),
        body.alias("text"),
        F.col("lang").alias("lang"),
    )


def render_resource_pages(documents: DataFrame) -> DataFrame:
    """Planted resources[]/prompts[] sub-entities in the glama JSON
    page family (extract._parse_glama; models.py:47-57 MCPResource /
    MCPPrompt) so the S10 sub-entity path — parse -> keyed merge
    (canonicalize.keyed_merge, resources by uri / prompts by name) ->
    HAS_RESOURCE / HAS_PROMPT triples (neo4j_integration.py:269-292)
    — runs under a closed-form SQL oracle.

    Per doc: one always-present resource (`file:///data/<name>/
    readme.txt`), a second resource on even doc_ids, and one prompt
    (`<name>-usage`) on doc_ids divisible by 3 — each obj a pure
    string function of (doc_id, source), mirrored exactly by
    __spark_entry__.oracle_sql()['kg_resource_triples']. The page
    carries the same repository as render_glama_pages, so the
    global-ID cascade lands on the closed-form `author/name` id."""
    name = doc_name(F.col("doc_id"))
    author = F.col("source")
    res0 = F.struct(
        F.concat(F.lit("file:///data/"), name, F.lit("/readme.txt")
                 ).alias("uri"),
        F.lit("readme").alias("name"),
        F.lit("bundled readme").alias("description"),
        F.lit("text/plain").alias("mime_type"))
    res1 = F.struct(
        F.concat(F.lit("https://"), author, F.lit(".example.com/"), name,
                 F.lit("/api.json")).alias("uri"),
        F.lit("api-spec").alias("name"),
        F.lit(None).cast("string").alias("description"),
        F.lit("application/json").alias("mime_type"))
    resources = F.when(F.col("doc_id") % 2 == 0, F.array(res0, res1)) \
                 .otherwise(F.array(res0))
    prompt0 = F.struct(
        F.concat(name, F.lit("-usage")).alias("name"),
        F.lit("usage guide").alias("description"))
    # no otherwise -> NULL: to_json drops the field, the parser's
    # `s.get("prompts") or []` treats absent as none-present
    prompts = F.when(F.col("doc_id") % 3 == 0, F.array(prompt0))
    body = F.to_json(F.struct(F.array(F.struct(
        name.alias("name"),
        author.alias("author"),
        F.concat(F.lit("https://github.com/"), author, F.lit("/"), name
                 ).alias("repository"),
        resources.alias("resources"),
        prompts.alias("prompts"),
    )).alias("servers")))
    return documents.select(
        F.concat(F.lit("https://glama.ai/api/servers/res-"), name
                 ).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double") + F.lit(0.75))
         ).alias("warc_ts"),
        body.cast("binary").alias("html"),
        body.alias("text"),
        F.col("lang").alias("lang"),
    )


def _esc(col: F.Column) -> F.Column:
    """HTML attribute escaping for double-quoted attributes. `>` MUST
    be escaped too: the engine's regex tag stripper ends a tag at the
    first `>`, so a raw `>` inside an attribute value truncates the
    tag and leaks the attribute tail into the visible text — breaking
    the byte-identity invariant (caught by
    test_rendered_page_families_text_matches_visible)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.coalesce(col, F.lit("")), "&", "&amp;"),
                "<", "&lt;"),
            ">", "&gt;"),
        '"', "&quot;")


def _fuzzy_page(documents: DataFrame, variant: bool) -> DataFrame:
    stem = F.concat(F.md5(F.col("doc_id").cast("string")), F.lit("-"),
                    F.col("doc_id").cast("string"))
    name = F.concat(stem, F.lit("-qz" if variant else "-qq"))
    author = F.col("source")
    repo = F.concat(F.lit("https://github.com/"), author, F.lit("/"),
                    stem, F.lit("-qq-alt" if variant else "-qq"))
    title = F.concat(name, F.lit(" by "), author)
    esc = _esc(F.col("text"))
    html_str = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title>"),
        F.lit('<meta name="description" content="'), esc, F.lit('">'),
        F.lit("</head><body><h1>"), title, F.lit('</h1><a href="'),
        repo, F.lit('">code</a></body></html>'),
    )
    visible = F.concat(title, F.lit("\n"), title, F.lit("\ncode"))
    return documents.select(
        F.concat(F.lit("https://mcp.so/server/"), name, F.lit("/"), author
                 ).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double")
                           + F.lit(0.25 if variant else 0.0))
         ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        visible.alias("text"),
        F.col("lang").alias("lang"),
    )


def render_fuzzy_pages(documents: DataFrame) -> DataFrame:
    """Planted FUZZY near-duplicates for the J4/J5 linking path — no
    exact key fires, only LSH blocking + difflib scoring can link them.

    Every doc renders as an mcp.so page whose name is the full-width
    md5 stem (~38 chars normalized: the 3-gram shingle Jaccard of a
    one-final-char edit is (L-3)/(L-1) ~ 0.95, so the 8-band r=2
    minhash catches every planted pair with P(miss) ~ 4e-8 per pair —
    and deterministically so under the fixed xxhash64 seeds); every
    10th doc renders AGAIN with the final name char edited
    ('-qq' -> '-qz': no classifier keyword ends in 'q' or 'z', so the
    category sets stay identical) and a different repository under the
    SAME github owner. Exact keys all differ (repo url, name+author,
    content hash); the composite score (deduplication.py:223-262) is
    closed-form: author 1.0x0.3 + desc 1.0x0.2 (iff the doc text is
    non-empty) + categories 1.0x0.2 + same-github-org 0.2 = 0.9 > 0.7
    -> merge, or exactly 0.7 when the text is empty -> NO merge (the
    reference's strict inequality) — both branches mirrored by the SQL
    oracle (__spark_entry__.oracle_sql()['kg_fuzzy_groups'])."""
    base = _fuzzy_page(documents, variant=False)
    dup = _fuzzy_page(
        documents.filter(F.col("doc_id") % 10 == 0), variant=True)
    return base.unionByName(dup)


def render_github_pages(documents: DataFrame) -> DataFrame:
    """documents -> deterministic github repo pages for the S1 path
    (extract._parse_github; scrapers.py:160-273, MCP-indicator gate
    scrapers.py:309-337) under a closed-form SQL oracle: every field
    the parser emits — name/author from the url path, description from
    the first <p>, language from the 'implementation in X.' sentence,
    stars, one <li> tool (+ a second on even doc_ids) — is a pure
    string function of (doc_id, source)."""
    name = doc_name(F.col("doc_id"))
    author = F.col("source")
    desc = F.concat(F.lit("MCP server "), name, F.lit(" for data process"))
    li2 = F.when(F.col("doc_id") % 2 == 0,
                 F.concat(F.lit("<li>tool-write-"), name, F.lit("</li>"))) \
        .otherwise(F.lit(""))
    tail = F.concat(F.lit("stars:"), (F.col("doc_id") % 1000).cast("string"),
                    F.lit(" implementation in python."))
    html_str = F.concat(
        F.lit("<html><head><title>"), name, F.lit("</title></head><body><h1>"),
        name, F.lit(" mcp server</h1><p>"), desc, F.lit("</p><li>tool-read-"),
        name, F.lit("</li>"), li2, tail, F.lit("</body></html>"))
    # visible_text: tags stripped, nodes trimmed, empties dropped,
    # newline-joined
    vis2 = F.when(F.col("doc_id") % 2 == 0,
                  F.concat(F.lit("tool-write-"), name, F.lit("\n"))) \
        .otherwise(F.lit(""))
    visible = F.concat(
        name, F.lit("\n"), name, F.lit(" mcp server\n"), desc, F.lit("\n"),
        F.lit("tool-read-"), name, F.lit("\n"), vis2, tail)
    return documents.select(
        F.concat(F.lit("https://github.com/"), author, F.lit("/"), name
                 ).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double") + F.lit(0.125))
         ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        visible.alias("text"),
        F.col("lang").alias("lang"),
    )


def render_mcpmarket_pages(documents: DataFrame) -> DataFrame:
    """documents -> deterministic mcpmarket.com server-card listings
    for the S4 path (extract._parse_mcpmarket_html;
    scrapers.py:1110-1177): two `server-card` divs per page — h2 name,
    <p> description, github link (author = repo path segment) — and on
    doc_id % 5 == 0 the second card REPEATS the first card's name to
    exercise the parser's per-page first-wins name dedup, all under a
    closed-form SQL oracle."""
    name = doc_name(F.col("doc_id"))
    author = F.col("source")
    n1 = F.concat(name, F.lit("-a"))
    n2 = F.when(F.col("doc_id") % 5 == 0, n1) \
        .otherwise(F.concat(name, F.lit("-b")))

    def card(n):
        return F.concat(
            F.lit('<div class="server-card"><h2>'), n, F.lit("</h2><p>card for "),
            n, F.lit('</p><a href="https://github.com/'), author,
            F.lit("/"), n, F.lit('">gh</a></div>'))

    def card_vis(n):
        return F.concat(n, F.lit("\ncard for "), n, F.lit("\ngh"))

    html_str = F.concat(F.lit("<html><body>"), card(n1), card(n2),
                        F.lit("</body></html>"))
    visible = F.concat(card_vis(n1), F.lit("\n"), card_vis(n2))
    return documents.select(
        F.concat(F.lit("https://mcpmarket.com/servers/"), name).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double") + F.lit(0.375))
         ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        visible.alias("text"),
        F.col("lang").alias("lang"),
    )


def render_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> pages."""
    name = doc_name(F.col("doc_id"))
    author = F.col("source")
    title = F.concat(name, F.lit(" by "), author)
    # meta-description branch of the mcp.so template (scrapers.py:637-641)
    esc = _esc(F.col("text"))
    html_str = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title>"),
        F.lit('<meta name="description" content="'), esc, F.lit('">'),
        F.lit("</head><body><h1>"), title, F.lit("</h1></body></html>"),
    )
    # visible text per the engine's canonical rule (extract.visible_text):
    # tags stripped, nodes trimmed, empties dropped, newline-joined
    visible = F.concat(title, F.lit("\n"), title)
    return documents.select(
        F.concat(F.lit("https://mcp.so/server/"), name, F.lit("/"), author
                 ).alias("url"),
        (F.to_timestamp(F.lit(EPOCH))
         + F.make_interval(secs=F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        visible.alias("text"),
        F.col("lang").alias("lang"),
    )
