"""askg_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of maximilien/askg
(reference at /root/reference, studied for *semantics only*) as a
distributed DataFrame pipeline:

    pages (url, warc_ts, html, text, lang)      # Common-Crawl-style input
      -> extract      (vectorized mapInPandas HTML field extraction)
      -> classify     (ontology mention detection, pure Column exprs)
      -> normalize    (key/name/url/id normalizers, pure Column exprs)
      -> link         (exact blocking joins + MinHash-LSH fuzzy candidates
                       + difflib-exact rescoring in a pandas UDF)
      -> canonicalize (connected components, large-star/small-star +
                       merge reduction via groupBy aggs)
      -> relations    (typed edge derivation as equi-joins, skew-aware)
      -> triples      (normalized (subj, pred, obj) + sort-merge dedup)
      -> materialize  (node/edge/triple parquet tables + lineage)

Design rules (see SURVEY.md §7):
  * DataFrame/SQL first; Catalyst does pushdown/pruning/codegen.
  * Python only in Arrow-batched pandas UDFs; never per-row Python.
  * Every shuffle is deliberate: broadcast small dims, salt hot keys,
    AQE skew-join enabled by default.
"""

__version__ = "0.1.0"

from askg_spark.session import get_spark  # noqa: F401
