"""Declared StructTypes for every table in the pipeline (SURVEY §1.3:
schema discipline is explicit — every stage declares its output schema,
invalid rows go to a quarantine side-output, never silently dropped).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input per BASELINE.json:input_hint
PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

TOOL = StructType([
    StructField("name", StringType(), True),
    StructField("description", StringType(), True),
])

# sub-entities per /root/reference/src/models.py:47-57 (MCPResource /
# MCPPrompt); materialized as HAS_RESOURCE / HAS_PROMPT triples
# (neo4j_integration.py:269-292)
RESOURCE = StructType([
    StructField("uri", StringType(), True),
    StructField("name", StringType(), True),
    StructField("description", StringType(), True),
    StructField("mime_type", StringType(), True),
])

PROMPT = StructType([
    StructField("name", StringType(), True),
    StructField("description", StringType(), True),
])

# one extracted server mention per (url, registry) — pre-canonicalization
MENTIONS = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("registry", StringType(), False),
    StructField("name", StringType(), True),
    StructField("author", StringType(), True),
    StructField("description", StringType(), True),
    StructField("repository", StringType(), True),
    StructField("homepage", StringType(), True),
    StructField("license", StringType(), True),
    StructField("version", StringType(), True),
    StructField("implementation_language", StringType(), True),
    StructField("tools", ArrayType(TOOL), True),
    StructField("resources", ArrayType(RESOURCE), True),
    StructField("prompts", ArrayType(PROMPT), True),
    StructField("tags", ArrayType(StringType()), True),
    StructField("popularity_score", LongType(), True),
    StructField("download_count", LongType(), True),
    # NB: no extracted_text column — the byte-identical-text invariant
    # is enforced INSIDE extraction (text_mismatch quarantine), and the
    # canonical page text lives in the pages table keyed by url.
    # Duplicating ~KB of page text into every mention row inflated the
    # Arrow transfer + mention-cache build + spill for a column nothing
    # downstream read.
])

REJECTS = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("registry", StringType(), True),
    StructField("reason", StringType(), False),
])

TRIPLES = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("confidence", DoubleType(), True),
    StructField("evidence", ArrayType(StringType()), True),
])

LINEAGE = StructType([
    StructField("stage", StringType(), False),
    StructField("partition_id", LongType(), False),
    StructField("rows", LongType(), False),
    StructField("run_id", StringType(), False),
])
