"""WARC codec + reader and the N-Triples serializer.

The WARC writer/parser pair follows the multimodal planted-payload
strategy: the writer is a faithful ISO-28500 serializer, the parser is
certified by byte-identical round trip, and the malformed-input paths
are pinned so a bad segment can never kill a task.
"""
from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from askg_spark import warc as W
from askg_spark import triples as T


ROWS = [
    ("https://a.example.org/doc/0", W._WARC_EPOCH + 5,
     "unicode é 世界".encode()),
    ("https://a.example.org/doc/1", W._WARC_EPOCH + 6, b""),
    # payload that contains the record magic and bare CRLFs — a
    # magic-scanning splitter would mis-split here
    ("https://a.example.org/doc/2", W._WARC_EPOCH + 7,
     b"x\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\ny"),
    ("https://a.example.org/doc/3", W._WARC_EPOCH + 8, b"z" * 70000),
]


def test_roundtrip_gzip_and_plain():
    blob = W.synth_warc_segment(ROWS, 3)
    got = list(W.parse_warc_bytes(blob))
    assert [(u, t, 200, b) for u, t, b in ROWS] == got
    # same records, uncompressed concatenation (WARC without the CC
    # per-record-gzip convention)
    raw = b"".join(W._members(blob))
    assert list(W.parse_warc_bytes(raw)) == got


def test_iso_epoch_bijection():
    for e in (0, 951868800, 1582934400, W._WARC_EPOCH, 4102444799):
        assert W._from_iso(W._iso(e)) == e


def test_malformed_inputs_quarantined():
    blob = W.synth_warc_segment(ROWS, 0)
    # truncation mid-member: earlier records surface, no raise
    assert len(list(W.parse_warc_bytes(blob[: len(blob) // 2]))) < len(ROWS)
    # garbage and empty blobs parse to nothing
    assert list(W.parse_warc_bytes(b"")) == []
    assert list(W.parse_warc_bytes(b"\x1f\x8bnot really gzip")) == []
    assert list(W.parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")) == []
    # a valid member whose record is not WARC is skipped
    junk = zlib.compress(b"hello", 6)
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    member = co.compress(b"not a warc record") + co.flush()
    assert list(W.parse_warc_bytes(member)) == []
    del junk


def test_non_response_records_skipped():
    blob = W.synth_warc_segment(ROWS[:1], 0)
    # the segment holds warcinfo + request + response; only the
    # response surfaces
    n_members = sum(1 for _ in W._members(blob))
    assert n_members == 3
    assert len(list(W.parse_warc_bytes(blob))) == 1


def test_spark_roundtrip_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i} " + "w" * (i % 17), "en", f"src{i % 3}", 10)
         for i in range(97)],
        "doc_id long, text string, lang string, source string, n_chars long")
    outs = []
    for nseg in (4, 16):
        pages = W.parse_warc(W.documents_as_warc(docs, n_segments=nseg))
        outs.append(sorted(
            (r.url, r.ts_epoch, r.status, bytes(r.payload))
            for r in pages.collect()))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 97
    by_url = {u: p for u, _, _, p in outs[0]}
    assert by_url["https://src1.example.org/doc/1"] == b"text 1 w"


def test_ntriples_escaping_golden(spark):
    t = spark.createDataFrame(
        [("s 1", "p", 'a"b\\c\nd\te'),
         ("plain", "rel", "obj iri", )],
        "subj string, pred string, obj string")
    lines = {
        r.line
        for r in T.to_ntriples(
            t, object_is_iri=F.col("pred") == "rel").collect()}
    base = "https://askg.example/kg/"
    assert lines == {
        f'<{base}s%201> <{base}p> "a\\"b\\\\c\\nd\\te" .',
        f"<{base}plain> <{base}rel> <{base}obj%20iri> .",
    }


def test_ntriples_on_pipeline_triples(spark):
    # every emitted line is structurally valid N-Triples: two IRIs, a
    # literal, terminal ' .', and no raw control chars
    import re

    t = spark.createDataFrame(
        [("server:a", "HAS_CATEGORY", "database"),
         ("server:a", "AUTHORED_BY", 'ACME "inc"')],
        "subj string, pred string, obj string")
    pat = re.compile(r'^<[^<>"\s]+> <[^<>"\s]+> "(?:[^"\\\n\r]|\\.)*" \.$')
    for r in T.to_ntriples(t).collect():
        assert pat.match(r.line), r.line


def test_cdx_offsets_random_access():
    blob = W.synth_warc_segment(ROWS, 5)
    recs = []
    for raw, off, clen in W._members_with_offsets(blob):
        rec = W._parse_record(raw)
        if rec:
            recs.append((rec, off, clen))
    assert len(recs) == len(ROWS)
    for (url, ts, status, payload), off, clen in recs:
        # ranged refetch: the slice alone must reproduce the record
        sliced = list(W.parse_warc_bytes(blob[off:off + clen]))
        assert sliced == [(url, ts, status, payload)]
        # and a corrupted offset must NOT silently succeed
        assert list(W.parse_warc_bytes(blob[off + 1:off + clen])) == []
    # offsets tile the segment exactly: every byte belongs to a member
    all_members = list(W._members_with_offsets(blob))
    assert all_members[0][1] == 0
    for (_, o1, c1), (_, o2, _) in zip(all_members, all_members[1:]):
        assert o1 + c1 == o2
    assert all_members[-1][1] + all_members[-1][2] == len(blob)


def test_cdx_records_spark(spark):
    docs = spark.createDataFrame(
        [(i, f"body {i}", "en", f"s{i % 2}", 6) for i in range(20)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    seg = W.documents_as_warc(docs, n_segments=4)
    out = W.cdx_records(seg).collect()
    assert len(out) == 20
    assert all(r.cdx_ok == 1 for r in out)
    assert all(r.comp_len > 0 for r in out)
