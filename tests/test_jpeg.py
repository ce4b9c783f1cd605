"""Baseline JPEG codec: planted-tile exactness, round-trip fidelity,
restart/subsampling variants, malformed-stream contract."""
from __future__ import annotations

import numpy as np
import pytest

from askg_spark.jpeg import (decode_jpeg_array, encode_jpeg,
                             expected_tile_value, synth_jpeg)


def _expected_image(doc_id: int) -> np.ndarray:
    tiles = (doc_id * 31 + np.arange(16) * 97) % 256
    exp = np.array([expected_tile_value(int(v))
                    for v in tiles]).reshape(4, 4)
    return np.repeat(np.repeat(exp, 8, 0), 8, 1)


def test_planted_tiles_integer_exact():
    # lossy codec, exact decode: DC-only blocks + zero chroma
    for doc_id in (0, 1, 7, 123, 9999, 40001):
        px, w, h = decode_jpeg_array(synth_jpeg(doc_id))
        assert (w, h) == (32, 32)
        exp = _expected_image(doc_id)
        for ch in range(3):
            assert np.array_equal(px[:, :, ch], exp)


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("ri", [0, 2])
def test_roundtrip_high_quality(subsample, ri):
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (3, 3, 3)).astype(np.float64)
    img = np.clip(np.kron(base, np.ones((16, 16, 1)))[:40, :44],
                  0, 255).astype(np.uint8)
    px, w, h = decode_jpeg_array(
        encode_jpeg(img, quality=95, subsample=subsample,
                    restart_interval=ri))
    assert (w, h) == (44, 40)
    err = (px.astype(int) - img.astype(int)).astype(float)
    psnr = 10 * np.log10(255 ** 2 / max(1e-9, (err ** 2).mean()))
    assert psnr > 30


def test_non_multiple_of_8_dims_and_noise():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 31, 3)).astype(np.uint8)
    px, w, h = decode_jpeg_array(encode_jpeg(img, quality=50))
    assert (w, h) == (31, 33) and px.shape == (33, 31, 3)
    # grayscale 2-D input path
    g = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    px, w, h = decode_jpeg_array(encode_jpeg(g, quality=90))
    assert (w, h) == (24, 16)


def test_optimized_tables_adapt_to_content():
    # an almost-flat image must code smaller than a noisy one of the
    # same size — the per-image Huffman tables are doing their job
    rng = np.random.default_rng(0)
    flat = np.full((64, 64, 3), 128, dtype=np.uint8)
    noisy = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    assert len(encode_jpeg(flat, 50)) < len(encode_jpeg(noisy, 50)) / 3


def test_malformed_raises_valueerror_only():
    good = synth_jpeg(1)
    bads = [b"", b"\xff\xd8", b"\xff\xd8\xff\xe0\x00\x04ab",
            good[:40], good[:-10] + b"\x00" * 5, b"\x89PNG\r\n\x1a\n"]
    # progressive SOF2 rejected explicitly
    bads.append(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    for bad in bads:
        with pytest.raises(ValueError):
            decode_jpeg_array(bad)


def test_dispatcher_routes_jpeg(spark):
    from askg_spark import multimodal as M

    px, w, h = M.decode_image_array(synth_jpeg(3))
    assert (w, h) == (32, 32)
    docs = spark.range(0, 8).selectExpr("id AS doc_id")
    media = M.synth_jpeg_corpus(docs)
    stats = {r.doc_id: r for r in M.image_pixel_stats(media).collect()}
    assert len(stats) == 8
    for i in range(8):
        exp = _expected_image(i)
        assert stats[i].sum_pixels == 3 * int(exp.sum())
        assert stats[i].n_pixels == 1024


def test_fill_bytes_before_markers_accepted():
    good = synth_jpeg(2)
    # inject 0xFF fill padding before the DQT marker (T.81 B.1.1.2)
    i = good.index(b"\xff\xdb")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    px, w, h = decode_jpeg_array(padded)
    assert (w, h) == (32, 32)
    assert np.array_equal(px, decode_jpeg_array(good)[0])


def test_sos_component_mismatch_is_valueerror():
    good = synth_jpeg(2)
    i = good.index(b"\xff\xda")
    # corrupt the first scan component id (3 -> count byte, then id)
    sos = bytearray(good[i:i + 20])
    sos[5] = 9  # component id 1 -> 9, absent from SOF
    with pytest.raises(ValueError):
        decode_jpeg_array(good[:i] + bytes(sos) + good[i + 20:])
