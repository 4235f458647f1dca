"""Real AVI path: byte-exact round-trip and tolerate-don't-throw fuzzing."""

from __future__ import annotations

import struct

import numpy as np

from mapreduce_hadoop_spark.operators.multimodal import (
    AVI_SAMPLE_FRAMES,
    _AVI_PAL_MULT,
    _avi_bytes_patterned,
    _avi_decode,
    media_real_avi,
)


def _expected_frame(d: int, f: int, w: int, h: int):
    return np.fromfunction(
        lambda y, x: (_AVI_PAL_MULT * ((d + 11 * f + 7 * y + 5 * x) % 256)) % 256,
        (h, w),
    ).astype(np.int64)


def test_avi_roundtrip_exact():
    for d in [0, 1, 2, 5, 7, 10, 14, 35, 63, 123, 499, 1024]:
        decoded = _avi_decode(_avi_bytes_patterned(d))
        assert decoded is not None, d
        w, h, frames = decoded
        assert (w, h, len(frames)) == (6 + d % 9, 5 + d % 7, 3 + d % 6), d
        for f, fr in enumerate(frames):
            assert np.array_equal(fr, _expected_frame(d, f, w, h)), (d, f)


def test_avi_junk_and_audio_chunks_skipped():
    # doc_id % 5 == 0: odd-length JUNK chunk + pad before movi;
    # doc_id % 7 == 0: audio '01wb' sub-chunk inside movi (odd size, pad).
    for d in (5, 7, 35, 70):
        assert _avi_decode(_avi_bytes_patterned(d)) is not None, d


def _bmih_offset(payload: bytes) -> int:
    # BITMAPINFOHEADER starts with biSize=40; the first match after the
    # avih chunk is the strf body.
    return payload.find(struct.pack("<I", 40), 80)


def test_avi_malformed_payloads_return_none():
    good = _avi_bytes_patterned(7)
    assert _avi_decode(good) is not None

    # bad magics / truncation
    assert _avi_decode(b"") is None
    assert _avi_decode(b"RIFF") is None
    assert _avi_decode(b"RIFX" + good[4:]) is None
    bad_avi = bytearray(good)
    bad_avi[8:12] = b"AVIX"
    assert _avi_decode(bytes(bad_avi)) is None
    assert _avi_decode(good[:60]) is None

    i = _bmih_offset(good)
    # 24-bit frames: unsupported
    b24 = bytearray(good)
    struct.pack_into("<H", b24, i + 14, 24)
    assert _avi_decode(bytes(b24)) is None
    # compressed stream (non-BI_RGB fourcc)
    comp = bytearray(good)
    struct.pack_into("<I", comp, i + 16, 1)
    assert _avi_decode(bytes(comp)) is None
    # two planes
    pl = bytearray(good)
    struct.pack_into("<H", pl, i + 12, 2)
    assert _avi_decode(bytes(pl)) is None
    # non-grayscale palette (g channel diverges)
    pal = bytearray(good)
    pal[i + 40 + 4 * 10 + 1] = 255
    assert _avi_decode(bytes(pal)) is None
    # header/stream dims disagreement (avih width + 1)
    dim = bytearray(good)
    avih_at = good.index(b"avih") + 8
    (w0,) = struct.unpack_from("<I", good, avih_at + 32)
    struct.pack_into("<I", dim, avih_at + 32, w0 + 1)
    assert _avi_decode(bytes(dim)) is None
    # frame-count disagreement (avih dwTotalFrames + 1)
    fc = bytearray(good)
    (nf0,) = struct.unpack_from("<I", good, avih_at + 16)
    struct.pack_into("<I", fc, avih_at + 16, nf0 + 1)
    assert _avi_decode(bytes(fc)) is None
    # idx1 entry size not a multiple of 16
    idx_at = good.rindex(b"idx1")
    short_idx = bytearray(good)
    (isz,) = struct.unpack_from("<I", good, idx_at + 4)
    struct.pack_into("<I", short_idx, idx_at + 4, isz - 4)
    assert _avi_decode(bytes(short_idx[: len(good) - 4])) is None
    # truncated frame chunk (declared size overruns the payload)
    assert _avi_decode(good[:-24]) is None


def test_avi_query_counts_and_closed_form(spark, sf_dir):
    df = media_real_avi(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in df}
    assert all(r["f_sum"] is not None for r in df)
    for d in (6, 7, 35):
        r = by_id[d]
        w, h, nf = 6 + d % 9, 5 + d % 7, 3 + d % 6
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["sampled_n"] == AVI_SAMPLE_FRAMES
        f_sum = q_sum = 0
        for j in range(AVI_SAMPLE_FRAMES):
            fr = _expected_frame(d, (j * nf) // AVI_SAMPLE_FRAMES, w, h)
            f_sum += int(fr.sum())
            q_sum += int(fr[: h // 2, : w // 2].sum())
        assert r["f_sum"] == f_sum and r["q_sum"] == q_sum, d
