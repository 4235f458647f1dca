"""Real WAV path: byte-exact round-trip and tolerate-don't-throw fuzzing."""

from __future__ import annotations

import struct

import numpy as np

from mapreduce_hadoop_spark.operators.multimodal import (
    WAV_TARGET_SR,
    _wav_bytes_patterned,
    _wav_decode,
    media_real_wav,
)


def test_wav_roundtrip_exact():
    for d in [0, 1, 2, 3, 4, 5, 7, 10, 64, 123, 511, 1024]:
        decoded = _wav_decode(_wav_bytes_patterned(d))
        assert decoded is not None, d
        sr, s = decoded
        n = len(s)
        assert n == 256 + d % 512
        assert sr == (8000, 12000, 16000, 20000)[d % 4]
        if d % 2 == 0:
            exp = (5 * np.arange(n) + d) % 256
        else:
            exp = (7 * np.arange(n) + d) % 65536 - 32768
        assert (s == exp).all(), d


def test_wav_junk_chunk_skipped():
    # doc_id % 5 == 0 payloads carry an odd-length LIST chunk + pad byte;
    # decode must skip it and still land on data.
    assert _wav_decode(_wav_bytes_patterned(10)) is not None
    assert _wav_decode(_wav_bytes_patterned(11)) is not None


def _valid() -> bytes:
    return _wav_bytes_patterned(6)


def test_wav_malformed_payloads_return_none():
    good = bytearray(_valid())
    assert _wav_decode(bytes(good)) is not None

    # bad magics
    assert _wav_decode(b"") is None
    assert _wav_decode(b"RIFF") is None
    assert _wav_decode(b"RIFX" + bytes(good[4:])) is None
    bad_wave = bytearray(good)
    bad_wave[8:12] = b"WAVX"
    assert _wav_decode(bytes(bad_wave)) is None

    # truncated data chunk (declared size overruns the payload)
    assert _wav_decode(bytes(good[:-10])) is None

    # non-PCM format code
    non_pcm = bytearray(good)
    struct.pack_into("<H", non_pcm, 20, 3)  # fmt body starts at 20
    assert _wav_decode(bytes(non_pcm)) is None

    # stereo
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)
    assert _wav_decode(bytes(stereo)) is None

    # unsupported bit depth
    b12 = bytearray(good)
    struct.pack_into("<H", b12, 34, 12)
    assert _wav_decode(bytes(b12)) is None

    # zero sample rate
    sr0 = bytearray(good)
    struct.pack_into("<I", sr0, 24, 0)
    assert _wav_decode(bytes(sr0)) is None

    # data before fmt: rebuild with chunks swapped
    fmt_body = bytes(good[20:36])
    data = b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    fmt = b"fmt " + struct.pack("<I", 16) + fmt_body
    swapped = b"RIFF" + struct.pack("<I", 4 + len(data) + len(fmt)) + b"WAVE" + data + fmt
    assert _wav_decode(swapped) is None

    # odd 16-bit data size
    odd16 = _wav_bytes_patterned(1)
    pos = odd16.index(b"data")
    truncated = bytearray(odd16)
    struct.pack_into("<I", truncated, pos + 4, 3)
    assert _wav_decode(bytes(truncated)) is None


def test_wav_query_counts_and_one_doc(spark, sf_dir):
    df = media_real_wav(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in df}
    assert all(r["samp_sum"] is not None for r in df)
    # closed-form check for one even and one odd doc
    for d in (6, 7):
        r = by_id[d]
        n = 256 + d % 512
        sr = (8000, 12000, 16000, 20000)[d % 4]
        out_n = (n * WAV_TARGET_SR) // sr
        j = np.arange(out_n)
        src = (j * n) // out_n
        sv = (5 * src + d) % 256 if d % 2 == 0 else (7 * src + d) % 65536 - 32768
        assert r["n_samples"] == n and r["sr"] == sr and r["out_n"] == out_n
        assert r["samp_sum"] == int(sv.sum())
        assert r["samp_sq_sum"] == int((sv * sv).sum())
