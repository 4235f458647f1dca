"""Multimodal binary plumbing: mapInPandas shapes + the decode stub gate."""

from __future__ import annotations

import pytest

from mapreduce_hadoop_spark.operators.multimodal import (
    decode_media,
    media_table,
    sample_frames,
)


def test_media_table_binary_column(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    r = m.first()
    assert isinstance(r["payload"], (bytes, bytearray))
    assert r["mime"] in ("image/png", "audio/wav", "video/mp4")


def test_decode_media_fake_dimensions(spark, sf_dir):
    out = decode_media(media_table(spark, sf_dir)).collect()
    assert len(out) == media_table(spark, sf_dir).count()
    for r in out[:20]:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert r["n_pixels"] == r["width"] * r["height"]


def test_decode_media_real_path_is_stubbed(spark, sf_dir):
    df = decode_media(media_table(spark, sf_dir), real_decode=True)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        df.collect()


def test_sample_frames_one_to_n(spark, sf_dir):
    media = media_table(spark, sf_dir).limit(5)
    frames = sample_frames(media, n_frames=4).collect()
    assert len(frames) == 20
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        assert sorted(r["frame"] for r in rows) == [0, 1, 2, 3]
        total = sum(r["n_bytes"] for r in rows)
        payload = next(
            m["payload"] for m in media.collect() if m["doc_id"] == doc_id
        )
        assert total == len(payload)
