"""Corpus curation sampling trio: semantics beyond the oracle hash."""

from __future__ import annotations

from mapreduce_hadoop_spark.operators.corpus import (
    QUOTA_N,
    SAMPLE_K,
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
    corpus_domain_quota,
    corpus_train_split,
    corpus_weighted_sample,
)
from mapreduce_hadoop_spark.operators.textops import quality_score


def test_weighted_sample_prefers_quality(spark, sf_dir):
    """A-Res with quality weights must yield a sample whose mean quality
    beats the corpus mean (the whole point of weighting), at exactly K
    rows, deterministically (two runs identical)."""
    got = corpus_weighted_sample(spark, sf_dir).toPandas()
    assert len(got) == SAMPLE_K
    corpus_mean = (
        quality_score(spark, sf_dir).toPandas()["quality"].mean()
    )
    assert got["quality"].mean() > corpus_mean
    again = corpus_weighted_sample(spark, sf_dir).toPandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )


def test_train_split_partitions_everything(spark, sf_dir):
    """Every doc lands in exactly one split; shares are within a loose
    band of 90/5/5 (hash uniformity, not exact proportions)."""
    got = corpus_train_split(spark, sf_dir).toPandas()
    n_docs = quality_score(spark, sf_dir).count()
    assert got["n_docs"].sum() == n_docs
    by_split = got.groupby("split")["n_docs"].sum()
    train_share = by_split.get("train", 0) / n_docs
    assert 0.8 < train_share < 0.97, train_share
    assert set(by_split.index) <= {"train", "val", "test"}
    assert SPLIT_TRAIN_PCT < SPLIT_VAL_PCT


def test_domain_quota_caps_and_ranks(spark, sf_dir):
    got = corpus_domain_quota(spark, sf_dir).toPandas()
    per_source = got.groupby("source")
    assert (per_source.size() <= QUOTA_N).all()
    for _, grp in per_source:
        g = grp.sort_values("rk")
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        # Ranks follow quality desc (ties broken by doc_id asc).
        q = list(g["quality"])
        assert all(a >= b for a, b in zip(q, q[1:]))
