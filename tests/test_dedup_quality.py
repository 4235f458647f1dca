"""Cross-family dedup quality: the approximate methods vs exact Jaccard."""

from __future__ import annotations

from mapreduce_hadoop_spark.operators import dedup


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    # With 16 bands x 2 rows, P(candidate | j=0.5) = 1-(1-0.25)^16 ~ 0.99;
    # the verify step then makes precision exact. Require full agreement on
    # the test corpus (flakiness here would mean the banding broke).
    exact = {(r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()}
    assert len(exact) > 0
    assert lsh == exact, (len(exact), len(lsh), len(lsh & exact))


def test_simhash_covers_true_pairs(spark, sf_dir):
    # SimHash at hamming<=6 is a looser similarity (term-vector cosine-ish):
    # it must cover most true j>=0.5 pairs; extra pairs are by design.
    exact = {(r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()}
    sim = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_pairs(spark, sf_dir).collect()}
    assert len(exact) > 0
    assert len(sim & exact) / len(exact) >= 0.8
