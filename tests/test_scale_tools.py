"""Properties of the --mutate scale derivation (tools/make_scale_data.py).

The mutate mode's whole value rests on two exactness claims — intra-replica
similarity EXACTLY preserved, cross-replica similarity pushed to baseline —
so both are pinned here on a tiny in-memory corpus (no Spark needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tools.make_scale_data import (
    MUTATE_PCT,
    _mutate_embedding,
    _mutate_text,
)

DOCS = [
    "the big table join runs fast on the sorted column",
    "the big table join runs slow on the sorted column",
    "stream window agg merge sort filter scan value key row",
]
VOCAB = sorted({t for d in DOCS for t in d.split()})


def _jaccard3(a: str, b: str) -> float:
    def sh(s):
        t = s.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_mutate_text_preserves_intra_replica_jaccard_exactly():
    col = pa.chunked_array([pa.array(DOCS)])
    for r in (1, 2, 7):
        mut = _mutate_text(col, VOCAB, r).to_pylist()
        # tokenwise injective substitution => every pairwise Jaccard exact
        for i in range(len(DOCS)):
            for j in range(i + 1, len(DOCS)):
                assert _jaccard3(mut[i], mut[j]) == _jaccard3(DOCS[i], DOCS[j])


def test_mutate_text_is_deterministic_and_replica_distinct():
    col = pa.chunked_array([pa.array(DOCS)])
    m1a = _mutate_text(col, VOCAB, 1).to_pylist()
    m1b = _mutate_text(col, VOCAB, 1).to_pylist()
    m2 = _mutate_text(col, VOCAB, 2).to_pylist()
    assert m1a == m1b
    assert m1a != m2
    assert any("x1" in d for d in m1a), "replica 1 must actually mutate"
    assert 0 < MUTATE_PCT < 100


def test_mutate_embedding_is_orthogonal_and_replica_keyed():
    rng = np.random.default_rng(5)
    n, dim = 20, 64
    base = rng.normal(size=(n, dim)).astype("float32") + 0.5  # shared mean
    col = pa.chunked_array(
        [pa.array([list(map(float, row)) for row in base], type=pa.list_(pa.float32()))]
    )
    m1 = np.array(_mutate_embedding(col, 1).to_pylist(), dtype="float32")
    m2 = np.array(_mutate_embedding(col, 2).to_pylist(), dtype="float32")
    # orthogonal: norms and all pairwise dot products exactly preserved
    assert np.allclose(np.linalg.norm(m1, axis=1), np.linalg.norm(base, axis=1), atol=1e-4)
    assert np.allclose(m1 @ m1.T, base @ base.T, atol=1e-2)
    # replica-keyed: different replicas decorrelate, and the shared mean
    # component does not survive (sign flips kill the all-ones direction)
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cross = [cos(base[i], m1[i]) for i in range(n)] + [
        cos(m1[i], m2[i]) for i in range(n)
    ]
    assert max(abs(c) for c in cross) < 0.75
    assert np.mean(np.abs(cross)) < 0.35
