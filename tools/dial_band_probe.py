"""Probe the adaptive-shortlist dial's unmeasured covered band (r15).

The round-14 calibration (SCALE_ann_r14.md §3) measured per-query
``covered`` values on six corpora: every neighbor-losing query read
covered <= 0.333 and every lossless one >= 0.367, and the 0.35
threshold sits in that gap — but no measured corpus produced queries
INSIDE [0.333, 0.367], so the dial's behavior there was extrapolated
(VERDICT r14 missing item 4 / order 6). The replica factor moves the
signal (f10/n=20k: 0.291-0.332; f100/n=200k: 0.386-0.417), so corpora
derived at INTERMEDIATE factors should cross the band.

For each factor this tool derives the mutated corpus (the gate's own
orthogonal-mutation recipe), fits the SHIPPED books (canonicalized
Spark KMeans through ann_index.pq_codebooks), and then replicates the
serving arithmetic in numpy — ADC tables per _adc_arrays_np, the
histogram-weighted bulk estimate per _bulk_adc_estimates, the
covered-gap fire rule, the floor and 4x-widened exact re-ranks — to
report per query: covered, fired?, recall@5 fixed vs adaptive.
(Round 14 verified the numpy study matches the Spark plan exactly;
the shipped plan's Spark-side fire behavior is additionally pinned by
tests/test_similarity_pq.py.)

Usage: python tools/dial_band_probe.py [factor ...]   (default: 20 30 50)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ann_crossover import derive  # noqa: E402


def study(spark, sf_dir: str) -> list[dict]:
    from mapreduce_hadoop_spark.operators import ann_index, similarity

    emb = similarity._with_norm(similarity.load_table(spark, sf_dir, "embeddings"))
    n = ann_index.corpus_count(emb, sf_dir)
    m_sub, sub = similarity.PQ_TRAINED_M, similarity.PQ_TRAINED_SUB
    k = min(similarity.PQ_TRAINED_K, max(16, n // 2))
    nvt = emb.select("vec_id", similarity._div_by("v", "norm").alias("nv"))
    rows = ann_index.pq_codebooks(spark, nvt, sf_dir, m_sub, sub, k, tag="nv")
    books = np.full((m_sub, 256, sub), np.inf)
    for m, code, cd in rows:
        books[m, code] = cd

    # Corpus + queries, numpy-side (row order irrelevant for the study).
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_numpy()
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    nv = x / np.sqrt((x * x).sum(axis=1))[:, None]
    qmask = ids < similarity.N_QUERIES
    qids = ids[qmask]
    qnv = nv[qmask]

    # Encode every row with the shipped argmin rule (lowest code on ties).
    # The matmul must use ZEROED unfit cells (round 17): raw inf cells
    # turn 0 * inf into NaN inside the dot product, and NaN poisons the
    # argmin — the r14 verification never saw it because every mutated
    # corpus (n >= 20k) fills all 256 clusters; organic sf0.001/sf0.01
    # (n = 2k/20k vs k = 256-ish) leave empty clusters and read NaN
    # covered. The inf penalty lives in cnorms alone, exactly like the
    # engine's _pq_encode_udf (finite books matmul + masked norms).
    fin_books = np.where(np.isfinite(books), books, 0.0)
    cnorms = (fin_books ** 2).sum(axis=2)
    cnorms[~np.isfinite(books).all(axis=2)] = np.inf
    codes = np.empty((len(nv), m_sub), dtype=np.int64)
    for m in range(m_sub):
        xm = nv[:, m * sub : (m + 1) * sub]
        codes[:, m] = np.argmin(cnorms[m] - 2.0 * (xm @ fin_books[m].T), axis=1)

    # Histogram-weighted bulk estimate (the shipped formula).
    freq = np.zeros((m_sub, 256))
    for m in range(m_sub):
        v, c = np.unique(codes[:, m], return_counts=True)
        freq[m, v] = c

    shortlist = max(
        similarity.PQ_SHORTLIST_MIN, n // similarity.PQ_TRAINED_SHORTLIST_DIV
    )
    wide = shortlist * similarity.PQ_ADAPT_WIDEN
    wide_deep = shortlist * similarity.PQ_ADAPT_WIDEN_DEEP
    out = []
    for qi, qid in enumerate(qids):
        # ADC lookup arrays for this query; per-candidate ADC.
        ts = np.empty((m_sub, 256))
        for m in range(m_sub):
            diff = qnv[qi][m * sub : (m + 1) * sub][None, :] - books[m]
            ts[m] = (diff * diff).sum(axis=1)
        mask_rows = ids != qid
        adc = ts[np.arange(m_sub)[None, :], codes[mask_rows]].sum(axis=1)
        cand_ids = ids[mask_rows]
        bulk = sum(
            float((freq[m][freq[m] > 0] * ts[m][freq[m] > 0]).sum()) / len(nv)
            for m in range(m_sub)
        )
        order = np.lexsort((cand_ids, np.round(adc, 6)))
        a_top = float(np.round(adc[order[similarity.TOP_K - 1]], 6))
        a_floor = float(np.round(adc[order[shortlist - 1]], 6))
        covered = (a_floor - a_top) / max(bulk - a_top, 1e-9)
        fired = covered < similarity.PQ_ADAPT_COVER
        fired_deep = covered < similarity.PQ_ADAPT_DEEP_COVER

        # Exact top-5 vs re-rank of the floor / widened shortlists.
        cos = nv[mask_rows] @ qnv[qi]
        exact = set(cand_ids[np.lexsort((cand_ids, -np.round(cos, 6)))][: similarity.TOP_K])

        def rerank(depth: int) -> set:
            sl = order[:depth]
            sl_cos = cos[sl]
            sub_order = np.lexsort((cand_ids[sl], -np.round(sl_cos, 6)))
            return set(cand_ids[sl][sub_order][: similarity.TOP_K])

        r_fixed = len(exact & rerank(shortlist)) / similarity.TOP_K
        # Calibration depths are EXPLICIT multipliers of the floor
        # shortlist, keyed by the multiplier (ADVICE r17: the old
        # recall_widened/recall_widened8 keys were defined relative to
        # PQ_ADAPT_WIDEN, so the r17 4->8 move silently relabeled every
        # column and dropped the 4x depth from future calibrations).
        # Only recall_adaptive is tied to the SHIPPED constants.
        r_mult = {
            m: len(exact & rerank(min(shortlist * m, len(order))))
            / similarity.TOP_K
            for m in (4, 8, 16)
        }
        r_wide = len(exact & rerank(min(wide, len(order)))) / similarity.TOP_K
        r_deep = len(exact & rerank(min(wide_deep, len(order)))) / similarity.TOP_K
        # The shipped ESCALATING dial (round 16): deep fires re-rank the
        # PQ_ADAPT_WIDEN_DEEP x superset, ordinary fires PQ_ADAPT_WIDEN x.
        r_adapt = r_deep if fired_deep else (r_wide if fired else r_fixed)
        out.append(
            {
                "query": int(qid),
                "covered": round(covered, 3),
                "fired": bool(fired),
                "fired_deep": bool(fired_deep),
                "recall_fixed": r_fixed,
                "recall_adaptive": r_adapt,
                # What a fire WOULD buy at each fixed multiplier —
                # measured for every query so a threshold move is
                # decided on data, not extrapolation.
                "recall_x4": r_mult[4],
                "recall_x8": r_mult[8],
                "recall_x16": r_mult[16],
            }
        )
    return out


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [20, 30, 50]
    from mapreduce_hadoop_spark.session import get_spark

    spark = get_spark("dial-band-probe", master="local[8]", shuffle_partitions=8)
    for f in factors:
        sf_dir = derive(f)
        res = study(spark, sf_dir)
        cov = [r["covered"] for r in res]
        in_band = [r for r in res if 0.333 <= r["covered"] <= 0.367]
        fires = sum(r["fired"] for r in res)
        rf = sum(r["recall_fixed"] for r in res) / len(res)
        ra = sum(r["recall_adaptive"] for r in res) / len(res)
        print(
            f"factor {f} (n={f * 2000}): covered {min(cov):.3f}-{max(cov):.3f}, "
            f"in-band {len(in_band)}/10, fires {fires}/10, "
            f"recall fixed {rf:.2f} -> adaptive {ra:.2f}"
        )
        for r in res:
            print("   ", r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
