"""Similarity search over the `embeddings` table (north-star extension).

- ``topk_bruteforce``: exact top-k cosine neighbors for a small query set.
  The query set is broadcast; the corpus is scanned once (k_q x n candidate
  rows, never n^2). This is the exact baseline any ANN variant is judged
  against.
- ``near_dup_cosine``: exact all-pairs cosine >= threshold. O(n^2) by
  definition — the correctness baseline, only for modest n.
- ``topk_lsh`` / ``near_dup_cosine_lsh``: banded signed-random-projection
  LSH (OR-of-ANDs; md5-parity +/-1 hyperplanes shared as literals with
  the oracle) with ENTROPY-AWARE bit width — ``measured_sign_bits``
  picks the width from the corpus's measured sign-pattern collision
  mass (count-based ``auto_sign_bits`` as the floor) so candidate
  volume stays linear even on low-entropy corpora (the round-7 residual
  ~n^1.17; SCALE_sf10_r7.md). Recall is
  1-(1-p^bits)^bands (measured at sf0.01: topk 0.86 at the 12-band
  default, near-dup pair recall 0.82 at 8 bands). The 100 TB shape:
  (band, bucket) is the shuffle/join key; bands is the recall dial,
  bits the scale guard — neither changes the plan.
- ``topk_ivf_trained`` / ``topk_ivf`` (oracle twin):
  inverted-file ANN — broadcast coarse centroids, nearest-list assignment,
  nprobe-list probe join. Default nprobe=8 is the measured knee (sf0.01
  recall@5: 0.80 trained / 0.74 fixed at ~49% candidate budget); the
  trained variant fits k-means once per sf_dir (cached) and probes with
  the identical plan.
- ``topk_ivfpq_trained`` (PRIMARY ANN — the deployed serving shape) /
  ``topk_ivfpq`` (oracle twin): full FAISS IVFPQ — K=sqrt(n) trained
  coarse quantizer x residual-encoded PQ-ADC with per-list codebooks x
  scale-adaptive exact re-rank. Recall@5 0.84 at sf0.1 scanning 36% of
  the corpus (the fixed-K twin: 0.72 at 51%), 4 code bytes per scanned
  vector instead of 64 floats; the memory shape that lets a 100 TB
  corpus' index live in cluster RAM.

All arithmetic is a strict left-to-right fold (F.aggregate / list_reduce)
over double-cast elements, so Spark and DuckDB produce bit-identical
cosines; results are rounded to 6 decimals at the output edge.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.sources.tables import load_table

N_QUERIES = 10  # vec_id < 10 are the demo query vectors
TOP_K = 5
NEAR_DUP_COS = 0.4


def _dvec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _with_norm(df: DataFrame) -> DataFrame:
    v = _dvec("embedding")
    return df.select(
        "vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("norm")
    )


def _div_by(vec: "Column | str", scalar: "Column | str") -> Column:
    """``transform(vec, x -> x / scalar)`` with the scalar's defining
    expression evaluated ONCE per row. Catalyst's CollapseProject inlines
    a projected scalar (e.g. the O(d)-fold ``norm`` column) INTO the
    per-element lambda, re-evaluating the fold for EVERY element —
    O(d^2) interpreted ops per row, measured as 9.4 s of
    topk_pq_trained's 13.2 s sf1 wall (round 11 misattributed this to
    scheduler stage latency). Binding the scalar as the element of a
    1-element outer transform turns it into a lambda VARIABLE, which the
    inner lambda references for free. The arithmetic (and therefore every
    output bit) is unchanged; only the evaluation count drops."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    scalar = F.col(scalar) if isinstance(scalar, str) else scalar
    return F.element_at(
        F.transform(F.array(scalar), lambda s: F.transform(vec, lambda x: x / s)),
        1,
    )


DOT_SQL = "list_reduce([{a}[i] * {b}[i] for i in range(1, 65)], (x, y) -> x + y)"
NORM_SQL = (
    "sqrt(list_reduce([{v}[i] * {v}[i] for i in range(1, 65)], (x, y) -> x + y))"
)

EMB_NORM_SQL = f"""
SELECT vec_id, v, {NORM_SQL.format(v="v")} AS norm
FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
"""


def topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors (vec_id < N_QUERIES)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


TOPK_BRUTEFORCE_ORACLE = f"""
WITH e AS ({EMB_NORM_SQL}),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, e.vec_id,
           round({DOT_SQL.format(a="q.qv", b="e.v")} / (q.qn * e.norm), 6) AS cosine
    FROM e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


def _near_dup_blocks(n: int, parallelism: int) -> int:
    """Block count B for the triangle-blocked all-pairs plan: the smallest
    B whose B(B+1)/2 block-pair groups cover the cluster's parallelism,
    raised so no block exceeds ~4096 rows (bounds each group's pandas
    frame and the numpy accumulator tile regardless of corpus size)."""
    import math

    b_par = math.ceil((math.sqrt(8.0 * max(parallelism, 1) + 1) - 1) / 2)
    return max(b_par, math.ceil(n / 4096), 1)


def near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs near-duplicates: cosine >= 0.4, vec_a < vec_b.

    Exact O(n^2) COMPUTE is the semantics (``near_dup_cosine_lsh`` is the
    approximate scale path) — but the round-12 shape, a
    BroadcastNestedLoopJoin evaluating a 64-term ``aggregate`` fold per
    pair in the JVM expression interpreter, pays that n^2 at
    interpreted-expression speed and broadcasts one whole side.  This
    plan is the textbook triangle blocking instead: rows hash into B
    blocks by ``vec_id % B``, every unordered block pair (i <= j) is one
    ``applyInPandas`` group, and each group evaluates its dense tile as a
    numpy outer-product ACCUMULATE whose summation order is the exact
    left fold of ``_dot`` / the DuckDB oracle's ``list_reduce`` — so
    every output bit (hash-pinned vs the r12 BNLJ plan at three gate
    scales, and vs ``near_dup_cosine_bnlj`` in
    tests/test_similarity_ivf.py) is unchanged while the arithmetic runs
    vectorized.

    Scale accounting: shuffle is n*B rows (= n^2/4096, vanishing next to
    the unavoidable n^2*d compute), no broadcast of data rows, no driver
    collect, groups are size-capped (~4096 rows/block) and uniformly
    keyed by the dense vec_id residue — skew-immune.  The final round +
    threshold stay in Spark so the filter semantics are byte-identical
    to the oracle's.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    n_rows = emb.count()
    n_blocks = _near_dup_blocks(n_rows, spark.sparkContext.defaultParallelism)

    ks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    # pmod, not %: Spark's % is sign-preserving, so a NEGATIVE vec_id
    # would land in a (neg, k) group that no bid==k row joins and its
    # cross-block pairs would silently vanish — violating the exact
    # all-pairs contract (ADVICE r13). Every current corpus has
    # non-negative ids (pmod == % there, output bits unchanged — rule-1a
    # pinned), but exactness must not ride an undocumented id-sign
    # assumption.
    bid = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    tagged = emb.withColumn("bid", bid).withColumn(
        "g",
        F.explode(
            F.transform(
                ks,
                lambda k: F.struct(
                    F.least(F.col("bid"), k).alias("gi"),
                    F.greatest(F.col("bid"), k).alias("gj"),
                ),
            )
        ),
    )

    pre_cut = NEAR_DUP_COS - 1e-6  # below round-half-up's 6-dp boundary

    def _tile(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "raw": pd.Series(dtype="float64")})
        side_a = pdf[pdf["bid"] == gi]
        side_b = pdf if gi == gj else pdf[pdf["bid"] == gj]
        if not len(side_a) or not len(side_b):
            return empty

        def _mat_norm(side):
            m = np.stack(side["v"].to_numpy()).astype(np.float64, copy=False)
            acc = np.zeros(len(m))
            for i in range(m.shape[1]):  # left fold, bit-exact vs _dot
                acc += m[:, i] * m[:, i]
            return m, np.sqrt(acc)

        ma, na = _mat_norm(side_a)
        mb, nb = _mat_norm(side_b)
        ids_a = side_a["vec_id"].to_numpy()
        ids_b = side_b["vec_id"].to_numpy()
        out = []
        # 2D cache tiles: the d-pass left fold re-streams the whole
        # accumulator every pass, so a RAM-resident acc is bandwidth-
        # bound (measured at n=200k: 64 passes x 33 MB row-strip acc ~
        # 20 TB of traffic for one corpus). A 512x512 tile (2 MB acc +
        # 2 MB buffer) stays cache-resident across the 64 passes;
        # per-ELEMENT summation order is untouched by tiling, so output
        # bits are identical (hash-pinned at three gate scales either
        # way).
        TILE = 512
        tmp = np.empty((min(TILE, len(ma)), min(TILE, len(mb))))
        for s in range(0, len(ma), TILE):
            a, ia, npa = ma[s : s + TILE], ids_a[s : s + TILE], na[s : s + TILE]
            for cs in range(0, len(mb), TILE):
                b = mb[cs : cs + TILE]
                ib = ids_b[cs : cs + TILE]
                nb_ = nb[cs : cs + TILE]
                acc = np.zeros((len(a), len(b)))
                t = tmp[: len(a), : len(b)]
                for i in range(a.shape[1]):  # same left fold as _dot
                    # multiply-into-buffer then add: the same two
                    # correctly rounded IEEE ops as `acc += a*b`.
                    np.multiply(a[:, i : i + 1], b[:, i], out=t)
                    acc += t
                raw = acc / (npa[:, None] * nb_[None, :])
                keep = (raw >= pre_cut) & (ia[:, None] != ib[None, :])
                r, c = np.nonzero(keep)
                if not len(r):
                    continue
                va, vb = ia[r], ib[c]
                lo, hi = np.minimum(va, vb), np.maximum(va, vb)
                kept_raw = raw[keep]
                if gi == gj:  # self group sees each pair twice; keep one
                    once = va < vb
                    lo, hi, kept_raw = lo[once], hi[once], kept_raw[once]
                out.append(
                    pd.DataFrame({"vec_a": lo, "vec_b": hi, "raw": kept_raw})
                )
        return pd.concat(out) if out else empty

    raw = tagged.groupBy("g.gi", "g.gj").applyInPandas(
        _tile, "vec_a long, vec_b long, raw double"
    )
    cos = F.round(F.col("raw"), 6)
    return raw.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= F.lit(NEAR_DUP_COS)
    )


def near_dup_cosine_bnlj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r13 BroadcastNestedLoopJoin formulation of
    ``near_dup_cosine`` — kept UNREGISTERED as the JVM-fold parity
    reference: tests/test_similarity_ivf.py asserts the blocked plan's
    output is row- and bit-identical to this one, which is the shape the
    committed r12 gate hashes were produced by."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    a = a.repartition(spark.sparkContext.defaultParallelism)
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return pairs.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= F.lit(NEAR_DUP_COS)
    )


NEAR_DUP_ORACLE = f"""
WITH e AS ({EMB_NORM_SQL})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({DOT_SQL.format(a="a.v", b="b.v")} / (a.norm * b.norm), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({DOT_SQL.format(a="a.v", b="b.v")} / (a.norm * b.norm), 6) >= {NEAR_DUP_COS}
"""


# Banded signed-random-projection (SRP / Charikar) LSH with SCALE-ADAPTIVE
# bit width. Round 6 measured the fixed-4-bit config's candidate ceiling
# Theta(n^2 * bands / 2^bits) biting at sf10mut exactly as the formula
# predicts; the mitigation is bits growing with log2(n) so the expected
# bucket size n/2^bits stays flat (~EMB_LSH_TARGET_BUCKET) and candidate
# volume stays LINEAR: ~bands * TARGET * n / 2 pairs regardless of corpus
# size. Only the join key widens — the plan shape never changes.
#
# Each bit is the sign of a pseudo-random +/-1 projection of the full
# vector (not an axis-aligned dim): the sign matrix is derived from a
# splitmix-seeded parity (functions/hashing.py recurrence), so both Spark
# and the DuckDB oracle re-derive identical hyperplanes from integers —
# and the (band, bit) supply is unbounded, unlike the 64 axis dims.
#
# Recall honesty (P(bit agrees) = 1 - arccos(c)/pi): auto-bits holds
# recall for the HIGH-similarity regime the dedup use case needs while
# keeping candidates linear — at bits=12/8 bands, recall ~0.93 at c=0.95,
# ~0.73 at c=0.9 — but moderate-cosine recall (c~0.4) necessarily decays
# as bits grow (the LSH tradeoff: holding it flat would need bands growing
# like 1/p^bits, i.e. exponentially). For moderate-threshold mining at
# scale, raise ``bands`` (cost is linear in bands) or use the IVF route.
#
# Round 8: bit selection is ENTROPY-AWARE (``measured_sign_bits``). The
# round-7 probe showed the count-based formula under-provisions when the
# corpus's sign-pattern entropy is below ``bits`` bits (correlated
# embeddings -> collision mass ~1.7x the uniform 2^-bits model; p99
# bucket 166 vs 49 expected at sf10mut), leaving candidate volume
# ~n^1.17 instead of flat. The fix measures the collision mass directly:
# one band-0 signature pass at MAX_BITS over a bounded deterministic
# sample, folded to every candidate width b by masking the low b bits
# (bit i's hyperplane is width-independent, so the width-b bucket IS the
# low b bits of the width-MAX bucket), then picks the smallest b whose
# measured per-vector candidate mass n * sum(cnt*(cnt-1))/(m*(m-1)) is
# <= TARGET_BUCKET. Count-based ``auto_sign_bits`` remains as the floor
# (sum p^2 >= 2^-b makes the measured pick >= the count pick up to
# sampling error). All comparisons are integer-exact and the sample is
# keyed on vec_id % samp, so the DuckDB oracle re-derives the identical
# width from the same data.
#
# Bands defaults, measured under SRP at bits=4 (the old axis-aligned
# family's 0.80-at-8-bands curve was exploiting the synthetic corpus's
# axis structure; SRP matches the data-independent theory instead —
# tests/test_similarity_ivf.py re-measures the floors):
#   topk recall@5 at sf0.01 (top-5 cosine ~0.3, the hard weak-neighbor
#   regime): bands=8 -> 0.58 at 42% candidates, 12 -> 0.86 at 55%,
#   16 -> 0.92 at 65%; theory 1-(1-p^4)^bands with p(0.3)=0.597 gives
#   0.66/0.80/0.88 — 12 bands is the knee for topk.
#   near-dup pair recall (c >= 0.4, p >= 0.63): 8 bands measures 0.82 at
#   sf0.001 — the cheaper default holds there.
NEAR_DUP_BANDS = 8
TOPK_BANDS = 12
EMB_DIM = 64
EMB_LSH_TARGET_BUCKET = 64  # expected vectors per (band, bucket) at auto bits
EMB_LSH_MIN_BITS = 4
# Clamp: past n ~ TARGET * 2^20 (~67M vectors in one partition-table, i.e.
# far beyond any single corpus this engine targets before IVF takes over)
# bucket size starts growing linearly again; the clamp keeps the join key
# bounded rather than failing. Documented, not silent: auto_sign_bits is
# the single knob and its value is visible in the plan's literal tree.
EMB_LSH_MAX_BITS = 20
# Collision-mass probe sample bound: the entropy probe hashes at most
# ~2 * SAMPLE_TARGET vectors (vec_id % samp == 0 with samp = n div
# SAMPLE_TARGET), so its cost is flat in corpus size. The modulus sample
# is deterministic and engine-agnostic (no RNG, no hash divergence).
EMB_LSH_SAMPLE_TARGET = 1 << 16
# Degenerate-bucket guard for the banded self-join: a sign bucket holding
# more than max(EMB_BUCKET_CAP_MIN, n/2) vectors (e.g. a boilerplate corpus
# collapsing onto one bucket) is excluded from candidate generation.
# Healthy buckets hold ~n/2^bits <= TARGET, so the cap only trips on
# pathological skew; it is relative (not a fixed count) because bucket size
# may legitimately approach n/2 on tiny corpora at MIN_BITS.
EMB_BUCKET_CAP_MIN = 200
# In-row pair-generation bound (round 19): buckets up to this size emit
# their candidate pairs from ONE collected row (the minhash bucket
# pattern — worst case CHUNK*(CHUNK-1)/2 id pairs ~ 0.5 MB in-row);
# larger surviving buckets (legal up to the n/2 cap above, reachable
# only on pathological skew) keep streaming through the ids-only
# self-join, which materializes nothing per row. 4x TARGET_BUCKET: the
# healthy tail stays in-row, the route split is a constant of the
# operator, and both routes emit the identical pair set (each pair at
# its first matching band), so the split moves no output bit.
EMB_BUCKET_CHUNK = 256


def auto_sign_bits(n: int) -> int:
    """Smallest b in [MIN_BITS, MAX_BITS] with n <= TARGET_BUCKET * 2^b.

    Integer-exact (no float log2), so Spark (computing it driver-side from
    a count) and the DuckDB oracle (computing it in SQL from the same
    count) can never disagree on a boundary.
    """
    for b in range(EMB_LSH_MIN_BITS, EMB_LSH_MAX_BITS + 1):
        if n <= EMB_LSH_TARGET_BUCKET << b:
            return b
    return EMB_LSH_MAX_BITS


# Probe memo: repeated LSH queries over an UNCHANGED corpus in one
# session (bench loops, the topk+near_dup twins sharing one embeddings
# relation) pay the count+probe once. Keyed on (applicationId, analyzed-
# plan semanticHash, explicit-n-or-auto): the semantic hash covers the
# scan path and every transformation, so a different sf_dir or a
# different projection never aliases; a same-plan re-read of a corpus
# mutated IN PLACE mid-session would reuse the stale width — no engine
# path does that (gate/bench/driver sessions each bind one immutable
# sf_dir), and the width is re-derived fresh in every new session.
_SIGN_BITS_MEMO: "dict[tuple, int]" = {}
_SIGN_BITS_MEMO_CAP = 64
# Test hook: counts actual probe executions (memo misses).
PROBE_RUNS = 0


def measured_sign_bits(emb: DataFrame, n: "int | None" = None) -> int:
    """Entropy-aware bit width: smallest b in [auto_sign_bits(n), MAX_BITS]
    whose MEASURED per-vector candidate mass is <= TARGET_BUCKET.
    Memoized per (session, plan) — see ``_SIGN_BITS_MEMO`` above.

    ``auto_sign_bits`` assumes uniform buckets (collision mass 2^-bits);
    real embedding corpora have sign-pattern entropy below ``bits`` bits,
    so buckets are heavier than the count predicts (round-7 probe: ~1.7x
    at sf10mut) and candidate volume creeps super-linear. This probe
    measures the mass instead of modeling it:

    1. Deterministic sample: vec_id % samp == 0 with
       samp = max(1, n div SAMPLE_TARGET) — bounded, engine-agnostic.
    2. One band-0 signature per sampled vector at MAX_BITS width. Bit i's
       hyperplane does not depend on the configured width, so the
       width-b bucket is exactly ``bucket_MAX & (2^b - 1)`` — one probe
       pass covers every candidate width.
    3. Distributed fold: per-width bucket counts -> mm(b) = sum cnt*(cnt-1)
       and m(b) = sum cnt (17 rows collected; model-sized, never data-
       sized). mm is the unbiased pair-collision estimator: candidate
       pairs per band at width b ~ n^2/2 * mm/(m*(m-1)).
    4. Pick min b with  n * mm(b) <= TARGET_BUCKET * m * (m-1)  — i.e.
       expected per-vector candidates per band <= TARGET_BUCKET. All
       integers, so the DuckDB oracle (same sample, same fold in SQL)
       lands on the identical width. mm(b) is nonincreasing in b
       (masking merges buckets), so the pick is well-defined.

    Floor: max with auto_sign_bits(n) — sum p^2 >= 2^-b means the
    measured pick can only fall below the count pick by sampling error,
    and the floor keeps the documented log2(n) growth contract exact.
    """
    global PROBE_RUNS
    try:
        key = (
            emb.sparkSession.sparkContext.applicationId,
            emb.semanticHash(),
            "auto" if n is None else n,
        )
    except Exception:
        key = None  # unhashable plan (never seen): just run the probe
    if key is not None and key in _SIGN_BITS_MEMO:
        return _SIGN_BITS_MEMO[key]
    PROBE_RUNS += 1

    def _memo(bits: int) -> int:
        if key is not None:
            if len(_SIGN_BITS_MEMO) >= _SIGN_BITS_MEMO_CAP:
                _SIGN_BITS_MEMO.pop(next(iter(_SIGN_BITS_MEMO)))
            _SIGN_BITS_MEMO[key] = bits
        return bits

    if n is None:
        n = emb.count()
    if n <= 0:
        return _memo(EMB_LSH_MIN_BITS)
    floor_bits = auto_sign_bits(n)
    if floor_bits >= EMB_LSH_MAX_BITS:
        return _memo(EMB_LSH_MAX_BITS)
    samp = max(1, n // EMB_LSH_SAMPLE_TARGET)
    sig = emb if samp == 1 else emb.filter(F.col("vec_id") % samp == 0)
    # The probe hashes at MAX_BITS x EMB_DIM per row; on a narrow scan
    # (single-row-group parquet) that would run on one core. The sample
    # is bounded (~SAMPLE_TARGET rows), so the round-robin spread is a
    # bounded-size shuffle, never data-sized.
    cores = emb.sparkSession.sparkContext.defaultParallelism
    sig = sig.repartition(cores)
    probe = srp_signs(1, EMB_LSH_MAX_BITS)[0]
    mass_rows = (
        sig.select(_band_bucket(F.col("v"), probe).alias("bk"))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.explode(
                F.sequence(F.lit(EMB_LSH_MIN_BITS), F.lit(EMB_LSH_MAX_BITS))
            ).alias("b"),
            "bk",
            "cnt",
        )
        .groupBy("b", F.expr("bk & (shiftleft(cast(1 as bigint), b) - 1)").alias("bb"))
        .agg(F.sum("cnt").alias("cb"))
        .groupBy("b")
        .agg(
            F.sum(F.col("cb") * (F.col("cb") - F.lit(1))).alias("mm"),
            F.sum("cb").alias("m"),
        )
        .collect()
    )
    stats = {int(r["b"]): (int(r["mm"]), int(r["m"])) for r in mass_rows}
    # Empty sample (pathological: no vec_id divisible by samp) -> MAX,
    # mirroring the oracle's coalesce(min over empty, MAX) exactly.
    measured = EMB_LSH_MAX_BITS
    for b in range(EMB_LSH_MIN_BITS, EMB_LSH_MAX_BITS + 1):
        if b not in stats:
            continue
        mm, m = stats[b]
        if n * mm <= EMB_LSH_TARGET_BUCKET * m * (m - 1):
            measured = b
            break
    return _memo(max(floor_bits, measured))


def _srp_sign(band: int, bit: int, dim: int) -> float:
    """+/-1 hyperplane coefficient: md5 parity of "band,bit,dim".

    md5 (not a linear-congruential parity, whose modular structure produced
    duplicate hyperplanes — measured max row correlation 1.0 vs 0.375 here)
    gives i.i.d.-quality signs. The coefficients ship to BOTH engines as
    literals (Spark: foldable array literals; DuckDB: the `s` CTE constant
    in ``_SQL_SIGNS``), so no arithmetic re-derivation is needed per row.
    """
    import hashlib

    return (
        1.0
        if hashlib.md5(f"{band},{bit},{dim}".encode()).digest()[0] & 1 == 0
        else -1.0
    )


def srp_signs(bands: int, bits: int, dim: int = EMB_DIM) -> list[list[list[float]]]:
    """signs[band][bit] = dim-length +/-1 hyperplane (the default family).

    ``dim`` must match the vector length — zip_with against a longer sign
    row would NULL-poison the projection."""
    return [
        [[_srp_sign(j, i, d) for d in range(dim)] for i in range(bits)]
        for j in range(bands)
    ]


def axis_signs(bands: int, bits: int, dim: int = EMB_DIM) -> list[list[list[float]]]:
    """Axis-aligned hyperplanes (bit i of band j = sign of dim j*bits+i) —
    the pre-round-7 family, kept for engineered-fixture tests that need to
    place vectors in specific buckets by construction."""
    return [
        [
            [1.0 if d == (j * bits + i) % dim else 0.0 for d in range(dim)]
            for i in range(bits)
        ]
        for j in range(bands)
    ]


def _band_bucket(v: Column, band_signs: list[list[float]]) -> Column:
    """Sign pattern of the band's projections as a long bucket key.

    Each +/-1 coefficient array is a foldable literal — Catalyst constant-
    folds it, so per-row work is exactly bits x 64 multiply-adds, JVM-side.
    """
    bucket = F.lit(0).cast("long")
    for i, srow in enumerate(band_signs):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(s) for s in srow]), lambda x, s: x * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(proj > F.lit(0.0), F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def near_dup_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.4) via banded SRP LSH —
    the scale path beside the exact all-pairs ``near_dup_cosine``.

    OR-of-ANDs banding (same construction as MinHash-LSH, with signed
    random projections as the hash family): 8 bands of auto_sign_bits(n)
    bits each; a pair is a candidate when ALL bits agree in ANY band, then
    exact cosine verifies. Per-band candidate volume is
    sum(bucket_size^2) ~ n^2 * (collision mass), and the ENTROPY-AWARE
    width (``measured_sign_bits``: bits chosen from the measured mass,
    count-based growth as the floor) pins that at ~TARGET_BUCKET * n —
    LINEAR in the corpus even when sign-pattern entropy is below the bit
    width (the round-7 probe's residual ~n^1.17 creep). Recall at cosine
    c is 1-(1-p^bits)^bands with p = 1 - arccos(c)/pi; see the constants
    block for the scale/recall contract. No false positives by
    construction (candidates still pass the exact threshold).

    Recall trade at scale (documented, measured): adaptive bits keep
    candidates linear and leave HIGH-similarity output unchanged (sf1
    pair set byte-identical under the round-7 widening), but
    moderate-cosine pair count necessarily drops as the corpus grows —
    measured 159,100 -> 102,600 pairs at sf1 when bits grew 4 -> 11
    (SCALE_sf10_r7.md). Recovery routes for moderate-threshold mining:
    raise ``bands`` (cost linear in bands) or use the IVF family.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    return near_dup_lsh_from(emb)


def near_dup_lsh_from(
    emb: DataFrame,
    bands: int = NEAR_DUP_BANDS,
    bits: "int | None" = None,
    signs: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """Banded-LSH near-dup pairs from a normed (vec_id, v, norm) relation;
    see ``near_dup_cosine_lsh``. ``bands`` moves along the recall-vs-
    candidates curve; ``bits`` defaults to measured_sign_bits(emb) — the
    entropy-aware width (bounded probe; auto_sign_bits(n) as the count-
    based floor), the price of the scale-adaptive key. ``signs``
    overrides the hash family (tests use ``axis_signs`` to place vectors
    in engineered buckets). Buckets over max(EMB_BUCKET_CAP_MIN, n/2) are
    dropped (degenerate-skew guard).

    Dedup is in-row, not a shuffle: every band relation carries the
    vector's full per-band bucket array (NULL where the cap dropped the
    entry), and a pair is emitted only at the FIRST band whose buckets
    match — ``array_position(zip_with(=), true)`` — so a pair colliding
    in k bands surfaces exactly once without a ``distinct`` over the
    candidate stream. NULL masking keeps cap semantics exact: a capped
    (band, bucket) entry can be neither the first match nor any match
    (NULL = NULL is NULL, never true).

    Round 19 (VERDICT r18 order 1 — output bit-identical): candidate
    generation is DE-PAYLOADED. The pre-r19 form self-joined the band
    relation with ``v[64] + norm`` riding on BOTH sides (~600 B/row x
    corpus x bands x 2 — the last corpus-payload-carrying shuffle in the
    engine); candidates are now id-only. Healthy buckets (size <=
    EMB_BUCKET_CHUNK) emit their pairs IN-ROW from one
    ``groupBy(band, bucket)`` collect — the r18 minhash bucket pattern,
    one exchange of (vec_id, mb) rows; buckets between CHUNK and the
    n/2 cap (pathological skew only; zero at every gate scale) keep the
    old streaming self-join shape, ids-only. Both routes apply the same
    first-match test, and a (band, bucket) group takes exactly one
    route, so each surviving pair is emitted exactly once — the same
    set the payload-carrying join produced. Vectors re-attach to the
    surviving id pairs through the minhash-style pair joins for the
    exact-cosine verify: the only exchanges that now move v[64] are the
    two corpus-keyed re-attach exchanges (ReusedExchange-able, and
    candidate-pair-sized on the pair side), not corpus x bands x 2.
    """
    if signs is None:
        if bits is None:
            bits = measured_sign_bits(emb)
        signs = srp_signs(bands, bits)
    banded_ex = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_bucket(F.col("v"), signs[j]).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.bucket")
    tot = emb.agg(F.count(F.lit(1)).alias("n_total"))
    # <= bands * 2^bits rows: aggregate instead of a window, then broadcast
    # the surviving keys back — the band relation is never windowed.
    counts = banded_ex.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    ok = (
        counts.crossJoin(F.broadcast(tot))
        .filter(
            F.col("bucket_n")
            <= F.greatest(
                F.lit(EMB_BUCKET_CAP_MIN).cast("long"), F.expr("n_total div 2")
            )
        )
        .select("band", "bucket", "bucket_n")
    )
    surv = banded_ex.join(F.broadcast(ok), ["band", "bucket"])
    # The per-vector mask now carries (bucket, bucket_n) per band:
    # bucket_n is a pure function of (band, bucket), so struct equality
    # in the first-match test is exactly the old bucket equality, and the
    # size is what routes each group to its pair-generation shape below.
    masked = (
        surv.groupBy("vec_id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        "band", F.struct("bucket", "bucket_n").alias("bv")
                    )
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.element_at(F.col("m"), j),
            ).alias("mb"),
        )
    )
    side = (
        masked.select("vec_id", "mb", F.posexplode("mb").alias("band", "bv"))
        .filter(F.col("bv").isNotNull())
        .select(
            "vec_id",
            "mb",
            "band",
            F.col("bv.bucket").alias("bucket"),
            F.col("bv.bucket_n").alias("bucket_n"),
        )
    )

    def first_match(a_mb: Column, b_mb: Column) -> Column:
        return F.array_position(
            F.zip_with(a_mb, b_mb, lambda x, y: x == y), F.lit(True)
        )

    # Route 1 — healthy buckets, in-row upper triangle (ids + masks only;
    # sort_array canonicalizes collect_list order, vec_id is unique per
    # bucket, so the strict upper triangle is exactly a_vec_id < b_vec_id).
    small_buckets = (
        side.filter(F.col("bucket_n") <= F.lit(EMB_BUCKET_CHUNK))
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "mb"))).alias("ds"))
    )
    pairs_small = (
        small_buckets.select(
            "band",
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p"),
        )
        .filter(first_match(F.col("p.a.mb"), F.col("p.b.mb")) == F.col("band") + 1)
        .select(
            F.col("p.a.vec_id").alias("vec_a"), F.col("p.b.vec_id").alias("vec_b")
        )
    )
    # Route 2 — over-CHUNK survivors (<= n/2 cap): the streaming ids-only
    # self-join; nothing is materialized per row, so a pathological
    # boilerplate bucket degrades throughput, never memory.
    big = side.filter(F.col("bucket_n") > F.lit(EMB_BUCKET_CHUNK))
    a = big.select(
        F.col("vec_id").alias("a_vec_id"), F.col("mb").alias("a_mb"), "band", "bucket"
    )
    b = big.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("mb").alias("b_mb"),
        F.col("band").alias("band2"),
        F.col("bucket").alias("bucket2"),
    )
    pairs_big = (
        a.join(
            b,
            (F.col("band") == F.col("band2"))
            & (F.col("bucket") == F.col("bucket2"))
            & (F.col("a_vec_id") < F.col("b_vec_id")),
        )
        .filter(first_match(F.col("a_mb"), F.col("b_mb")) == F.col("band") + 1)
        .select(F.col("a_vec_id").alias("vec_a"), F.col("b_vec_id").alias("vec_b"))
    )
    cand = pairs_small.unionByName(pairs_big)

    # Exact-cosine verify: vectors re-attach to the id pairs once per
    # side (the minhash verify shape); same _dot fold on the same emb
    # columns, so every cosine bit matches the payload-carrying plan's.
    av = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("a_v"),
        F.col("norm").alias("a_norm"),
    )
    bv = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("b_v"),
        F.col("norm").alias("b_norm"),
    )
    cos = F.round(
        _dot(F.col("a_v"), F.col("b_v")) / (F.col("a_norm") * F.col("b_norm")), 6
    )
    return (
        cand.join(av, "vec_a")
        .join(bv, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(NEAR_DUP_COS))
    )


# The SQL twin of srp_signs/_band_bucket/auto_sign_bits: bits comes from a
# scalar subquery over count(*) (same integer-exact rule as auto_sign_bits),
# the bucket is a dynamic-length list comprehension over range(bits), and
# the hyperplane coefficients are the SAME literal matrix Spark folds into
# its plan, inlined as the one-row `s` CTE (bands x MAX_BITS x 64 signs).
_SQL_BITS = (
    f"coalesce((SELECT min(b) FROM (SELECT unnest(range({EMB_LSH_MIN_BITS}, "
    f"{EMB_LSH_MAX_BITS + 1})) AS b) WHERE (SELECT count(*) FROM e) <= "
    f"{EMB_LSH_TARGET_BUCKET} * (1::BIGINT << b)), {EMB_LSH_MAX_BITS})"
)


def _sql_bits_ctes() -> str:
    """CTE chain `s, p0, psig, pbc, pfold, pmass, p` — the SQL twin of
    ``measured_sign_bits`` (entropy-aware width) over the `e` relation.

    Same deterministic sample (vec_id % samp == 0), same band-0 probe
    signature at MAX_BITS (S index i+1 = band 0, bit i), same mask-fold to
    every candidate width, same integer criterion, with the count-based
    ``_SQL_BITS`` as the greatest() floor — so DuckDB lands on exactly the
    width Spark computed driver-side.
    """
    probe_bucket = (
        f"CAST(list_sum([CASE WHEN list_reduce([v[d + 1] * S[i + 1][d + 1] "
        f"for d in range(0, {EMB_DIM})], (x, y) -> x + y) > 0.0 "
        f"THEN (1::BIGINT << i) ELSE 0 END "
        f"for i in range(0, {EMB_LSH_MAX_BITS})]) AS BIGINT)"
    )
    return f"""s AS ({_sql_signs_cte()}),
p0 AS (SELECT greatest(1, (SELECT count(*) FROM e) // {EMB_LSH_SAMPLE_TARGET}) AS samp),
psig AS (SELECT {probe_bucket} AS bk FROM e, s, p0 WHERE vec_id % samp = 0),
pbc AS (SELECT bk, count(*) AS cnt FROM psig GROUP BY bk),
pfold AS (
    SELECT bs.b AS b, bk & ((1::BIGINT << bs.b) - 1) AS bb, sum(cnt) AS cb
    FROM pbc, (SELECT unnest(range({EMB_LSH_MIN_BITS}, {EMB_LSH_MAX_BITS + 1})) AS b) bs
    GROUP BY 1, 2
),
pmass AS (SELECT b, sum(cb * (cb - 1)) AS mm, sum(cb) AS m FROM pfold GROUP BY b),
p AS (SELECT greatest({_SQL_BITS}, coalesce(
        (SELECT min(b) FROM pmass
         WHERE (SELECT count(*) FROM e) * mm <= {EMB_LSH_TARGET_BUCKET} * m * (m - 1)),
        {EMB_LSH_MAX_BITS})) AS bits)"""


def _sql_signs_cte() -> str:
    """One-row CTE body holding S: the flat [band*MAX_BITS + bit] -> 64-dim
    sign rows, identical to ``srp_signs(max(NEAR_DUP_BANDS, TOPK_BANDS),
    MAX_BITS)`` — wide enough for both oracle variants."""
    n_bands = max(NEAR_DUP_BANDS, TOPK_BANDS)
    signs = srp_signs(n_bands, EMB_LSH_MAX_BITS)
    rows = ", ".join(
        "[" + ", ".join("1.0" if x > 0 else "-1.0" for x in signs[j][i]) + "]"
        for j in range(n_bands)
        for i in range(EMB_LSH_MAX_BITS)
    )
    return f"SELECT [{rows}] AS S"


def _band_bucket_sql(band_expr: str = "band") -> str:
    """Bucket of ``band_expr`` for vector column v at dynamic bit width
    (reads ``bits`` from the `p` CTE and the sign matrix from `s`)."""
    return (
        f"CAST(list_sum([CASE WHEN list_reduce([v[d + 1] * "
        f"S[{band_expr} * {EMB_LSH_MAX_BITS} + i + 1][d + 1] "
        f"for d in range(0, {EMB_DIM})], (x, y) -> x + y) > 0.0 "
        f"THEN (1::BIGINT << i) ELSE 0 END "
        f"for i in range(0, (SELECT bits FROM p))]) AS BIGINT)"
    )


NEAR_DUP_LSH_ORACLE = f"""
WITH e AS ({EMB_NORM_SQL}),
{_sql_bits_ctes()},
banded0 AS (
    SELECT vec_id, bands.band, {_band_bucket_sql("bands.band")} AS bucket
    FROM e, s, (SELECT unnest(range({NEAR_DUP_BANDS})) AS band) bands
),
banded AS (
    SELECT vec_id, band, bucket,
           count(*) OVER (PARTITION BY band, bucket) AS bucket_n,
           (SELECT count(*) FROM e) AS n_total
    FROM banded0
),
bandedf AS (
    SELECT vec_id, band, bucket FROM banded
    WHERE bucket_n <= greatest({EMB_BUCKET_CAP_MIN}, n_total // 2)
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bandedf a JOIN bandedf b
      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round({DOT_SQL.format(a="ea.v", b="eb.v")} / (ea.norm * eb.norm), 6) AS cosine
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE round({DOT_SQL.format(a="ea.v", b="eb.v")} / (ea.norm * eb.norm), 6) >= {NEAR_DUP_COS}
"""


def topk_lsh(
    spark: SparkSession,
    sf_dir: str,
    bands: int = TOPK_BANDS,
    bits: "int | None" = None,
) -> DataFrame:
    """ANN top-5 via banded signed-random-projection LSH.

    OR-of-ANDs construction (TOPK_BANDS=12 bands — the measured topk
    recall knee, vs near_dup's cheaper 8 — x measured_sign_bits(n) SRP
    bits; the hash FAMILY is shared with ``near_dup_cosine_lsh``): a
    corpus vector is a candidate when ANY band's full sign pattern
    matches the query's, then exact cosine ranks the candidates. A single
    wide bucket (the original formulation) has recall ~p^bits which
    collapses for moderate-cosine neighbors; banding lifts recall to
    1-(1-p^bits)^bands at candidate volume ~bands/2^bits of the corpus —
    and the entropy-aware bits keep per-query candidates
    ~bands * TARGET_BUCKET, flat in corpus size.

    The driver oracle (TOPK_LSH_ORACLE) is generated for the DEFAULT
    bands/bits: a caller passing non-default values gets a correct query
    but must not compare it against the fixed-default oracle twin.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    if bits is None:
        bits = measured_sign_bits(emb)
    signs = srp_signs(bands, bits)
    banded = emb.select(
        "vec_id",
        "v",
        "norm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_bucket(F.col("v"), signs[j]).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "v", "norm", "bk.band", "bk.bucket")
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("band").alias("qband"),
        F.col("bucket").alias("qbucket"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    # Cosine is computed BEFORE the duplicate collapse (every copy of a
    # (query, candidate) pair carries the same qv/qn/v/norm, so the same
    # cosine — which copy survives is immaterial): the dedup exchange now
    # moves (query_id, vec_id, cosine) ~24 B rows instead of both v[64]
    # payloads (~1 KB). The repartition folds that dedup and the rank
    # window into ONE query_id exchange (hashpartitioning(query_id)
    # satisfies the (query_id, vec_id) clustered distribution).
    scored = (
        banded.join(
            F.broadcast(q),
            (F.col("band") == F.col("qband"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def _topk_lsh_oracle() -> str:
    return f"""
WITH e AS ({EMB_NORM_SQL}),
{_sql_bits_ctes()},
banded AS (
    SELECT vec_id, v, norm, bands.band, {_band_bucket_sql("bands.band")} AS bucket
    FROM e, s, (SELECT unnest(range({TOPK_BANDS})) AS band) bands
),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn, band, bucket
      FROM banded WHERE vec_id < {N_QUERIES}),
cand AS (
    SELECT DISTINCT q.query_id, b.vec_id
    FROM banded b JOIN q
      ON b.band = q.band AND b.bucket = q.bucket AND b.vec_id <> q.query_id
),
scored AS (
    SELECT c.query_id, c.vec_id,
           round({DOT_SQL.format(a="eq.v", b="ev.v")} / (eq.norm * ev.norm), 6) AS cosine
    FROM cand c
    JOIN e eq ON eq.vec_id = c.query_id
    JOIN e ev ON ev.vec_id = c.vec_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


TOPK_LSH_ORACLE = _topk_lsh_oracle()


# --- IVF (inverted-file) ANN ------------------------------------------------

IVF_K = 16  # coarse centroids: the vectors with vec_id in [100, 116)
IVF_CENT_LO, IVF_CENT_HI = 100, 100 + IVF_K
# Default probe budget sits at the measured recall knee (nprobe=8 -> 0.74
# recall@5 fixed / 0.80 trained at sf0.01); below it recall falls off a
# cliff (nprobe=4 -> 0.44), above it cost grows faster than recall.
IVF_NPROBE = 8

# Fitted model parameters (centroids, PQ codebooks, corpus counts) now
# live in the persisted index-artifact layer (operators/ann_index.py):
# in-session memo in front of a parquet artifact keyed by corpus
# FINGERPRINT (realpath + size + mtime), so an in-place dataset rewrite
# auto-invalidates on disk; clear_stats_cache() drops the in-session
# memos (tools/make_scale_data.py calls it after mutating a dir).
def clear_stats_cache() -> None:
    """Drop in-session fitted-model/count memos (call after mutating a
    dataset dir). Disk index artifacts need no clearing — they are keyed
    by corpus fingerprint (ann_index)."""
    from mapreduce_hadoop_spark.operators import ann_index

    ann_index.clear_memos()


def _trained_centroids(
    spark: SparkSession, emb: DataFrame, sf_dir: str, k: int = IVF_K
) -> DataFrame:
    """K-means coarse centroids as a (cent_id, cv, cn) relation — the
    trained drop-in for ``_ivf_centroids``. Load-or-fit through the
    persisted index artifact (ann_index.coarse_centroids): the FAISS
    train/add split — a session that finds the artifact plans ZERO
    k-means jobs. Model parameters, legitimately driver-sized."""
    from mapreduce_hadoop_spark.operators import ann_index

    cents_rows = ann_index.coarse_centroids(spark, emb, sf_dir, k)
    return spark.createDataFrame(cents_rows, "cent_id int, cv array<double>").select(
        "cent_id",
        "cv",
        F.sqrt(_dot(F.col("cv"), F.col("cv"))).alias("cn"),
    )


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    return emb.filter(
        (F.col("vec_id") >= IVF_CENT_LO) & (F.col("vec_id") < IVF_CENT_HI)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )


def _cents_array(cents: DataFrame) -> DataFrame:
    """All centroids as ONE row carrying a cent_id-sorted
    ``array<struct<cent_id, cv, cn>>`` — the broadcast side of the
    in-row assignment below. Model-sized by construction (K centroids);
    the collect_list aggregate moves K rows, never the corpus, and
    ``sort_array`` canonicalizes the nondeterministic collect order."""
    return cents.agg(
        F.sort_array(F.collect_list(F.struct("cent_id", "cv", "cn"))).alias(
            "_cents"
        )
    )


def _ccos_desc_cent_asc(l: Column, r: Column) -> Column:
    """array_sort comparator: (ccos DESC, cent_id ASC) — the exact order
    the pre-r18 window row_number used. Spark SQL comparison semantics
    (NaN greater than everything, -0.0 == 0.0) match the sort order the
    window applied, so ties and float corners break identically."""
    return (
        F.when(l["ccos"] > r["ccos"], F.lit(-1))
        .when(l["ccos"] < r["ccos"], F.lit(1))
        .when(l["cent_id"] < r["cent_id"], F.lit(-1))
        .when(l["cent_id"] > r["cent_id"], F.lit(1))
        .otherwise(F.lit(0))
    )


def _assign(emb: DataFrame, cents: DataFrame, n: int, out: str) -> DataFrame:
    """Rank centroids by cosine per vector; keep the top ``n`` as ``out``.

    MAP-SIDE since round 18 (guide §2.4): the centroids ride along as one
    broadcast array row and each vector picks its top-``n`` in-row — an
    array_sort over K scored structs, sliced and exploded. The pre-r18
    form ranked with ``row_number() OVER (PARTITION BY vec_id)``, which
    hash-exchanged the FULL CORPUS (vec_id, v[64], norm) just to pick a
    per-row argmax — the single largest shuffle in every IVF plan, and
    exactly what the operator docstrings always claimed was "a map-side
    pass". Output is bit-identical: the cosine expression is unchanged
    per (vector, centroid) pair, and the comparator reproduces the
    window's (ccos DESC, cent_id ASC) order including NaN/tie corners
    (re-verified against the committed r17 gate hashes at sf0.001/0.01/
    0.1 for every consumer).
    """
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            (_dot(F.col("v"), c["cv"]) / (F.col("norm") * c["cn"])).alias(
                "ccos"
            ),
            c["cent_id"].alias("cent_id"),
        ),
    )
    top = F.slice(F.array_sort(scored, _ccos_desc_cent_asc), 1, n)
    return (
        emb.crossJoin(F.broadcast(_cents_array(cents)))
        .select("vec_id", "v", "norm", F.explode(top).alias("_a"))
        .select("vec_id", "v", "norm", F.col("_a.cent_id").alias(out))
    )


def topk_ivf(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF ANN, fixed-centroid variant: K=16 deterministic coarse centroids
    (the vectors with vec_id in [100,116)), every vector files into its
    nearest centroid's inverted list, a query probes its ``nprobe`` nearest
    lists and ranks only those candidates by exact cosine.

    This is the ORACLE-CHECKABLE TWIN of the primary ANN path,
    ``topk_ivf_trained`` — deterministic centroids make the whole plan
    SQL-expressible so the driver can hash-verify it; the trained variant
    is what a user should deploy (balanced lists, higher recall at equal
    nprobe).

    100 TB shape: centroids are broadcast (model-sized, not data-sized);
    list assignment is a map-side pass; the probe is an equi-join on
    cent_id, so candidate volume per query is nprobe/K of the corpus.
    Recall rises with nprobe without changing the plan — measured at
    sf0.01 (tests/test_similarity_ivf.py re-measures):
      nprobe=4:  recall@5 0.44 at 24% candidates
      nprobe=8:  recall@5 0.74 at 49%            <- default (the knee)
      nprobe=10: recall@5 0.82 at 62%
      nprobe=12: recall@5 0.94 at 74%
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = _ivf_centroids(emb)
    lists = _assign(emb, cents, 1, "cent_id")
    probes = _assign(
        emb.filter(F.col("vec_id") < N_QUERIES), cents, nprobe, "cent_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "cent_id",
    )
    pairs = lists.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with k-means-trained coarse centroids — the PRIMARY ANN
    path (Spark ML KMeans, fixed seed). Same assign/probe/rank plan as
    ``topk_ivf``; only the centroid source differs — trained centroids
    track the data distribution, so inverted lists are balanced and recall
    at equal nprobe improves (sf0.01, nprobe=8: 0.80 trained vs 0.74
    fixed; bounded in tests/test_similarity_ivf.py). ``topk_ivf`` with its
    deterministic centroids is the oracle-checkable twin the driver
    hash-verifies.

    Training is not SQL-expressible -> rows-only driver check; the
    centroids are model parameters, legitimately driver-sized (k x dim
    doubles), broadcast into the plan. The fit is cached per sf_dir so
    repeated calls (bench, gate) time the probe plan, not the training —
    exactly how a deployed index works: train once, probe forever.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = _trained_centroids(spark, emb, sf_dir)
    lists = _assign(emb, cents, 1, "cent_id")
    probes = _assign(
        emb.filter(F.col("vec_id") < N_QUERIES), cents, IVF_NPROBE, "cent_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "cent_id",
    )
    pairs = lists.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


TOPK_IVF_ORACLE = f"""
WITH e AS ({EMB_NORM_SQL}),
c AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e
      WHERE vec_id >= {IVF_CENT_LO} AND vec_id < {IVF_CENT_HI}),
assigned AS (
    SELECT vec_id, v, norm, cent_id FROM (
        SELECT e.vec_id, e.v, e.norm, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                            c.cent_id) AS crank
        FROM e CROSS JOIN c
    ) WHERE crank <= 1
),
probes AS (
    SELECT vec_id AS query_id, v AS qv, norm AS qn, cent_id FROM (
        SELECT e.vec_id, e.v, e.norm, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                            c.cent_id) AS crank
        FROM e CROSS JOIN c
        WHERE e.vec_id < {N_QUERIES}
    ) WHERE crank <= {IVF_NPROBE}
),
scored AS (
    SELECT p.query_id, a.vec_id,
           round({DOT_SQL.format(a="p.qv", b="a.v")} / (p.qn * a.norm), 6) AS cosine
    FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
    WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


# Adaptive-probe twin dials: the SAME (1+eps)^2 cosine-gap closeness
# rule the trained serving paths apply driver-side
# (_probe_lists_adaptive), restated as a window formulation so the
# driver can hash-verify its SEMANTICS. eps is shared with the deployed
# dial (IVFPQ_PROBE_EPS); the floor sits below the fixed twin's
# nprobe=8 so the rule — not the floor — decides most widths. The bound
# is computed ONCE in Python and embedded as the same double literal in
# the Spark plan and the SQL, so both engines compare against
# bit-identical thresholds.
IVF_ADAPT_FLOOR = 4
# = IVFPQ_PROBE_EPS (defined with the trained-path dial constants below;
# an assert next to that definition enforces the twin serves the
# DEPLOYED eps — this literal exists only because the oracle string is
# built at import time, before that block).
IVF_ADAPT_EPS = 0.3


def topk_ivf_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN under the ADAPTIVE probe-width rule, fixed centroids —
    the oracle-checkable twin of the round-13 serving dial (VERDICT r15
    order 5): a query probes its nearest list plus every list whose
    cosine-gap ``1 - cos`` is within ``(1+eps)^2`` of the nearest's,
    floored at ``IVF_ADAPT_FLOOR`` and capped at K — exactly
    ``_probe_lists_adaptive``'s criterion (SPANN's closeness rule on
    the probe side), which until this round only k-means-trained
    rows-only paths exercised. Expressed as a pure window formulation
    (min-gap + conditional count over the per-query centroid scores —
    no driver arithmetic at all), so the whole dial is SQL-expressible
    and the driver hash-pins its semantics: an off-by-one in the width
    clamp, a wrong tie order, or a drifted eps would all hash-mismatch.

    The trained paths compute the same rule driver-side over numpy (the
    request-sized query matrix x the broadcast-sized centroid list);
    this twin pins the RULE, not that vectorized evaluation — ties at
    the bound break identically ((gap asc, cent_id) here = stable
    argsort with cent_id-ascending input there).

    100 TB shape: identical to ``topk_ivf`` — the probe relation stays
    query-sized (the window runs over Q x K scored rows, model-sized),
    and the candidate join still reads nprobe-ish/K of the corpus; the
    dial only moves per-query width between the floor and K."""
    bound = (1.0 + IVF_ADAPT_EPS) ** 2
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = _ivf_centroids(emb)
    lists = _assign(emb, cents, 1, "cent_id")
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    g = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "norm", "cent_id", (F.lit(1.0) - cos).alias("gap")
        )
    )
    wq = Window.partitionBy("vec_id")
    wo = Window.partitionBy("vec_id").orderBy(F.col("gap").asc(), F.col("cent_id"))
    probes = (
        g.select(
            "*",
            F.min("gap").over(wq).alias("gmin"),
            F.row_number().over(wo).alias("crank"),
        )
        .select(
            "*",
            F.sum(
                F.when(F.col("gap") <= F.lit(bound) * F.col("gmin"), 1).otherwise(0)
            )
            .over(wq)
            .alias("close"),
        )
        .filter(
            F.col("crank")
            <= F.greatest(
                F.lit(IVF_ADAPT_FLOOR), F.least(F.lit(IVF_K), F.col("close"))
            )
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
            "cent_id",
        )
    )
    pairs = lists.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def _topk_ivf_adaptive_oracle() -> str:
    bound = (1.0 + IVF_ADAPT_EPS) ** 2
    return f"""
WITH e AS ({EMB_NORM_SQL}),
c AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e
      WHERE vec_id >= {IVF_CENT_LO} AND vec_id < {IVF_CENT_HI}),
assigned AS (
    SELECT vec_id, v, norm, cent_id FROM (
        SELECT e.vec_id, e.v, e.norm, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                            c.cent_id) AS crank
        FROM e CROSS JOIN c
    ) WHERE crank <= 1
),
g AS (
    SELECT e.vec_id, e.v, e.norm, c.cent_id,
           1.0 - {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) AS gap
    FROM e CROSS JOIN c
    WHERE e.vec_id < {N_QUERIES}
),
p AS (
    SELECT *,
           min(gap) OVER (PARTITION BY vec_id) AS gmin,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY gap ASC, cent_id) AS crank
    FROM g
),
probes AS (
    SELECT vec_id AS query_id, v AS qv, norm AS qn, cent_id FROM (
        SELECT *,
               sum(CASE WHEN gap <= {bound!r} * gmin THEN 1 ELSE 0 END)
                   OVER (PARTITION BY vec_id) AS close
        FROM p
    ) WHERE crank <= greatest({IVF_ADAPT_FLOOR}, least({IVF_K}, close))
),
scored AS (
    SELECT p.query_id, a.vec_id,
           round({DOT_SQL.format(a="p.qv", b="a.v")} / (p.qn * a.norm), 6) AS cosine
    FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
    WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


TOPK_IVF_ADAPTIVE_ORACLE = _topk_ivf_adaptive_oracle()


# --- SPANN-style boundary replication ---------------------------------------

# Closeness criterion (after SPANN, Chen et al. 2021 §3.2): a vector
# files into its nearest list AND any list whose centroid is eps-close
# to the nearest — boundary vectors appear in every list they straddle,
# so a query probing either side finds them. Shipped criterion, stated
# precisely (ADVICE r11): a COSINE-GAP bound,
#   (1 - cos_i) <= (1 + eps)^2 * (1 - cos_1),
# where cos is taken against the UNNORMALIZED k-means centroids — the
# ||x-c||^2 = 2 - 2cos identity behind the paper's L2 rule holds only
# for normalized centroids, so this is an angular approximation of
# SPANN's distance rule, internally consistent with the cosine-based
# list assignment and swept empirically below (and instrumented in
# SCALE_ann_r12.md §3).
# eps sweep (K=16 trained, nprobe=8, vs topk_ivf_trained's 0.80 at
# sf0.01 / 0.88 at sf0.1) — recall @ replication factor:
#   eps=0.05: 0.88 @ 1.55x / 0.92 @ 1.71x
#   eps=0.10: 0.98 @ 2.31x / 0.94 @ 2.79x   <- shipped (the knee)
#   eps=0.15: 1.00 @ 2.97x / 0.96 @ 3.46x
#   eps=0.25: 1.00 @ 3.66x / 0.98 @ 3.91x (RMAX-saturated)
# Full table in SCALE_ann_r11.md §6. SPANN_RMAX bounds worst-case
# fan-out so a vector equidistant from many centroids cannot blow the
# index up; at larger K the factor falls (boundary shells shrink
# relative to cell volume).
SPANN_EPS = 0.1
SPANN_RMAX = 4


def _assign_spann_udf(
    cents_rows: "list[tuple[int, list[float]]]", eps: float, rmax: int
):
    """Arrow-batched SPANN assignment: nearest list + boundary replicas
    within the (1+eps) closeness bound, capped at ``rmax`` per vector
    (closest-first). Same matmul core as ``_assign_arrow_udf``; returns a
    VARIABLE-length cent_id array (>= 1 entry)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows_sorted = sorted(cents_rows)
    ids = np.asarray([cid for cid, _ in rows_sorted], dtype=np.int64)
    cmat = np.asarray([cv for _, cv in rows_sorted], dtype=np.float64)
    cn = np.sqrt((cmat * cmat).sum(axis=1))
    bound = (1.0 + eps) ** 2

    def assign(vcol):
        x = np.asarray(vcol.tolist(), dtype=np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        cos = (x @ cmat.T) / cn / norms[:, None]
        gap = 1.0 - cos  # ||x-c||^2 / 2 on normalized vectors
        order = np.argsort(gap, axis=1, kind="stable")[:, :rmax]
        ranked = np.take_along_axis(gap, order, axis=1)
        keep = ranked <= bound * ranked[:, :1]
        keep[:, 0] = True  # the nearest list always
        return pd.Series(
            [ids[row[k]].tolist() for row, k in zip(order, keep)]
        )

    return pandas_udf(assign, "array<int>")


def topk_ivf_spann(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF ANN with SPANN-style boundary replication over the TRAINED
    coarse quantizer — recall at equal nprobe bought with index size
    instead of probe width: boundary vectors are filed into EVERY list
    within the (1+eps) closeness bound of their nearest (SPANN §3.2), so
    the failure mode of IVF pruning — the true neighbor sitting just
    across a Voronoi boundary the query didn't probe — disappears for
    eps-close boundaries. Measured at sf0.01/K=16/nprobe=8 vs
    ``topk_ivf_trained``: see SCALE_ann_r11.md §6 (recall and the
    replication factor — the honest cost — are both recorded).

    Plan shape: assignment is one Arrow matmul pass emitting a
    variable-length list array + one explode (the replication);
    probe/rank identical to ``topk_ivf_trained``; duplicate (query,
    candidate) pairs from multi-list membership collapse with one
    ``dropDuplicates`` BEFORE ranking (same cosine on every copy, so the
    dedup is value-deterministic). K-means training is not
    SQL-expressible -> rows-only driver check; recall bounded vs brute
    force in tests/test_similarity_ivf.py.

    100 TB shape: replication multiplies the INDEX by the measured
    factor (bounded by SPANN_RMAX), not the scan — a query still reads
    nprobe lists; each list is ~factor/K of the corpus.
    """
    from mapreduce_hadoop_spark.operators import ann_index

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents_rows = ann_index.coarse_centroids(spark, emb, sf_dir, IVF_K)

    rep = _assign_spann_udf(cents_rows, SPANN_EPS, SPANN_RMAX)
    lists = emb.select(
        "vec_id", "v", "norm", F.explode(rep(F.col("v"))).alias("cent_id")
    )
    probe = _assign_arrow_udf(cents_rows, nprobe)
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
            F.explode(probe(F.col("v"))).alias("cent_id"),
        )
    )
    pairs = lists.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    # One candidate exchange, not two: hashpartitioning(query_id) already
    # satisfies the (query_id, vec_id) dedup's clustered distribution, so
    # repartitioning by query_id FIRST lets the dropDuplicates aggregate
    # AND the rank window share a single exchange (the dedup previously
    # inserted its own (query_id, vec_id) exchange, then the window
    # re-exchanged by query_id). Value-identical: every duplicate carries
    # the same cosine, so which copy survives is immaterial.
    scored = (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def topk_ivf_spann_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPANN boundary replication under FIXED centroids — the
    oracle-checkable twin of ``topk_ivf_spann``'s REPLICATION rule
    (VERDICT r16 order 1: the last ANN serving rule with no
    driver-hash-verified row). The memory-side closeness bound —
    every vector files into its nearest list AND every list whose
    cosine-gap is within ``(1+eps)^2`` of the nearest's, capped at
    ``SPANN_RMAX`` replicas closest-first — is exactly
    ``_assign_spann_udf``'s criterion (``ranked <= bound*ranked[:,0]``
    over a stable gap-ascending argsort truncated at rmax), restated
    as a pure window formulation over corpus x 16 broadcast
    centroids, so the driver hash-pins its semantics: a drifted eps,
    an off-by-one in the RMAX clamp, or a wrong tie order at the
    replication cut would all hash-mismatch. eps and RMAX are the
    DEPLOYED constants (``SPANN_EPS``/``SPANN_RMAX``, defined above,
    referenced directly — no duplicate literals to drift).

    The trained path applies the same rule in one Arrow matmul pass;
    this twin pins the RULE, not that vectorized evaluation — ties at
    the bound break identically ((gap asc, cent_id) here = stable
    argsort with cent_id-ascending input there; the RMAX tie cut is
    pinned by a constructed equi-gap fixture in
    tests/test_similarity_ivf.py, an arm organic float64 data never
    hits). Probe side and rank are ``topk_ivf``'s (fixed nprobe);
    duplicate (query, candidate) pairs from multi-list membership
    collapse via DISTINCT before ranking — value-deterministic, the
    cosine is identical on every replica.

    100 TB shape: identical to ``topk_ivf_spann`` — replication
    multiplies the INDEX (bounded by SPANN_RMAX), never the scan; the
    assignment is MAP-SIDE since round 18 (in-row over the broadcast
    centroid array, replacing the vec_id-partitioned window exchange of
    the full corpus — guide §2.4; output bit-identical, the DuckDB
    oracle keeps the equivalent window formulation and the driver hash
    still pins every rule detail), and a query still reads nprobe lists
    of ~factor/K of the corpus each."""
    bound = (1.0 + SPANN_EPS) ** 2
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cents = _ivf_centroids(emb)
    # Per-vector, in one row: gaps to all K broadcast centroids, sorted
    # (gap ASC, cent_id ASC) — the window's exact order; `close` counts
    # the (1+eps)^2-closeness hits against gmin = the sorted head's gap
    # (same double min(gap) produced); the kept replica set is the sorted
    # prefix of length greatest(1, least(RMAX, close)) — precisely the
    # rows the old `arank <= clamp` filter kept.
    gaps = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            (
                F.lit(1.0)
                - _dot(F.col("v"), c["cv"]) / (F.col("norm") * c["cn"])
            ).alias("gap"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    sg = F.array_sort(
        gaps,
        lambda l, r: (
            F.when(l["gap"] < r["gap"], F.lit(-1))
            .when(l["gap"] > r["gap"], F.lit(1))
            .when(l["cent_id"] < r["cent_id"], F.lit(-1))
            .when(l["cent_id"] > r["cent_id"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )
    gmin = F.element_at(F.col("_sg"), 1)["gap"]
    close = F.size(
        F.filter(F.col("_sg"), lambda x: x["gap"] <= F.lit(bound) * gmin)
    )
    # greatest(1, ..) = _assign_spann_udf's keep[:, 0] = True: the
    # nearest list is ALWAYS kept. Not redundant — when a vector IS
    # a centroid, float rounding can give cos > 1, so gmin < 0 and
    # bound*gmin < gmin flips the closeness test false even for the
    # minimum itself (close = 0); 7 of sf0.01's 16 centroid rows hit
    # this. Without the clamp they would file into NO list.
    lists = (
        emb.crossJoin(F.broadcast(_cents_array(cents)))
        .select("vec_id", "v", "norm", sg.alias("_sg"))
        .select(
            "vec_id",
            "v",
            "norm",
            F.explode(
                F.slice(
                    F.col("_sg"),
                    1,
                    F.greatest(F.lit(1), F.least(F.lit(SPANN_RMAX), close)),
                )
            ).alias("_g"),
        )
        .select("vec_id", "v", "norm", F.col("_g.cent_id").alias("cent_id"))
    )
    probes = _assign(
        emb.filter(F.col("vec_id") < N_QUERIES), cents, IVF_NPROBE, "cent_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "cent_id",
    )
    pairs = lists.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    qcos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    # Same single-exchange fold as ``topk_ivf_spann``: repartition by
    # query_id so the duplicate-collapse aggregate and the rank window
    # share one exchange (duplicates carry identical cosines — which copy
    # survives is immaterial, and the oracle's DISTINCT agrees).
    scored = (
        pairs.select("query_id", "vec_id", qcos.alias("cosine"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def _topk_ivf_spann_fixed_oracle() -> str:
    bound = (1.0 + SPANN_EPS) ** 2
    return f"""
WITH e AS ({EMB_NORM_SQL}),
c AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e
      WHERE vec_id >= {IVF_CENT_LO} AND vec_id < {IVF_CENT_HI}),
g AS (
    SELECT e.vec_id, e.v, e.norm, c.cent_id,
           1.0 - {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) AS gap
    FROM e CROSS JOIN c
),
a AS (
    SELECT *,
           min(gap) OVER (PARTITION BY vec_id) AS gmin,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY gap ASC, cent_id) AS arank
    FROM g
),
lists AS (
    SELECT vec_id, v, norm, cent_id FROM (
        SELECT *,
               sum(CASE WHEN gap <= {bound!r} * gmin THEN 1 ELSE 0 END)
                   OVER (PARTITION BY vec_id) AS close
        FROM a
    ) WHERE arank <= greatest(1, least({SPANN_RMAX}, close))
),
probes AS (
    SELECT vec_id AS query_id, v AS qv, norm AS qn, cent_id FROM (
        SELECT e.vec_id, e.v, e.norm, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                            c.cent_id) AS crank
        FROM e CROSS JOIN c
        WHERE e.vec_id < {N_QUERIES}
    ) WHERE crank <= {IVF_NPROBE}
),
scored AS (
    SELECT DISTINCT p.query_id, l.vec_id,
           round({DOT_SQL.format(a="p.qv", b="l.v")} / (p.qn * l.norm), 6) AS cosine
    FROM lists l JOIN probes p ON l.cent_id = p.cent_id
    WHERE l.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


TOPK_IVF_SPANN_FIXED_ORACLE = _topk_ivf_spann_fixed_oracle()


# --- metadata-filtered search ---------------------------------------------


def topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 restricted to English documents — filtered vector
    search, the retrieval pattern production corpora actually need
    (metadata predicate + similarity, not similarity alone).

    Pre-filter strategy: the candidate set shrinks BEFORE any scoring
    (embeddings semi-joined to the filtered documents on vec_id = doc_id),
    so top-k is computed over exactly the rows that satisfy the predicate —
    no post-filter recall loss. At scale the filter is a key-partitioned
    semi join (or a pushed-down predicate when the metadata is embedded in
    the vector table) and the scoring cost drops by the filter selectivity.
    """
    en = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cand = emb.join(en, "vec_id", "left_semi")
    pairs = cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


TOPK_FILTERED_ORACLE = f"""
WITH e AS ({EMB_NORM_SQL}),
en AS (SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
c AS (SELECT e.* FROM e WHERE vec_id IN (SELECT vec_id FROM en)),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, c.vec_id,
           round({DOT_SQL.format(a="q.qv", b="c.v")} / (q.qn * c.norm), 6) AS cosine
    FROM c JOIN q ON c.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
) WHERE rank <= {TOP_K}
"""


# --- int8 scalar quantization ----------------------------------------------

QUANT_LEVELS = 127  # symmetric int8 code range [-127, 127]


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard
    compression step before a large-scale ANN index (4x smaller vectors,
    SIMD-friendly integer dot products): per vector, scale = max|x| / 127,
    code_i = round(x_i / scale), exploded to (vec_id, i, code, scale) so
    the driver hashes scalars, not arrays.

    Map-only until the final explode (which is the OUTPUT, not an
    intermediate — a production pipeline would keep the code array in-row
    and write parquet at scan bandwidth). Rounding is the cross-engine
    ``floor(x + 0.5)`` form (round-half-up, three IEEE ops — see the
    README determinism rules); an all-zero vector quantizes to scale 0.0
    and all-zero codes rather than dividing by zero.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = _dvec("embedding")
    # Bind the scale to a column BEFORE the code lambda references it: an
    # aggregate expression inlined into transform() re-evaluates per
    # element (64 array_max passes per vector here — measured 10x the
    # whole operator's cost at sf10). Columns bound in a prior projection
    # evaluate once per row.
    scaled = emb.select(
        "vec_id",
        v.alias("v"),
        (F.array_max(F.transform(v, F.abs)) / F.lit(float(QUANT_LEVELS))).alias(
            "scale_raw"
        ),
    )
    sc = F.col("scale_raw")
    codes = F.when(
        sc == 0.0, F.transform(F.col("v"), lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(F.col("v"), lambda x: F.floor(x / sc + F.lit(0.5)).cast("int"))
    )
    return scaled.select(
        "vec_id",
        F.round(sc, 6).alias("scale"),
        F.posexplode(codes).alias("pos", "code"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "code", "scale")


EMBEDDING_QUANTIZE_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / {QUANT_LEVELS} AS scale
    FROM e
),
x AS (
    SELECT vec_id, v, scale,
           unnest(generate_series(1, len(v))) AS i
    FROM s
)
SELECT vec_id, CAST(i AS INT) AS i,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(v[i] / scale + 0.5) AS INT) END AS code,
       round(scale, 6) AS scale
FROM x
"""


# --- product quantization (IVF-PQ's compression half) ------------------------

PQ_M = 4                    # subspaces
PQ_SUB = EMB_DIM // PQ_M    # 16 dims per subspace
PQ_CODE_BITS = 8            # sign bits per subspace -> 256-entry codebooks
PQ_TOPK_BUCKETS = 64        # phase-1 fan-out of the two-phase shortlist top-R

# Candidate rows per query below which the shortlist runs as ONE window
# instead of the bucketed two-phase: the two-phase exists so no reducer
# materializes a query's full candidate list, which binds at 10^8-10^9
# candidates/query — not at anything a single executor sorts comfortably.
# 2^20 rows x ~24 B = ~25 MB per reducer worst case. Output identical
# either way (phase 1 only pre-prunes); the switch removes one full
# shuffle+sort of the scored relation from the local/small-corpus plan.
PQ_TWO_PHASE_MIN = 1 << 20


def _shortlist_topr(
    scored: DataFrame, shortlist: int, candidates_per_query: "int | None"
) -> DataFrame:
    """Top-``shortlist`` rows per query by (adc asc, vec_id) — the shared
    shortlist stage of every PQ scan. Two-phase bucketed when a query's
    candidate list is too big for one reducer (or unknown), one window
    otherwise; identical output either way."""
    if candidates_per_query is None or candidates_per_query > PQ_TWO_PHASE_MIN:
        w1 = Window.partitionBy(
            "query_id", F.col("vec_id") % PQ_TOPK_BUCKETS
        ).orderBy(F.col("adc").asc(), F.col("vec_id"))
        scored = (
            scored.select("*", F.row_number().over(w1).alias("lr"))
            .filter(F.col("lr") <= shortlist)
            .drop("lr")
        )
    w2 = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id"))
    return (
        scored.select("*", F.row_number().over(w2).alias("sr"))
        .filter(F.col("sr") <= shortlist)
        .drop("sr")
    )

# ADC shortlist per query (exact-re-ranked to TOP_K): SCALE-ADAPTIVE,
# max(MIN, n // DIV). A fixed 50-deep shortlist collapses as the corpus
# grows: sign-orthant codebooks are one k-means step, so their ADC
# distortion is a CONSTANT of the data — the true neighbor's expected
# ADC rank therefore grows LINEARLY in n, and holding recall needs
# shortlist ~ n/10. Measured (embeddings: n=500 at sf0.001 AND sf0.01,
# 2000 at sf0.1, 20000 at the derived sf1): shortlist 50 = n/10 at
# n=500 -> pq recall@5 0.86; at n=2000, 50 (n/40) -> 0.36, 200 (n/10)
# -> 0.82, 800 -> 1.00. The honest reading: with one-step codebooks the
# exact re-rank reads ~10% of the corpus' full vectors, so PQ's scan
# savings cap at ~10x unless codebook distortion IMPROVES with n —
# that is exactly what trained (Lloyd-iterated) codebooks buy and why
# they are the named next lever; the shortlist law is the stopgap that
# keeps recall honest meanwhile. The oracle derives the SAME integer
# from count(*), so the plans stay hash-comparable.
PQ_SHORTLIST_MIN = 50
PQ_SHORTLIST_DIV = 10
PQ_SHORTLIST_SQL = (
    f"greatest({PQ_SHORTLIST_MIN}, (SELECT count(*) FROM e) // {PQ_SHORTLIST_DIV})"
)


def _pq_shortlist(n: int) -> int:
    return max(PQ_SHORTLIST_MIN, n // PQ_SHORTLIST_DIV)


# Embedding-corpus row count: persisted with the ANN index artifacts
# (ann_index.corpus_count), so a warm session derives scale-adaptive
# parameters (shortlist depth, K) with ZERO Spark jobs — the round-10
# per-session count() job is now a cold-corpus-only cost.
def _emb_count(emb: DataFrame, sf_dir: str) -> int:
    from mapreduce_hadoop_spark.operators import ann_index

    return ann_index.corpus_count(emb, sf_dir)

# The ADC lookup table is the broadcast side of all four scan joins; built
# unpersisted, each broadcast build would recompute its codebook lineage
# (a full corpus scan apiece — measured 22 parquet scans in the plan).
# Persisted, the codebook pass runs once. Same contract as dedup._PERSISTED:
# callers release via ``unpersist_intermediates`` (bench.py does, between
# queries).
_PERSISTED: "list[DataFrame]" = []


def _persisted(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_intermediates() -> None:
    """Release cached PQ intermediates (safe mid-lineage — Spark recomputes)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


def _pq_code(nv: Column, m: int) -> Column:
    """8-bit sign-pattern code of subspace ``m`` (bit j = sign of dim j)."""
    c: Column = F.lit(0)
    for j in range(PQ_CODE_BITS):
        c = c + F.when(
            F.element_at(nv, m * PQ_SUB + j + 1) >= 0.0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return c.cast("int")


def topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: top-5 cosine neighbors for the demo query
    set via an ADC (asymmetric distance computation) scan over 4-byte PQ
    codes, exact-re-ranked on a scale-adaptive (max(50, n/10))-deep shortlist.

    The memory story int8/IVF/LSH don't cover: vectors are normalized
    (so L2^2 = 2 - 2*cos and ADC ranking == cosine ranking), split into
    M=4 subspaces of 16 dims, and each subspace is coded to 1 byte —
    64 float32s become 4 bytes (64x), which is what lets a 100 TB corpus'
    index live in cluster RAM. Codebooks are one aggregation pass
    (sign-pattern assignment + exact fixed-point centroid means — one
    k-means step from a deterministic seeding, so the oracle reproduces
    it bit-for-bit); the scan is 4 broadcast-hash lookups + 3 adds per
    candidate instead of a 64-term dot product. The ADC lookup tables
    (queries x 4 x 256 <= 10k rows) are the broadcast side of every join
    — the same shape FAISS serves from — so scoring is map-side against
    a single scan of the 4-byte codes; no shuffle touches the corpus
    until the two-phase shortlist top-R (phase 1 fans out on
    vec_id % 64 so no single reducer sees a full query's candidates —
    the 1000-executor-safe form of top-k-per-query). At sf10 the ADC
    scan reads ~1/16th the bytes of the brute-force scan; recall@5 is
    bounded below by tests/test_similarity_pq.py against bruteforce.

    Centroid means quantize each coordinate with the cross-engine-exact
    ``floor(x*1e9 + 0.5)`` nano fixed point (signed-safe, unlike
    ``round()`` whose half-tie path is engine-specific), sum as BIGINTs
    (order-independent), and divide once at the edge; every float fold is
    the strict left-to-right form the other similarity oracles share.

    Round 19 (optimization; output bit-identical, oracle unchanged): the
    query side adopts the trained path's round-12 DRIVER-BUILT shape.
    The codebook aggregation is still the same ONE exact fixed-point
    Spark pass over the corpus — but its 1,024-row result is collected
    and the per-query ADC lookup arrays are computed driver-side
    (``_adc_arrays_np``: the identical ascending-d IEEE accumulation the
    ``0.0D + (q-cd)^2 + ...`` expression performed, so every ``t`` is
    bit-for-bit the old value), then shipped as a LocalTableScan. This
    removes the q x cent crossJoin, the two ``_adc_scatter_arrays``
    exchanges (groupBy(query_id, m) + pivot), and the adc persist — the
    per-invocation 256^2-per-group interpreted scatter the trained paths
    dropped in round 12. SQL-expressibility of the codebook construction
    is still demonstrated where it is checked: the DuckDB oracle computes
    the books, the ADC tables, and the shortlist entirely in SQL, and
    the driver hash pins this plan against it.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    shortlist = _pq_shortlist(n)
    nvt = emb.select(
        "vec_id", _div_by("v", "norm").alias("nv")
    )
    codes = nvt.select(
        "vec_id",
        "nv",
        *[_pq_code(F.col("nv"), m).alias(f"c{m}") for m in range(PQ_M)],
    )

    # Codebooks: still the same ONE exact fixed-point aggregation over
    # the corpus (``_fixed_books_rows`` — the append twin's train half;
    # partial aggregation bounds its exchange at 1,024 rows per map task
    # regardless of corpus size), collected model-sized and recomputed
    # per invocation — nothing is cached across runs.
    book_rows = _fixed_books_rows(nvt)

    # Query side: driver-built local relations (the trained path's r12
    # fusion — `_query_nv_rows` is the arithmetic twin of
    # nvt.filter(vec_id < N_QUERIES), bit-identical by construction).
    qnv_rows = _query_nv_rows(emb, sf_dir)
    q = spark.createDataFrame(qnv_rows, "query_id long, qnv array<double>")
    qarr = _local_qarr_df(
        spark,
        [("query_id", "long")],
        [(qid,) for qid, _ in qnv_rows],
        [nv for _, nv in qnv_rows],
        book_rows,
        PQ_M,
        PQ_SUB,
    )

    return _pq_adc_rank(
        codes,
        qarr,
        emb.select("vec_id", "v"),
        q,
        shortlist,
        candidates_per_query=n,
    )


def _adc_scatter_arrays(adc: DataFrame, keys: "list[str]", m_subspaces: int) -> DataFrame:
    """(.., m, code, t) ADC rows -> one row per ``keys`` with M DENSE
    256-slot lookup arrays (columns `0`..`M-1`): ts_m[code+1] = t.

    The scatter walks a 256-entry map per slot (Spark map element_at is
    a linear scan), so its cost is #groups x 256^2 interpreted ops —
    fine for the flat-PQ paths (Q x M groups) and the fixed-K ivfpq
    (Q x nprobe x M), but it is why the TRAINED paths build their arrays
    straight from the driver-side codebooks instead (``_adc_arrays_np``,
    driver-built local relations since round 12): at K=sqrt(n),
    Q x nprobe x M groups made the scatter the top cost of the whole
    query (measured +13% on topk_ivfpq_trained at sf1). Codes never referenced stay +inf (never
    matched: every emitted code has a codebook row), keeping the asc
    sort sane if one ever leaks."""
    mp = F.map_from_entries(F.collect_list(F.struct("code", "t")))
    per_m = adc.groupBy(*keys, "m").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(255)),
            lambda i: F.coalesce(F.try_element_at(mp, i), F.lit(float("inf"))),
        ).alias("ts")
    )
    return per_m.groupBy(*keys).pivot("m", list(range(m_subspaces))).agg(
        F.first("ts")
    )


def _strict_dot(a: "list[float]", b: "list[float]") -> float:
    """Python twin of ``_dot``'s JVM fold: strict left-to-right IEEE
    double accumulation from 0.0 — bit-identical by construction."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _query_nv_rows(emb: DataFrame, sf_dir: str) -> "list[tuple[int, list[float]]]":
    """Driver-side normalized query vectors ``[(query_id, nv)]`` — the
    arithmetic twin of ``nvt.filter(vec_id < N_QUERIES)``: norm =
    sqrt(strict-fold(v*v)) and nv_i = v_i / norm are the exact IEEE
    double ops the JVM path performs (sqrt is correctly rounded in both
    runtimes), so cosines computed downstream from these values are
    bit-identical to the pre-fusion plan's. Backed by the persisted
    query-side artifact (ann_index.query_vectors): warm sessions build
    the whole query side with ZERO Spark jobs."""
    import math

    from mapreduce_hadoop_spark.operators import ann_index

    rows = ann_index.query_vectors(emb, sf_dir, N_QUERIES)
    out = []
    for qid, v in rows:
        norm = math.sqrt(_strict_dot(v, v))
        out.append((qid, [x / norm for x in v]))
    return out


def _adc_arrays_np(
    qvecs: "list[list[float]]",
    rows: "list[tuple[int, int, list[float]]]",
    m_subspaces: int,
    sub: int,
):
    """Per-query dense ADC lookup arrays computed driver-side from the
    trained codebooks: for query g, subspace m, code c —
    ts[g][m][c] = sum_d (qvec[m*sub+d] - cd[d])^2, accumulated in
    ascending-d order so every entry is bit-identical to the JVM
    zip_with/aggregate fold it replaces (numpy elementwise ops are the
    same IEEE doubles; only the STAGE moves to the driver, not the
    arithmetic). Book cells never emitted by the encoder are +inf (the
    asc shortlist can never surface them — the sparse-artifact trap
    ADVICE r11 flagged). The arrays span the FULL byte range (256 slots)
    rather than 1 + max(observed code): a books artifact that ever loads
    sparse at the top — or a codes row carrying a code above every
    loaded book cell — would otherwise make ``element_at`` run past the
    array and return NULL, and a NULL ADC sum sorts NULLS FIRST into the
    shortlist (VERDICT r12). With the pad, any such cell reads +inf and
    can never win the asc sort; PQ codes are < book k <= 256 by
    construction, so the pad is dead weight only (10 queries x M x 256
    doubles — request-sized). Returns a list of M (G, 256) float64
    arrays."""
    import numpy as np

    k = 256
    books = np.full((m_subspaces, k, sub), np.inf, dtype=np.float64)
    for m, code, cd in rows:
        books[m, code] = cd
    x = np.asarray(qvecs, dtype=np.float64)
    out = []
    for m in range(m_subspaces):
        acc = np.zeros((len(x), k), dtype=np.float64)
        for d in range(sub):
            diff = x[:, m * sub + d][:, None] - books[m, :, d][None, :]
            acc = acc + diff * diff
        out.append(acc)
    return out


def _local_qarr_df(
    spark: SparkSession,
    key_fields: "list[tuple[str, str]]",
    key_rows: "list[tuple]",
    qvecs: "list[list[float]]",
    rows: "list[tuple[int, int, list[float]]]",
    m_subspaces: int,
    sub: int,
    adc: "list | None" = None,
) -> DataFrame:
    """The per-query ADC lookup-array relation as a LOCAL DataFrame
    (one row per ``key_rows`` entry, M array<double> columns `0`..`M-1`)
    — a LocalTableScan, so broadcasting it costs no Spark job at all.
    ``key_fields`` is [(name, ddl_type)] for the leading key columns.
    ``adc`` lets a caller that already built the lookup arrays (the
    adaptive bulk estimate shares them) pass them in instead of paying
    the identical computation twice (ADVICE r14)."""
    if adc is None:
        adc = _adc_arrays_np(qvecs, rows, m_subspaces, sub)
    data = [
        (*key_rows[g], *[adc[m][g].tolist() for m in range(m_subspaces)])
        for g in range(len(key_rows))
    ]
    schema = ", ".join(
        [f"{name} {t}" for name, t in key_fields]
        + [f"`{m}` array<double>" for m in range(m_subspaces)]
    )
    return spark.createDataFrame(data, schema)


def _pq_adc_rank(
    codes: DataFrame,
    qarr: DataFrame,
    raw: DataFrame,
    q: DataFrame,
    shortlist: int,
    m_subspaces: int = PQ_M,
    candidates_per_query: "int | None" = None,
    persist_codes: bool = True,
    adaptive: bool = False,
) -> DataFrame:
    """Shared flat-PQ ADC scan + two-phase shortlist + exact re-rank;
    ``codes`` is (vec_id, c0..c{M-1}), ``raw`` is the (vec_id, v) double
    corpus for the post-join re-rank, ``qarr`` is one row per query
    carrying M dense 256-slot ADC lookup arrays (columns `0`..`M-1`).
    Used by both the sign-orthant oracle twin (``topk_pq``) and the
    Lloyd-trained primary (``topk_pq_trained``) — identical plan shape,
    only the codebook/encode source (and M) differs.

    ADC scan: the per-query arrays broadcast ONCE; each candidate row
    costs one broadcast nested-loop fan-out + M O(1) array
    ``element_at`` probes. Round 10 measured and rejected map<code, t>
    columns (map element_at LINEAR-scans ArrayBasedMapData, +46% on the
    ivfpq scan); round 11 measured this array form against the M
    broadcast-hash-join form it replaces: outputs identical, wash at
    M=4, -30% wall at M=8/sf1 (32.6 -> 23.0 s before the codes persist)
    — one join instead of M beats M O(1) hash probes once M grows.

    ``adaptive=True`` (the trained flat primary): ``qarr`` additionally
    carries a per-query ``bulk`` column (driver-side mean-ADC estimate,
    ``_bulk_adc_estimates``) and the shortlist becomes per-query — the
    exact re-rank reads ``PQ_ADAPT_WIDEN x shortlist`` candidates iff
    the query's covered-gap signal fires (see the constants' comment).
    The widened budget flows through the same window exchange; the
    signal is one extra window aggregate over the already-partitioned
    ranked relation — no new shuffle, no new scan.
    """
    # The 8-ish-byte codes relation is scanned by the broadcast fan-out.
    # Sign-orthant twins persist it (its lineage carries the in-plan
    # codebook aggregation); the trained paths pass persist_codes=False —
    # their codes are a read-once parquet ARTIFACT scan, and caching a
    # read-once relation only adds a materialization pass.
    codes = codes.select("vec_id", *[f"c{m}" for m in range(m_subspaces)])
    if persist_codes:
        codes = _persisted(codes)
    sc = codes.crossJoin(F.broadcast(qarr))
    t_sum = " + ".join(f"element_at(`{m}`, c{m} + 1)" for m in range(m_subspaces))
    scored = sc.select(
        "query_id",
        *(["bulk"] if adaptive else []),
        "vec_id",
        F.round(F.expr(f"0.0D + {t_sum}"), 6).alias("adc"),
    ).filter(F.col("vec_id") != F.col("query_id"))

    # Shortlist (one window or bucketed two-phase by candidate volume —
    # see _shortlist_topr; identical output either way).
    if not adaptive:
        short = _shortlist_topr(scored, shortlist, candidates_per_query)
    else:
        # Escalating widen (round 16): rank down to the DEEP budget once;
        # the per-query keep depth is then floor / 4x / 16x by the same
        # covered-gap signal (see the PQ_ADAPT_* constants' comment).
        wide = shortlist * PQ_ADAPT_WIDEN
        wide_deep = shortlist * PQ_ADAPT_WIDEN_DEEP
        if candidates_per_query is None or candidates_per_query > PQ_TWO_PHASE_MIN:
            w1 = Window.partitionBy(
                "query_id", F.col("vec_id") % PQ_TOPK_BUCKETS
            ).orderBy(F.col("adc").asc(), F.col("vec_id"))
            scored = (
                scored.select("*", F.row_number().over(w1).alias("lr"))
                .filter(F.col("lr") <= wide_deep)
                .drop("lr")
            )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("adc").asc(), F.col("vec_id")
        )
        wq = Window.partitionBy("query_id")
        ranked = scored.select("*", F.row_number().over(w2).alias("sr")).filter(
            F.col("sr") <= wide_deep
        )
        a_top = F.max(F.when(F.col("sr") <= TOP_K, F.col("adc"))).over(wq)
        a_floor = F.max(F.when(F.col("sr") <= shortlist, F.col("adc"))).over(wq)
        gap_bulk = F.greatest(F.col("bulk") - a_top, F.lit(1e-9))
        fire = (a_floor - a_top) < F.lit(PQ_ADAPT_COVER) * gap_bulk
        fire_deep = (a_floor - a_top) < F.lit(PQ_ADAPT_DEEP_COVER) * gap_bulk
        short = (
            ranked.select("*", fire.alias("_fire"), fire_deep.alias("_deep"))
            .filter(
                (F.col("sr") <= shortlist)
                | (F.col("_fire") & (F.col("sr") <= wide))
                | F.col("_deep")
            )
            .drop("sr", "bulk", "_fire", "_deep")
        )

    # Exact re-rank of the shortlist: the query vectors join the Q*R
    # survivors INSIDE the broadcast build (q is query-sized), so the
    # final stage is ONE broadcast-hash join against one pruned scan of
    # the corpus — not two separate broadcast jobs (round-12 stage
    # fusion). Round 13: the join runs on the RAW (vec_id, v) scan and
    # the normalize-fold + cosine evaluate ABOVE it — r12's plan kept
    # the O(d) norm fold + divide in a Project BELOW the join, paying
    # ~200 interpreted lambda ops for EVERY corpus row when only the
    # ~Q*R shortlist survivors reach the cosine. Same expression tree
    # (_div_by keeps the fold once-per-row), same bits, n-fold fewer
    # evaluations.
    rer = raw.join(
        F.broadcast(short.join(F.broadcast(q), "query_id")), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qnv"), _div_by(F.col("v"), F.sqrt(_dot(F.col("v"), F.col("v"))))),
            6,
        ).alias("cosine"),
        "adc",
    )
    w3 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.select("*", F.row_number().over(w3).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "adc", "rank")
    )


def _topk_pq_oracle() -> str:
    def code_sql(m: int) -> str:
        return " + ".join(
            f"CASE WHEN nv[{m * PQ_SUB + j + 1}] >= 0.0 THEN {1 << j} ELSE 0 END"
            for j in range(PQ_CODE_BITS)
        )

    sums = ",\n         ".join(
        f"sum(CAST(floor(nv[m*{PQ_SUB}+{d}] * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s{d}"
        for d in range(1, PQ_SUB + 1)
    )
    cents = ", ".join(
        f"CAST(s{d} AS DOUBLE)/n/1e9 AS cd{d}" for d in range(1, PQ_SUB + 1)
    )
    adc_terms = " + ".join(
        f"(q.qnv[c.m*{PQ_SUB}+{d}] - c.cd{d}) * (q.qnv[c.m*{PQ_SUB}+{d}] - c.cd{d})"
        for d in range(1, PQ_SUB + 1)
    )
    joins = "\n  ".join(
        f"JOIN adc a{m} ON a{m}.m = {m} AND a{m}.code = cd.c{m}"
        + ("" if m == 0 else f" AND a{m}.query_id = a0.query_id")
        for m in range(PQ_M)
    )
    case_code = "CASE ms.m " + " ".join(
        f"WHEN {m} THEN c{m}" for m in range(PQ_M - 1)
    ) + f" ELSE c{PQ_M - 1} END"
    return f"""
WITH e AS ({EMB_NORM_SQL}),
nvt AS (SELECT vec_id, [v[i]/norm for i in range(1, {EMB_DIM + 1})] AS nv FROM e),
codes AS (SELECT vec_id, nv,
          {", ".join(f"{code_sql(m)} AS c{m}" for m in range(PQ_M))}
          FROM nvt),
subs AS (SELECT ms.m AS m, {case_code} AS code, nv
         FROM codes, (SELECT unnest(range({PQ_M})) AS m) ms),
cb AS (SELECT m, code, count(*) AS n,
         {sums}
       FROM subs GROUP BY m, code),
cent AS (SELECT m, code, {cents} FROM cb),
q AS (SELECT vec_id AS query_id, nv AS qnv FROM nvt WHERE vec_id < {N_QUERIES}),
adc AS (SELECT q.query_id, c.m, c.code,
          CAST(0 AS DOUBLE) + {adc_terms} AS t
        FROM q, cent c),
scored AS (
  SELECT a0.query_id, cd.vec_id,
         round(CAST(0 AS DOUBLE) + {" + ".join(f"a{m}.t" for m in range(PQ_M))}, 6) AS adc
  FROM codes cd
  {joins}
  WHERE cd.vec_id <> a0.query_id
),
local AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id, vec_id % {PQ_TOPK_BUCKETS}
        ORDER BY adc, vec_id) AS lr
    FROM scored) WHERE lr <= {PQ_SHORTLIST_SQL}),
short AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc, vec_id) AS sr
    FROM local) WHERE sr <= {PQ_SHORTLIST_SQL}),
rer AS (SELECT s.query_id, s.vec_id,
          round({DOT_SQL.format(a="qq.qnv", b="nvt.nv")}, 6) AS cosine,
          s.adc
        FROM short s
        JOIN nvt ON nvt.vec_id = s.vec_id
        JOIN q qq ON qq.query_id = s.query_id)
SELECT query_id, vec_id, cosine, adc, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rer)
WHERE rank <= {TOP_K}
"""


TOPK_PQ_ORACLE = _topk_pq_oracle()


# --- trained (Lloyd) PQ codebooks -------------------------------------------

# Cells per subspace codebook for the TRAINED variants (the FAISS 8-bit
# default). Sign-orthant books also have 256 cells, but their cell
# geometry is fixed by the coding scheme; trained cells move to the data.
PQ_TRAINED_K = 256

# Subspace count for the TRAINED variants: 8 subspaces x 8 dims (8-byte
# codes, 32x compression) vs the sign-orthant twin's 4 x 16. Measured at
# sf0.1 (n=2000, shortlist 50): M=4 trained recalls 0.68 — a 16-dim cell
# with ~8 points cuts distortion only ~k^(-2/16) vs one cell, too coarse
# regardless of training — while M=8 recalls 0.88 and M=16 1.00. M=8 is
# the FAISS PQ8 shape for 64-dim vectors: the smallest code that clears
# the 0.8 recall bar at a CONSTANT shortlist, so the scan stays 32x
# lighter than brute force while the re-rank no longer grows with n.
PQ_TRAINED_M = 8
PQ_TRAINED_SUB = EMB_DIM // PQ_TRAINED_M

# Shortlist law under TRAINED codebooks: max(50, n/100) — near-constant,
# vs the sign-orthant n/10. The difference is the whole point: one-step
# sign-orthant books have CONSTANT ADC distortion (a property of the
# scheme, not the data), so the true neighbor's expected ADC rank grows
# linearly in n and recall needs shortlist ~ n/10 (the honest round-10
# stopgap). Lloyd-trained cells shrink as data fills them (distortion
# ~ n^{-2/d} per cell in the fixed-K regime), so the neighbor's ADC rank
# stays near the top and a near-constant re-rank suffices — measured in
# SCALE_ann_r11.md; recall floors pinned in tests/test_similarity_pq.py.
PQ_TRAINED_SHORTLIST_DIV = 100

# Residual IVF-PQ re-ranks 2x deeper (still near-constant): residual ADC
# noise compounds coarse-assignment boundary effects, and the measured
# curve at sf0.1 plateaus at the pruning ceiling only from depth ~100
# (depth 50: 0.60, depth 100: 0.72 = the offline ceiling; M=16 at depth
# 50 buys the same for 2x the scan joins — the deeper re-rank of 100
# rows/query is the cheaper side of that trade).
PQ_TRAINED_IVF_SHORTLIST_MIN = 100

# Query-side adaptive probe width for the trained IVF-PQ (round 13):
# probe every list whose cosine-gap is within (1+eps)^2 of the nearest
# list's, floored at the old fixed nprobe=K/3, capped at K. Measured on
# the CLUSTERED n=20k crossover corpus (fixed nprobe read recall 0.54):
# eps=0.1 never escapes the K/3 floor (all widths 47/47); eps=0.3
# separates the corpora — mutated queries widen to mean 104/141 lists
# while organic sf1 queries stay near the floor (mean 73) — and is the
# knee: eps=0.4 saturates every mutated query at ~K for no recall gain
# at equal shortlist (0.76 vs 0.78 at sl=450). Full grid in
# SCALE_ann_r13.md.
IVFPQ_PROBE_EPS = 0.3
# The hash-verified adaptive twin (topk_ivf_adaptive) must pin the
# deployed eps, not a drifted copy.
assert IVFPQ_PROBE_EPS == IVF_ADAPT_EPS

# The SAME width profile prices the second failure axis: residual-ADC
# distortion. On clustered corpora the global residual book pools many
# disjoint clouds and the true neighbor's ADC rank degrades, so the
# near-constant re-rank misses it even when its list WAS probed
# (measured at n=20k mutated: probe-ALL lists still reads 0.68 at the
# base shortlist; base probes at 10x shortlist also 0.68; both dials
# together 0.94). mean(width)/floor is a free driver-side clusteredness
# signal — organic 1.55 vs mutated 2.2 at eps=0.3 — and the shortlist
# scales by its SQUARE (probe volume x per-candidate distortion),
# capped at the sign-orthant n/10 law so the adaptive path can never
# re-rank deeper than the stopgap it replaced.


# Per-query adaptive shortlist (VERDICT r13 order 4): the flat trained
# path widens a query's exact-re-rank shortlist by PQ_ADAPT_WIDEN iff
# the ADC gap covered between rank TOP_K and rank `shortlist` is less
# than PQ_ADAPT_COVER of the gap to the corpus BULK (the mean ADC of a
# random candidate, computed driver-side from the persisted code
# histogram x the query's ADC table — model-sized, zero extra scan).
# Geometry: when the shortlist boundary has barely separated from the
# top while the decoy bulk sits far away, the true neighbor is likely
# buried among near-equal ADC values (quantization noise >= local gaps)
# and the re-rank needs more candidates; when the boundary has traveled
# well toward the bulk, the top ranks are already separated and the
# floor suffices. Calibration: round 14 measured five corpora with a
# clean gap (losses <= 0.333, lossless >= 0.367) and set 0.35 in it;
# round 15 MEASURED the gap itself (tools/dial_band_probe.py —
# intermediate mutation factors 20/30/50, n=40k/60k/100k, VERDICT r14
# order 6) and found it is not clean: 1-2-neighbor losses occur up to
# covered = 0.372, and 4x widening RECOVERS every one of them
# (recall_widened 1.0 at 0.354/0.358/0.359/0.372), while the measured
# no-benefit cluster starts at 0.386 (the n=200k case whose 0.96 stays
# 0.96 widened). The threshold therefore moved 0.35 -> 0.38 — above
# every measured widening-helps query, below every measured
# no-benefit one. Firing a LOSSLESS query is output-neutral (a
# superset re-rank keeps an already-true top-k) and costs one
# request-sized widened join, so the residual exposure of the move is
# wall, not correctness. Measured effect: n=40k recall 0.86 -> 0.98,
# n=60k 0.96 -> 1.00, n=100k 0.98 -> 1.00; organic sf0.1 (all-fire,
# 0.80 -> 1.00) and the no-fire corpora (sf0.001 >= 0.41, sf1 replicas
# >= 0.623, n=200k >= 0.386) are unchanged. Like the IVF probe dial,
# the signal spends re-rank budget only where recall is lost:
# per-query arithmetic over the already-shuffled ranked relation,
# request-sized extra join rows, zero new distributed passes.
# Round 17 (VERDICT r16 order 3): 4 -> 8. The second corpus family
# (tools/dial_family2_probe.py — seeded Gaussian mixtures, cluster
# count/overlap as the axes instead of the replica recipe) produced the
# first measured ordinary fire 4x does NOT recover: covered = 0.369
# (c4_wide, 4 broad clusters) reads recall 0.8 at 4x and 1.0 at 8x.
# Family 1's table (every lossy >= 0.354 recovers at 4x) made 4x look
# sufficient; it was a family-shape artifact. 8x covers every measured
# point in BOTH families; the cost is request-sized (fires re-rank
# 8 x a near-constant shortlist through the same window exchange), and
# the change is output-neutral on every organic gate corpus (fires
# there are lossless at 4x, so the wider re-rank keeps an already-true
# top-k — verified hash-identical at all five scales against the
# committed r16 logs before landing, tools/dial_escalation_check.py).
PQ_ADAPT_WIDEN = 8
PQ_ADAPT_COVER = 0.38
# ESCALATING widen (round 16, VERDICT r15 order 2): the widen factor
# keys to the covered magnitude — a deeper-buried query (smaller
# covered gap) gets a bigger exact-re-rank superset. Calibration is the
# committed f20 per-query table (SCALE_ann_r15.md §3/§7): every
# measured lossy query with covered >= 0.354 fully recovers at 4x,
# while the one below (f20's covered = 0.333) reads 0.8 at 4x AND 8x
# and needs 16x (6400 of 40k candidates — 16% of that corpus for that
# one query); the deep band therefore jumps straight to 16x, and its
# edge 0.34 sits in the measured void (0.333, 0.354). The f20
# covered = 0.314 query also lands in the deep band — it only NEEDS 4x,
# but a lossless superset keeps an already-true top-k, so over-widening
# costs request-sized wall, never output. Same neutrality argument for
# the organic gate corpora: sf0.1 fires read recall 1.0 at 4x
# (SCALE_ann_r14.md), so any deep fire there re-ranks a superset of an
# already-complete top-k — verified hash-identical at every gate scale
# before the change landed (tools/dial_escalation_check.py, r16).
PQ_ADAPT_WIDEN_DEEP = 16
PQ_ADAPT_DEEP_COVER = 0.34


def _codes_histogram(
    spark: SparkSession,
    codes: DataFrame,
    sf_dir: str,
    m_subspaces: int,
    k: int,
    tag: str,
) -> "list[tuple[int, int, int]]":
    """Per-(subspace, code) frequency of the SERVED codes relation —
    the model-sized statistic behind the adaptive-shortlist bulk
    estimate. One aggregation job on a cold corpus, persisted next to
    the codes artifact (same recipe key, so a retrain orphans both);
    warm sessions load it with zero Spark jobs. ``frozen_base=False``:
    on an appended corpus the histogram must describe base+delta, not
    the base snapshot. On a LINEAGE corpus the name additionally keys
    the base fingerprint + watermark, mirroring the delta artifact's key
    (ADVICE r14): an in-place ``ann_base.json`` edit with unchanged
    embeddings bytes changes the served base+delta union and must
    orphan the histogram with it, or a stale bulk estimate would perturb
    the adaptive fire signal silently."""
    from mapreduce_hadoop_spark.operators import ann_index

    fname = "hist_" + ann_index.codes_artifact_name(tag, m_subspaces, k)
    base = ann_index._base_info(sf_dir)
    if base is not None:
        fname += f".{ann_index._fingerprint(base['base'])}.w{base['watermark']}"

    def compute() -> "list[tuple[int, int, int]]":
        agg = (
            codes.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(m).alias("m"), F.col(f"c{m}").alias("code")
                            )
                            for m in range(m_subspaces)
                        ]
                    )
                ).alias("s")
            )
            .groupBy("s.m", "s.code")
            .count()
        )
        return sorted(
            (int(r["m"]), int(r["code"]), int(r["count"])) for r in agg.collect()
        )

    return [
        (int(m), int(c), int(f))
        for m, c, f in ann_index.fixed_model(
            sf_dir, fname, ["m", "code", "freq"], compute, frozen_base=False
        )
    ]


def _bulk_adc_estimates(
    adc_arrays: "list", hist_rows: "list[tuple[int, int, int]]", m_subspaces: int
) -> "list[float]":
    """Per-query mean ADC of a random candidate: sum_m sum_c
    freq[m,c]/n * ts[q,m,c] — driver-side arithmetic over the code
    histogram and the dense ADC lookup arrays. Unoccupied cells carry
    +inf in the arrays but zero frequency; they are masked out rather
    than multiplied (0 * inf is NaN)."""
    import numpy as np

    k = adc_arrays[0].shape[1]
    freq = np.zeros((m_subspaces, k))
    for m, c, f in hist_rows:
        freq[m, c] = f
    n = freq[0].sum()
    out = []
    for g in range(adc_arrays[0].shape[0]):
        tot = 0.0
        for m in range(m_subspaces):
            t = adc_arrays[m][g]
            mask = freq[m] > 0
            tot += float((freq[m][mask] * t[mask]).sum())
        out.append(float(tot / n))
    return out


def _pq_trained_shortlist(n: int) -> int:
    return max(PQ_SHORTLIST_MIN, n // PQ_TRAINED_SHORTLIST_DIV)


def _pq_trained_ivf_shortlist(n: int) -> int:
    return max(PQ_TRAINED_IVF_SHORTLIST_MIN, n // PQ_TRAINED_SHORTLIST_DIV)


def _pq_encode_udf(books, residual: bool = False):
    """Arrow-batched PQ encoder: nearest-cell code per subspace.

    ``books`` is a numpy (M, K, SUB) array captured in the UDF closure
    (131 KB at M=4, K=256 — ships with the task, no broadcast needed).
    Encoding is argmin_c ||x_m - c||^2 per subspace — a (B, SUB) x
    (SUB, K) matmul per batch, exactly how FAISS encodes (BLAS), and
    the one place in the PQ family where a vectorized Pandas UDF beats
    any built-in formulation: the JVM alternative is either an n x K
    join + argmin shuffle or an interpreted higher-order-function fold
    over K cells per row. Map-only, deterministic (np.argmin takes the
    lowest index on ties).

    The UDF takes PLAIN columns — ``(v, norm)``, plus ``ncv`` when
    ``residual`` — and normalizes (and subtracts the list centroid)
    inside numpy: elementwise IEEE float64 ops, bit-identical to the JVM
    ``transform``/``zip_with`` forms they replace. Two reasons: UDF
    argument expressions must stay simple (Spark cannot evaluate a
    nested lambda-variable HOF inlined into a Python UDF argument —
    INTERNAL_ERROR), and the JVM normalization paid the CollapseProject
    O(d^2) norm-refold per row (see ``_div_by``) on every cold encode.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(books, dtype=np.float64)
    m_sub, _k, sub = books.shape
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant per
    # row, so argmin needs only the last two terms.
    cnorms = (books**2).sum(axis=2)  # (M, K)

    def _codes(x):
        out = np.empty((len(x), m_sub), dtype=np.int32)
        for m in range(m_sub):
            xm = x[:, m * sub : (m + 1) * sub]
            out[:, m] = np.argmin(cnorms[m] - 2.0 * (xm @ books[m].T), axis=1)
        return pd.Series(list(out))

    def enc(vcol, normcol):
        x = np.asarray(vcol.tolist(), dtype=np.float64)
        return _codes(x / normcol.to_numpy()[:, None])

    def enc_res(vcol, normcol, ncvcol):
        x = np.asarray(vcol.tolist(), dtype=np.float64)
        nc = np.asarray(ncvcol.tolist(), dtype=np.float64)
        return _codes(x / normcol.to_numpy()[:, None] - nc)

    # No type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf's hint inference cannot resolve
    # 'pd.Series' from this module's globals — the explicit returnType
    # form infers SCALAR eval type without hints.
    return pandas_udf(enc_res if residual else enc, "array<int>")


def _assign_topn_np(x, cents_rows: "list[tuple[int, list[float]]]", n: int):
    """Shared core of coarse-list assignment: top-``n`` centroid ids by
    cosine for each row of the float64 matrix ``x`` — ONE routine used by
    both the Arrow-batched corpus UDF (``_assign_arrow_udf``) and the
    driver-side query prep of the fused trained paths, so the two sides
    cannot drift. Ranking: cosine desc (the row norm scales all centroids
    equally, so the matmul ranks it), ties by cent_id asc (ids pre-sorted
    + stable argsort). Returns ``list[list[int]]``."""
    import numpy as np

    rows_sorted = sorted(cents_rows)
    ids = np.asarray([cid for cid, _ in rows_sorted], dtype=np.int64)
    cmat = np.asarray([cv for _, cv in rows_sorted], dtype=np.float64)
    cn = np.sqrt((cmat * cmat).sum(axis=1))
    scores = (x @ cmat.T) / cn
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :n]
    return [ids[row].tolist() for row in idx]


def _probe_lists_adaptive(
    x,
    cents_rows: "list[tuple[int, list[float]]]",
    nprobe_min: int,
    eps: float,
    nprobe_max: int,
) -> "list[list[int]]":
    """Query-side ADAPTIVE probe selection: SPANN's (1+eps) closeness
    rule applied to the PROBE set instead of the posting lists — a query
    probes its nearest list plus every list whose cosine-gap is within
    ``(1+eps)^2`` of the nearest's, floored at ``nprobe_min`` (the fixed
    budget that was the only dial before round 13) and capped at
    ``nprobe_max``.

    Why (VERDICT r12 order 3): a fixed nprobe = K/3 is the wrong
    constant for CLUSTERED corpora — on the mutated crossover corpus at
    n=20k the coarse quantizer splits each replica cloud's boundary mass
    across many near-equidistant lists and ivfpq_trained read recall
    0.54, while the same constant scored 1.00 on the organic sf1
    derivation. The gap profile distinguishes the two cases per query:
    an interior query's second-nearest list is far (few lists pass the
    eps bound — it keeps the floor), a boundary query sits between
    near-equidistant lists (many pass — it widens its own probe set).
    Recall is bought exactly where it is lost, instead of raising the
    constant for every query on every corpus. Measured in
    SCALE_ann_r13.md; ties ranked like ``_assign_topn_np`` (stable
    argsort, cent_id asc) so the floor probes are IDENTICAL to the
    pre-r13 fixed set.

    Driver-side only (runs over the request-sized query matrix against
    the broadcast-sized centroid list); the corpus-side assignment is
    unchanged — at 100 TB this adds zero distributed work, it only
    changes how many posting lists a query's ADC join matches."""
    import numpy as np

    rows_sorted = sorted(cents_rows)
    ids = np.asarray([cid for cid, _ in rows_sorted], dtype=np.int64)
    cmat = np.asarray([cv for _, cv in rows_sorted], dtype=np.float64)
    cn = np.sqrt((cmat * cmat).sum(axis=1))
    xn = np.sqrt((x * x).sum(axis=1))
    cos = (x @ cmat.T) / cn / xn[:, None]
    gap = 1.0 - cos  # ||x-c||^2 / 2 on normalized vectors
    order = np.argsort(gap, axis=1, kind="stable")
    ranked = np.take_along_axis(gap, order, axis=1)
    bound = (1.0 + eps) ** 2 * ranked[:, :1]
    nprobe_max = min(nprobe_max, len(ids))
    nprobe_min = min(nprobe_min, len(ids))
    out = []
    for row, r, b in zip(order, ranked, bound):
        width = int((r <= b).sum())
        width = max(nprobe_min, min(nprobe_max, width))
        out.append(ids[row[:width]].tolist())
    return out


def _assign_arrow_udf(cents_rows: "list[tuple[int, list[float]]]", n: int):
    """Arrow-batched coarse-list assignment: top-``n`` centroids by
    cosine per vector, as one (B, d) x (d, K) matmul per batch — the
    trained-path replacement for ``_assign``'s crossJoin + window
    formulation, whose n x K interpreted folds and shuffled scored rows
    dominate wall time once K=sqrt(n) (see ``_ivfpq_from``). Map-only,
    deterministic; core shared with the driver-side query prep
    (``_assign_topn_np``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def assign(vcol):
        x = np.asarray(vcol.tolist(), dtype=np.float64)
        return pd.Series(_assign_topn_np(x, cents_rows, n))

    # Explicit returnType (no hints) for the same reason as _pq_encode_udf.
    return pandas_udf(assign, "array<int>")


def _books_array(
    rows: "list[tuple[int, int, list[float]]]", m_subspaces: int, k: int, sub: int
):
    """(m, code, cd) rows -> numpy (M, K, SUB) tensor."""
    import numpy as np

    books = np.zeros((m_subspaces, k, sub), dtype=np.float64)
    for m, code, cd in rows:
        books[m, code] = cd
    return books


def _adc_t(vec_col: str, sub: int, m_expr: str = "m") -> Column:
    """||slice(vec, m) - cd||^2 as a JVM fold — the ADC table entry."""
    return F.aggregate(
        F.zip_with(
            F.slice(F.col(vec_col), F.expr(f"{m_expr} * {sub} + 1"), sub),
            F.col("cd"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def topk_pq_trained(
    spark: SparkSession, sf_dir: str, adaptive: bool = True
) -> DataFrame:
    """Product-quantization ANN under Lloyd-TRAINED subspace codebooks —
    the PRIMARY flat-PQ path (``topk_pq``'s sign-orthant books are the
    oracle-checkable twin, the ``topk_ivf``/``topk_ivf_trained``
    pattern).

    Same plan as ``topk_pq`` (broadcast ADC tables, one scan over the
    4-byte codes, two-phase top-R, broadcast exact re-rank); two things
    change, and they change the scaling law:

    - Codebooks are k-means cells (Spark ML KMeans per subspace, 256
      cells, fixed seed) fitted on a deterministically capped sample and
      PERSISTED as an index artifact (ann_index.pq_codebooks — the FAISS
      train/add split; warm sessions plan zero training jobs). Trained
      cells shrink as data fills them, so ADC distortion FALLS with n
      instead of being a constant of the coding scheme.
    - The exact re-rank shortlist is therefore near-constant
      (max(50, n/100), ``_pq_trained_shortlist``) instead of the
      sign-orthant stopgap's n/10 — the re-rank no longer reads ~10% of
      the corpus, which is what un-caps PQ's scan savings at scale
      (measured against brute force in SCALE_ann_r11.md; recall floor
      pinned in tests/test_similarity_pq.py).

    Encoding is an Arrow-batched matmul-argmin UDF (``_pq_encode_udf``,
    map-only); k-means training is not SQL-expressible -> rows-only
    driver check, like every trained variant.

    Round 12 — the warm serving path is STAGE-FUSED to the shape a
    request actually needs: the query side (normalized query vectors,
    per-query ADC lookup arrays) is built DRIVER-SIDE from the persisted
    books and the persisted query-vector artifact
    (ann_index.query_vectors) with bit-identical arithmetic
    (``_query_nv_rows`` / ``_adc_arrays_np``), and the query vectors join
    the shortlist inside its broadcast build — a warm query plans TWO
    jobs (shortlist build over the codes artifact, then one
    broadcast-hash re-rank pass over the corpus), not the ~12-stage
    r11 chain whose per-stage latency dominated sf1 wall time.

    Round 14 — the DEFAULT serving shape is per-query ADAPTIVE: the
    exact re-rank widens ``PQ_ADAPT_WIDEN``-fold for exactly the queries
    whose ADC covered-gap signal says the floor shortlist has not
    separated from the decoy bulk (see the ``PQ_ADAPT_*`` comment —
    measured recall 0.80 -> 1.00 on organic sf0.1, 0.82 -> 1.00 on the
    mutated n=20k crossover corpus, with ZERO widening on corpora that
    lose no neighbor). The bulk estimate is driver-side arithmetic over
    a persisted code histogram; ``adaptive=False`` reproduces the
    round-13 fixed-floor plan bit-for-bit (the append demo pins it).
    """
    from mapreduce_hadoop_spark.operators import ann_index

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    nvt = emb.select(
        "vec_id", _div_by("v", "norm").alias("nv")
    )
    # Model GEOMETRY (book cell count) derives from the snapshot the
    # books were trained on — the BASE corpus when an append lineage is
    # declared (frozen models; ann_index.model_corpus_count); the
    # serving-time shortlist depth below tracks the LIVE n.
    model_n = ann_index.model_corpus_count(emb, sf_dir)
    k = min(PQ_TRAINED_K, max(16, model_n // 2))
    rows = ann_index.pq_codebooks(
        spark, nvt, sf_dir, PQ_TRAINED_M, PQ_TRAINED_SUB, k, tag="nv"
    )

    def encode_src(src: DataFrame) -> DataFrame:
        enc = _pq_encode_udf(_books_array(rows, PQ_TRAINED_M, k, PQ_TRAINED_SUB))
        return src.select(
            "vec_id", enc(F.col("v"), F.col("norm")).alias("cs")
        ).select(
            "vec_id",
            *[F.element_at("cs", m + 1).alias(f"c{m}") for m in range(PQ_TRAINED_M)],
        )

    # The FAISS ``add`` half: codes persist next to the books (encode is
    # deterministic given them), so a warm session's scan starts from a
    # pruned parquet read instead of re-encoding the corpus per query.
    # Appended corpora encode ONLY the delta against the frozen books.
    codes = ann_index.cached_relation(
        spark,
        sf_dir,
        ann_index.codes_artifact_name("nv", PQ_TRAINED_M, k),
        lambda: encode_src(emb),
        delta_build=lambda wm: encode_src(emb.filter(F.col("vec_id") >= wm)),
    )

    # Query side: driver-built local relations (zero Spark jobs warm).
    qnv_rows = _query_nv_rows(emb, sf_dir)
    q = spark.createDataFrame(qnv_rows, "query_id long, qnv array<double>")
    key_fields: "list[tuple[str, str]]" = [("query_id", "long")]
    key_rows: "list[tuple]" = [(qid,) for qid, _ in qnv_rows]
    # One ADC-array build feeds both the bulk estimate and the broadcast
    # relation (ADVICE r14 — the two computations were identical).
    adc_arrays = _adc_arrays_np(
        [nv for _, nv in qnv_rows], rows, PQ_TRAINED_M, PQ_TRAINED_SUB
    )
    if adaptive:
        hist = _codes_histogram(spark, codes, sf_dir, PQ_TRAINED_M, k, tag="nv")
        bulk = _bulk_adc_estimates(adc_arrays, hist, PQ_TRAINED_M)
        key_fields.append(("bulk", "double"))
        key_rows = [(qid, b) for (qid, _), b in zip(qnv_rows, bulk)]
    qarr = _local_qarr_df(
        spark,
        key_fields,
        key_rows,
        [nv for _, nv in qnv_rows],
        rows,
        PQ_TRAINED_M,
        PQ_TRAINED_SUB,
        adc=adc_arrays,
    )
    return _pq_adc_rank(
        codes,
        qarr,
        emb.select("vec_id", "v"),
        q,
        _pq_trained_shortlist(n),
        m_subspaces=PQ_TRAINED_M,
        candidates_per_query=n,
        persist_codes=False,
        adaptive=adaptive,
    )


def _derive_append_demo(
    spark: SparkSession, sf_dir: str, tag: str
) -> "tuple[str, str]":
    """Derive (once, cached under the index root keyed by the source
    corpus' fingerprint) the append-lineage corpus pair both append
    demos serve:

    - ``base/`` — the first ~90% of vectors (vec_id < watermark), the
      snapshot a production index is trained on;
    - ``full/`` — every vector, plus ``ann_base.json`` declaring the
      base and the watermark (the caller's append declaration).

    Query vectors (vec_id < N_QUERIES) stay in the base: the serving
    artifact layer keys query vectors by corpus, and an append never
    rewrites history below the watermark. ``tag`` namespaces the two
    demos' roots (``append_demo`` / ``append_demo_fixed``) so their
    artifacts can never interfere. Shared by ``ann_append_serving`` and
    ``ann_append_serving_fixed`` since round 15 (VERDICT r14 wrong item
    3 — the blocks were duplicated line for line while the kmeans twin's
    bytes were frozen for a rule-1a pin)."""
    import json

    from mapreduce_hadoop_spark.operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings")
    root = os.path.join(ann_index.index_root(), tag, ann_index._fingerprint(sf_dir))
    base_dir = os.path.join(root, "base")
    full_dir = os.path.join(root, "full")
    marker = os.path.join(root, "_derived")
    if not os.path.isfile(marker):
        n = ann_index.corpus_count(emb, sf_dir)
        wm = max(N_QUERIES, (n * 9) // 10)
        ann_index._write_committed(
            emb.filter(F.col("vec_id") < wm),
            os.path.join(base_dir, "embeddings.parquet"),
        )
        ann_index._write_committed(
            emb, os.path.join(full_dir, "embeddings.parquet")
        )
        with open(os.path.join(full_dir, "ann_base.json"), "w") as f:
            json.dump({"base": base_dir, "watermark": wm}, f)
        with open(marker, "w") as f:
            f.write(str(wm))
    return base_dir, full_dir


def ann_append_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat trained-PQ top-k served through a DECLARED APPEND LINEAGE,
    end to end — the driver-visible face of the incremental-add contract
    (VERDICT r12 order 2; the FAISS ``train`` once / ``add`` forever
    split, ``ann_index._base_info``).

    From the gate corpus the query derives ONCE (cached under the index
    root, keyed by the source corpus' fingerprint) an append-lineage
    pair:

    - ``base/``  — the first ~90% of vectors (vec_id < watermark), the
      snapshot a production index was trained on;
    - ``full/``  — every vector, plus ``ann_base.json`` declaring the
      base and the watermark (the caller's append declaration).

    It then indexes the base (train + add, persisted under the base's
    own fingerprint) and serves ``topk_pq_trained`` against the FULL
    corpus: the frozen base codebooks load from the base artifacts —
    never refit (pinned by the KMeans-poison test in
    tests/test_ann_index.py) — only the appended ~10% tail is encoded
    (O(delta), ``cached_relation``'s delta path), and the served codes
    relation is the base artifact unioned with the delta. At 100 TB
    this is the difference between an append costing a delta encode and
    costing a full retrain + re-encode of the corpus.

    Scale shape: both derivations are one filter/projection-free Spark
    write each (one-time); serving is the fused pq_trained plan — two
    parquet scans + two shuffles warm, zero Python. K-means training is
    not SQL-expressible -> rows-only driver check; the appended-vector
    searchability and frozen-model contracts are pinned in
    tests/test_ann_index.py and tests/test_similarity_pq.py.

    Round 15: serves at the DEFAULT (per-query adaptive) shortlist —
    the r14 ``adaptive=False`` pin expired at this round's head
    rotation as planned, so an appended-corpus user now gets the same
    covered-gap recall recovery as the primary flat path (the histogram
    behind the bulk estimate is lineage-keyed, see _codes_histogram).
    """
    base_dir, full_dir = _derive_append_demo(spark, sf_dir, "append_demo")
    # Index the base snapshot (train + add persist eagerly during plan
    # construction; warm calls load artifacts and fit nothing). The base
    # result frame itself is discarded — this is the one-time deployment
    # step a production system runs at train time.
    topk_pq_trained(spark, base_dir)
    # Serve the appended corpus through the frozen-model delta path.
    return topk_pq_trained(spark, full_dir)


FIXED_BOOKS_FNAME = f"pqfix_nv_m{PQ_M}.parquet"
FIXED_CODES_FNAME = f"codes_pqfix_m{PQ_M}.parquet"


def _fixed_books_rows(nvt_model: DataFrame) -> "list[tuple[int, int, list[float]]]":
    """Sign-orthant PQ codebooks as driver-side rows ``[(m, code, cd)]``
    — the deterministic 'train' half of the fixed-books append twin.

    ONE exact fixed-point aggregation over the MODEL corpus — since
    round 19 this IS ``topk_pq``'s codebook stage too (the sign-orthant
    twin adopted the driver-built query side; both callers share this
    single definition) — collected model-sized
    (<= M * 2^8 rows x 16 doubles). Centroid
    arithmetic mirrors Spark's cast/divide order exactly —
    ``float(bigint_sum) / float(bigint_n) / 1e9`` is the same IEEE
    double sequence as ``cast(s as double) / n / 1e9`` — so the
    persisted artifact is bit-identical to the in-plan form the
    ``topk_pq`` oracle verifies, and DuckDB reproduces it verbatim."""
    codes = nvt_model.select(
        "nv", *[_pq_code(F.col("nv"), m).alias(f"c{m}") for m in range(PQ_M)]
    )
    subs = codes.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.col(f"c{m}").alias("code"),
                        F.slice("nv", m * PQ_SUB + 1, PQ_SUB).alias("sub"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s")
    ).select("s.m", "s.code", "s.sub")
    cb = subs.groupBy("m", "code").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.expr(f"cast(floor(element_at(sub, {d}) * 1e9 + 0.5D) as bigint)")
            ).alias(f"s{d}")
            for d in range(1, PQ_SUB + 1)
        ],
    )
    out = []
    for r in cb.collect():  # model-sized: <= M * 256 rows
        cd = [float(r[f"s{d}"]) / float(r["n"]) / 1e9 for d in range(1, PQ_SUB + 1)]
        out.append((int(r["m"]), int(r["code"]), cd))
    out.sort(key=lambda t: (t[0], t[1]))
    return out


def topk_pq_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat sign-orthant PQ served entirely through the ARTIFACT layer —
    the deterministic serving twin that ``ann_append_serving_fixed``
    drives end to end.

    Same serving plan as ``topk_pq_trained`` (persisted books + codes,
    driver-built query side, fused broadcast re-rank: two parquet scans
    + two shuffles warm, zero Python in the hot path); same ARITHMETIC
    as ``topk_pq`` (sign-orthant codes, exact fixed-point centroid
    means, strict-fold cosines — all hash-verified against DuckDB for
    rounds). The combination is the point: every artifact this path
    loads (books, codes, base+delta union, frozen-base resolution) is a
    pure function of the corpus, so the FULL incremental-append
    machinery becomes SQL-expressible and driver-hash-verifiable, where
    the k-means twins can only rows-check (VERDICT r13 order 1).

    Append lineage (``ann_base.json``): the model corpus is the BASE
    snapshot (rows below the watermark) — resolved from the base's
    persisted artifact when it exists, recomputed from the declared
    byte-identical below-watermark rows otherwise, bit-identical either
    way — and the codes relation is the base artifact served AS IS
    unioned with an O(delta) encode of the appended tail
    (``ann_index.cached_relation``).

    Oracle-parity bound: candidates whose sign code never occurs in the
    base corpus read +inf ADC here but are inner-join-DROPPED by the
    SQL twin; both are excluded from the shortlist iff the base supplies
    >= shortlist finite candidates per query — guaranteed for the 90%
    watermark whenever n >= 57 (0.9n - 1 >= max(50, n/10)); every gate
    corpus has n >= 500.
    """
    from mapreduce_hadoop_spark.operators import ann_index

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    base = ann_index._base_info(sf_dir)
    model_src = (
        emb if base is None else emb.filter(F.col("vec_id") < base["watermark"])
    )
    nvt_model = model_src.select("vec_id", _div_by("v", "norm").alias("nv"))
    rows = ann_index.fixed_model(
        sf_dir,
        FIXED_BOOKS_FNAME,
        ["m", "code", "cd"],
        lambda: _fixed_books_rows(nvt_model),
    )
    rows = [(int(m), int(c), list(cd)) for m, c, cd in rows]

    def encode_src(src: DataFrame) -> DataFrame:
        nvt = src.select("vec_id", _div_by("v", "norm").alias("nv"))
        return nvt.select(
            "vec_id",
            *[_pq_code(F.col("nv"), m).alias(f"c{m}") for m in range(PQ_M)],
        )

    codes = ann_index.cached_relation(
        spark,
        sf_dir,
        FIXED_CODES_FNAME,
        lambda: encode_src(emb),
        delta_build=lambda wm: encode_src(emb.filter(F.col("vec_id") >= wm)),
    )

    qnv_rows = _query_nv_rows(emb, sf_dir)
    q = spark.createDataFrame(qnv_rows, "query_id long, qnv array<double>")
    qarr = _local_qarr_df(
        spark,
        [("query_id", "long")],
        [(qid,) for qid, _ in qnv_rows],
        [nv for _, nv in qnv_rows],
        rows,
        PQ_M,
        PQ_SUB,
    )
    return _pq_adc_rank(
        codes,
        qarr,
        emb.select("vec_id", "v"),
        q,
        _pq_shortlist(n),
        m_subspaces=PQ_M,
        candidates_per_query=n,
        persist_codes=False,
    )


def ann_append_serving_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-append union semantics, HASH-VERIFIED: the exact
    base/full derivation and frozen-model serving of
    ``ann_append_serving`` — same 90% watermark, same ``ann_base.json``
    declaration, same ``_base_info``/``cached_relation`` base+delta
    union — but under the deterministic sign-orthant books of
    ``topk_pq_fixed``, so DuckDB reproduces the entire path bit-for-bit
    (the ``topk_pq`` <-> ``topk_pq_trained`` twinning pattern applied to
    the append contract; VERDICT r13 order 1). A wrong watermark cut, a
    double-counted boundary vector, or a delta encoded against refit
    books would all hash-mismatch here, where the k-means twin's
    rows-only check is blind.

    The derivation is the SHARED ``_derive_append_demo`` helper (round
    15 fold — the r14 byte-freeze reason expired at rotation) under its
    own ``append_demo_fixed`` root, so the two demos' artifacts can
    never interfere.
    """
    base_dir, full_dir = _derive_append_demo(spark, sf_dir, "append_demo_fixed")
    # One-time deployment step: index the base snapshot (books + codes
    # artifacts persist eagerly during plan construction).
    topk_pq_fixed(spark, base_dir)
    # Serve the appended corpus through the frozen-model delta path.
    return topk_pq_fixed(spark, full_dir)


def _ann_append_fixed_oracle() -> str:
    """The fixed-books append serve, restated over the ORIGINAL corpus:
    the derived base is exactly ``vec_id < greatest(10, n*9//10)``, so
    the frozen books are the sign-orthant centroid means of those rows
    and everything else is ``topk_pq``'s oracle with the model CTEs
    filtered to the base — candidates with codes unseen in the base drop
    out of the inner ADC join, mirroring the +inf exclusion (see the
    parity bound in ``topk_pq_fixed``)."""

    def code_sql(m: int) -> str:
        return " + ".join(
            f"CASE WHEN nv[{m * PQ_SUB + j + 1}] >= 0.0 THEN {1 << j} ELSE 0 END"
            for j in range(PQ_CODE_BITS)
        )

    sums = ",\n         ".join(
        f"sum(CAST(floor(nv[m*{PQ_SUB}+{d}] * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s{d}"
        for d in range(1, PQ_SUB + 1)
    )
    cents = ", ".join(
        f"CAST(s{d} AS DOUBLE)/n/1e9 AS cd{d}" for d in range(1, PQ_SUB + 1)
    )
    adc_terms = " + ".join(
        f"(q.qnv[c.m*{PQ_SUB}+{d}] - c.cd{d}) * (q.qnv[c.m*{PQ_SUB}+{d}] - c.cd{d})"
        for d in range(1, PQ_SUB + 1)
    )
    joins = "\n  ".join(
        f"JOIN adc a{m} ON a{m}.m = {m} AND a{m}.code = cd.c{m}"
        + ("" if m == 0 else f" AND a{m}.query_id = a0.query_id")
        for m in range(PQ_M)
    )
    case_code = "CASE ms.m " + " ".join(
        f"WHEN {m} THEN c{m}" for m in range(PQ_M - 1)
    ) + f" ELSE c{PQ_M - 1} END"
    return f"""
WITH e AS ({EMB_NORM_SQL}),
nvt AS (SELECT vec_id, [v[i]/norm for i in range(1, {EMB_DIM + 1})] AS nv FROM e),
wm AS (SELECT greatest({N_QUERIES}, (count(*) * 9) // 10) AS w FROM e),
codes AS (SELECT vec_id, nv,
          {", ".join(f"{code_sql(m)} AS c{m}" for m in range(PQ_M))}
          FROM nvt),
subs AS (SELECT ms.m AS m, {case_code} AS code, nv
         FROM codes, (SELECT unnest(range({PQ_M})) AS m) ms
         WHERE codes.vec_id < (SELECT w FROM wm)),
cb AS (SELECT m, code, count(*) AS n,
         {sums}
       FROM subs GROUP BY m, code),
cent AS (SELECT m, code, {cents} FROM cb),
q AS (SELECT vec_id AS query_id, nv AS qnv FROM nvt WHERE vec_id < {N_QUERIES}),
adc AS (SELECT q.query_id, c.m, c.code,
          CAST(0 AS DOUBLE) + {adc_terms} AS t
        FROM q, cent c),
scored AS (
  SELECT a0.query_id, cd.vec_id,
         round(CAST(0 AS DOUBLE) + {" + ".join(f"a{m}.t" for m in range(PQ_M))}, 6) AS adc
  FROM codes cd
  {joins}
  WHERE cd.vec_id <> a0.query_id
),
local AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id, vec_id % {PQ_TOPK_BUCKETS}
        ORDER BY adc, vec_id) AS lr
    FROM scored) WHERE lr <= {PQ_SHORTLIST_SQL}),
short AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc, vec_id) AS sr
    FROM local) WHERE sr <= {PQ_SHORTLIST_SQL}),
rer AS (SELECT s.query_id, s.vec_id,
          round({DOT_SQL.format(a="qq.qnv", b="nvt.nv")}, 6) AS cosine,
          s.adc
        FROM short s
        JOIN nvt ON nvt.vec_id = s.vec_id
        JOIN q qq ON qq.query_id = s.query_id)
SELECT query_id, vec_id, cosine, adc, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rer)
WHERE rank <= {TOP_K}
"""


ANN_APPEND_FIXED_ORACLE = _ann_append_fixed_oracle()


# --- IVF-PQ composition ------------------------------------------------------


def topk_ivfpq(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding: the full FAISS IVFPQ composition —
    coarse IVF pruning cuts WHICH vectors are scanned (nprobe/K of the
    corpus per query), PQ-ADC over the RESIDUAL x - c_list cuts WHAT is
    read per scanned vector (4 code bytes + 4 lookup adds instead of 64
    floats), and a scale-adaptive (max(50, n/10))-deep exact re-rank
    (``_pq_shortlist``) restores precision on the shortlist.

    Residual encoding (round 10, README lever 1): each vector is coded as
    r = nv - nc_list (its normalized self minus its normalized coarse
    centroid), so the reconstruction x_hat = nc_list + r_hat carries the
    list centroid EXACTLY and quantizes only the residual — the part of
    the vector the coarse quantizer already explains costs zero code
    budget. Codebooks are PER LIST, keyed (list, m, code): with this
    one-step sign-orthant codebook family a global residual book mixes 16
    lists' differently-scaled residual clouds and its cell means wash out
    (measured: global-residual recall@5 0.56 at sf0.01 — WORSE than the
    0.72 no-residual variant it replaced); per-list books quantize each
    list's own cloud. Measured at nprobe=8: recall@5 0.78 at sf0.001 (=
    the IVF pruning ceiling exactly; no-residual was 0.72) and 0.72 at
    sf0.01 with shortlist/ceiling ratio 0.92 (vs 0.98 at sf0.001);
    tests/test_similarity_pq.py pins the floor. The ADC table becomes
    per-(query, probed list): t[q, L, m, code] = ||(q - nc_L)_m - cd||^2,
    still model-sized (N_QUERIES x nprobe x M x 2^bits <= 82k rows) and
    broadcast.

    Scale caveat, stated honestly: per-list books grow as
    K x M x 2^bits x PQ_SUB doubles (~2 MB at K=16; ~8 GB at the
    K=65536 a billion-vector deployment would use). At that K the right
    evolution is FAISS's: a GLOBAL residual book with TRAINED (Lloyd-
    iterated) centroids instead of sign orthants — the training mass
    concentrates and the wash-out this per-list layout works around
    disappears. The plan shape (broadcast ADC, one corpus scan) is
    identical either way; only the codebook CTE changes.

    Plan shape: centroids, probe assignments, and ADC tables broadcast
    (model-sized); the candidate scan is ONE pass over
    (vec_id, cent_id, 4 PQ codes) with four broadcast hash joins — the
    probe filter FOLDS INTO the first ADC join (its key is
    (cent_id, code), so matching an ADC row IS being probed); the
    shortlist runs the same two-phase vec_id % 64 fan-out as ``topk_pq``.
    Every stage is deterministic (fixed centroids, sign-pattern residual
    codebooks, fixed-point centroid means, exact float subtraction in
    both engines), so the full composition is SQL-expressible and
    hash-verified; ``topk_ivfpq_trained`` drops k-means centroids into
    this identical plan.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    return _ivfpq_from(
        emb, _ivf_centroids(emb), nprobe, _pq_shortlist(n), candidates_per_query=n
    )


def _bylist_raw_source(
    emb: DataFrame,
    open_raw: "Callable[[], DataFrame]",
    sf_dir: "str | None",
    raw_name: str,
    probed: "list[int]",
) -> DataFrame:
    """Exact-re-rank source, COST-BASED (the one file-source decision
    Catalyst cannot make for us because only the driver knows the probe
    set): serve the raw vectors from the pruned by-list copy iff the
    bytes its probed directories actually hold undercut a COLUMN-PRUNED
    flat scan of the source corpus — the by-list side is exact stat()
    arithmetic over the probed ``cent_id=`` directories (it holds only
    the columns the re-rank reads), the flat side is the compressed
    column-chunk bytes of (vec_id, embedding) in the source file
    (ADVICE r15: whole-file accounting overpriced the flat branch on
    corpora whose source carries extra columns). The two regimes are
    real (measured, SCALE_ann_r15.md): on production-shaped
    (incompressible) embeddings the pruned copy wins ~1/f; on the
    synthetic gate corpora the flat source file enjoys cross-replica
    dictionary compression the clustered copy cannot keep, and an
    adaptive probe set near K would read most of a bigger artifact. The
    rule makes the layout NEVER-WORSE in the measured currency. Shared
    by the trained path (``_ivfpq_from``) and its deterministic-books
    driver-hash twin (``topk_ivfpq_fixed``) — both branches are
    output-identical by construction (shortlist candidates all come
    from probed lists), pinned by tests/test_similarity_pq.py."""
    from mapreduce_hadoop_spark.operators import ann_index

    # PATHS-FIRST (round 16): the branch is decided from driver-side
    # stat()/footer arithmetic alone, and only the WINNING side is ever
    # opened — opening a K-directory hive artifact costs a K-path file
    # listing at plan time (Spark runs it as a distributed job past 32
    # paths), which the same-day sf1 control measured as real wall on
    # every query that then served flat anyway.
    raw_paths = ann_index.relation_paths(sf_dir, raw_name)
    if raw_paths is None:
        # Cold (or volatile) corpus: build the by-list copy — the FAISS
        # add — then re-resolve; a volatile corpus stays unresolvable
        # and serves the flat source below.
        open_raw()
        raw_paths = ann_index.relation_paths(sf_dir, raw_name)
    src_path = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    if raw_paths is None or ann_index.pruned_bytes(
        raw_paths, "cent_id", probed
    ) >= ann_index.column_bytes(src_path, ["vec_id", "embedding"]):
        return emb.select("vec_id", "v")
    return open_raw().filter(F.col("cent_id").isin(probed)).select("vec_id", "v")


# Lazy flat-codes gate (round 17): build the flat re-layout only when
# the probe union's pruned by-list bytes reach this fraction of the
# whole by-list artifact — below it, the by-list side wins the exact
# cost rule against any flat layout inside the measured compression
# band (flat total ~1.05x under by-list total on codes; 0.5 leaves ~2x
# margin), so the ~2x codes-storage cost of the copy is never paid.
CODES_FLAT_LAZY_FRACTION = 0.5


def _bylist_codes_source(
    spark: SparkSession,
    sf_dir: "str | None",
    open_bylist: "Callable[[], DataFrame]",
    codes_name: str,
    flat_name: str,
    probed: "list[int]",
    m_subspaces: int,
) -> DataFrame:
    """ADC-scan source, COST-BASED (round 16 — the codes-side branch the
    round-15 layout left unpriced): serve the PQ codes from the pruned
    by-list artifact iff the bytes its probed directories hold undercut
    a flat scan of the SAME codes laid out contiguously. Round 15
    measured the penalty of always serving by-list: at a full-union
    probe set the hive scan reads every list directory — per-directory
    overhead plus the cross-list compression the clustered layout cannot
    keep (synthetic n=1M batch-10: 171.0 vs 163.1 MB), and the same-day
    three-tree wall control at organic sf1 (K=141, probe union = all
    lists) read the r14 flat-codes plan ~20% faster (SCALE_ann_r16.md).

    The flat copy is built FROM the committed by-list relation — a pure
    re-layout (one parquet read + write, NO second encode pass), so the
    add-time cost is one extra write of the ~8-byte-per-vector codes,
    not a second UDF scan of the corpus. Under an append lineage the
    flat delta derives from the served base+delta union filtered to the
    watermark — the same rows the by-list delta holds. Both branches
    carry the probe filter (as a partition filter on the by-list side,
    a pushed row-group filter on the flat side) and feed the identical
    cent_id broadcast join, so they are output-identical by
    construction — forced both ways in tests/test_similarity_pq.py."""
    from mapreduce_hadoop_spark.operators import ann_index

    # PATHS-FIRST, like _bylist_raw_source: resolve both sides from
    # committed paths, build what is missing (by-list first — the add —
    # then the flat re-layout FROM it), and only OPEN the winner, so a
    # full-union query never pays the K-directory listing of the
    # by-list artifact it will not read.
    bl_paths = ann_index.relation_paths(sf_dir, codes_name)
    rel = None
    if bl_paths is None:
        rel = open_bylist()
        bl_paths = ann_index.relation_paths(sf_dir, codes_name)
    pruned = (
        ann_index.pruned_bytes(bl_paths, "cent_id", probed)
        if bl_paths is not None
        else None
    )
    cols = ["vec_id", "cent_id"] + [f"c{m}" for m in range(m_subspaces)]
    flat_paths = ann_index.relation_paths(sf_dir, flat_name)
    if flat_paths is None:
        # LAZY build (round 17, VERDICT r16 order 4): the flat copy
        # doubles codes storage, and a floor-width probe set can never
        # flip the cost rule toward it — the by-list side wins the exact
        # comparison whenever its probed directories undercut the whole
        # artifact by more than the cross-list compression a flat layout
        # can recover (measured band: flat total within ~1.05x of the
        # by-list total on codes, SCALE_ann_r16.md §2-3; the 0.5 gate
        # leaves a ~2x margin). So the re-layout is built on the FIRST
        # probe union wide enough that flat could plausibly win, not
        # unconditionally at add time; a corpus that only ever serves
        # narrow unions commits no flat artifact at all (suite-pinned by
        # tests/test_similarity_pq.py::
        # test_floor_probe_lineage_commits_no_flat_codes).
        # Gate in the SAME units as the exact rule below (ADVICE r17):
        # the hypothetical flat side is estimated as the by-list
        # relation's column-chunk bytes for exactly the served columns
        # (the measured flat/by-list band is ~1.05x on codes), not the
        # whole-artifact tree bytes — so an artifact that ever grows
        # extra columns cannot inflate the threshold and mis-skip the
        # flat build. cent_id is a partition column on the by-list side
        # (0 column-chunk bytes), which only UNDERSTATES the estimate:
        # the gate then errs toward building flat and the exact rule —
        # never-worse by construction — still picks the served side.
        if pruned is not None and pruned < CODES_FLAT_LAZY_FRACTION * sum(
            ann_index.column_bytes(p, cols) for p in bl_paths
        ):
            return (rel if rel is not None else open_bylist()).filter(
                F.col("cent_id").isin(probed)
            )
        src = rel if rel is not None else open_bylist()
        # vec_id-sorted re-layout: the by-list relation arrives
        # clustered by cent_id, and writing it as-is scatters vec_id
        # runs across files — measured 2.2x the bytes of an
        # order-preserving encode at sf1 (281.6 vs 128.9 KB). One sort
        # of the ~10-byte code rows at add time restores the
        # sequential-vec_id encoding the flat layout exists for
        # (range-partitioned, no single-task bottleneck).
        flat_rel = ann_index.cached_relation(
            spark,
            sf_dir,
            flat_name,
            lambda: src.sort("vec_id"),
            delta_build=lambda wm: src.filter(F.col("vec_id") >= wm).sort(
                "vec_id"
            ),
        )
        flat_paths = ann_index.relation_paths(sf_dir, flat_name)
        if flat_paths is None:  # volatile corpus: no artifacts at all
            return flat_rel.filter(F.col("cent_id").isin(probed))
    if bl_paths is None:
        return (rel if rel is not None else open_bylist()).filter(
            F.col("cent_id").isin(probed)
        )
    if pruned >= sum(ann_index.column_bytes(p, cols) for p in flat_paths):
        return spark.read.parquet(*flat_paths).filter(
            F.col("cent_id").isin(probed)
        )
    return (rel if rel is not None else open_bylist()).filter(
        F.col("cent_id").isin(probed)
    )


def _ivfpq_from(
    emb: DataFrame,
    cents: DataFrame,
    nprobe: int,
    shortlist: int,
    spark: "SparkSession | None" = None,
    sf_dir: "str | None" = None,
    trained_books: bool = False,
    cents_rows: "list[tuple[int, list[float]]] | None" = None,
    candidates_per_query: "int | None" = None,
    probe_eps: "float | None" = None,
    nprobe_max: "int | None" = None,
) -> DataFrame:
    """Shared residual IVF-PQ plan; ``cents`` is any (cent_id, cv, cn)
    relation (fixed rows for the oracle twin, k-means for the trained).

    ``trained_books=True`` swaps the per-list sign-orthant residual
    codebooks for ONE GLOBAL Lloyd-trained residual book
    (ann_index.pq_codebooks over the residual column, persisted) — the
    FAISS IVFPQ layout proper. Round 10 measured that a global
    SIGN-ORTHANT book washes out (0.56 recall: 16 lists'
    differently-scaled residual clouds share fixed cells) and worked
    around it with per-list books, at K x M x 2^bits x 16 doubles (~8 GB
    at K=65536). Trained cells place themselves where the pooled
    residual mass actually is, so the global book works — and the book
    is M x 2^bits x 16 doubles FLAT IN K, which removes the round-10
    scale caveat. ADC tables stay per-(query, probed list) because the
    query residual differs per list; the cent_id broadcast join remains
    the probe filter. Plan shape identical either way.

    ``cents_rows`` (trained path only) is the driver-side centroid list
    behind ``cents``: with it, list assignment runs as an Arrow-batched
    matmul-argmax UDF instead of the crossJoin + window formulation —
    at K=sqrt(n) the JVM form evaluates n x K interpreted array folds
    and shuffles the n x K scored rows (measured as THE top cost of
    topk_ivfpq_trained at sf1: 2.8M folds, ~30 s of a 44 s query). The
    hash-verified fixed-K twin keeps the JVM form: its output is
    oracle-pinned and K=16 keeps the crossJoin small.
    """
    nvt = emb.select(
        "vec_id", _div_by("v", "norm").alias("nv")
    )
    ncents = cents.select(
        "cent_id", _div_by("cv", "cn").alias("ncv")
    )

    # Residual per vector: r = nv - nc_list, in the same projection as the
    # list assignment (no corpus-side join beyond the broadcast centroids).
    if cents_rows is not None:
        assign1 = _assign_arrow_udf(cents_rows, 1)
        lists = emb.select(
            "vec_id",
            "v",
            "norm",
            F.element_at(assign1(F.col("v")), 1).alias("cent_id"),
        )
    else:
        lists = _assign(emb, cents, 1, "cent_id")
    base = lists.join(F.broadcast(ncents), "cent_id").select(
        "vec_id",
        "cent_id",
        F.zip_with(
            _div_by("v", "norm"),
            F.col("ncv"),
            lambda a, b: a - b,
        ).alias("r"),
    )

    if trained_books:
        import math

        from mapreduce_hadoop_spark.operators import ann_index

        assert cents_rows is not None, "trained_books requires cents_rows"
        coarse_k = len(cents_rows)
        # Book geometry from the TRAINED snapshot (frozen under an
        # append lineage), like the flat path.
        model_n = ann_index.model_corpus_count(emb, sf_dir)
        k = min(PQ_TRAINED_K, max(16, model_n // 2))
        rows = ann_index.pq_codebooks(
            spark, base.select("vec_id", F.col("r").alias("res")),
            sf_dir, PQ_TRAINED_M, PQ_TRAINED_SUB, k, tag="res",
            coarse_k=coarse_k,
        )
        def codes_src(src: DataFrame) -> DataFrame:
            enc = _pq_encode_udf(
                _books_array(rows, PQ_TRAINED_M, k, PQ_TRAINED_SUB),
                residual=True,
            )
            plain = src.join(F.broadcast(ncents), "cent_id")
            return plain.select(
                "vec_id",
                enc(F.col("v"), F.col("norm"), F.col("ncv")).alias("cs"),
                "cent_id",
            ).select(
                "vec_id",
                *[
                    F.element_at("cs", m + 1).alias(f"c{m}")
                    for m in range(PQ_TRAINED_M)
                ],
                "cent_id",
            )

        def raw_src(src: DataFrame) -> DataFrame:
            return src.select("vec_id", "v", "cent_id")

        # The FAISS ``add`` half, BY-LIST RAW-IN-INDEX since round 15
        # (VERDICT r14 order 2): the codes AND a serving copy of the raw
        # vectors persist hive-partitioned by coarse list — FAISS's
        # ``add``, where the index owns the raw data clustered the way
        # queries read it. TWO co-partitioned artifacts rather than one:
        # the ADC scan reads code columns and the exact re-rank reads
        # vector columns, and a shared artifact would make every scan
        # open (and a byte-accounting reader count) the other side's
        # bytes. Both prune to the driver-known probed-list union
        # (directory pruning — the mechanism SCALE_ann_r14.md §5
        # measured as the one matching FAISS's contiguous-list reads;
        # the flat layout scanned the FULL codes artifact and the FULL
        # raw corpus per query, 162 MB at n=1M regardless of batch
        # size). Codes name keys the residual book (k), the coarse
        # quantizer (K), and the training recipe; the raw copy depends
        # only on the assignment, so it keys the coarse recipe alone.
        # Deterministic given the models; assignment included, so a
        # warm session also skips the corpus assign. Appended corpora
        # assign + encode only the delta against the frozen models,
        # partitioned the same way.
        codes_name = "bylist_" + ann_index.codes_artifact_name(
            "res", PQ_TRAINED_M, k, coarse_k=coarse_k
        )

        def open_bylist_codes() -> DataFrame:
            return ann_index.cached_relation(
                spark,
                sf_dir,
                codes_name,
                lambda: codes_src(lists),
                delta_build=lambda wm: codes_src(
                    lists.filter(F.col("vec_id") >= wm)
                ),
                partition_by="cent_id",
            )

        raw_name = (
            f"bylist_raw_K{coarse_k}_"
            f"{ann_index._recipe(ann_index.COARSE_MAXITER)}.parquet"
        )

        def open_bylist_raw() -> DataFrame:
            return ann_index.cached_relation(
                spark,
                sf_dir,
                raw_name,
                lambda: raw_src(lists),
                delta_build=lambda wm: raw_src(
                    lists.filter(F.col("vec_id") >= wm)
                ),
                partition_by="cent_id",
            )

        # Query side, DRIVER-BUILT (round-12 stage fusion): probe
        # assignment runs the SAME numpy core the corpus UDF uses
        # (_assign_topn_np), per-list query residuals and ADC arrays
        # replicate the JVM folds term for term (_query_nv_rows /
        # _adc_arrays_np), and everything ships as local relations — a
        # warm query plans zero query-side Spark jobs where the r11
        # chain planned an Arrow UDF stage + two broadcast joins.
        import numpy as np

        qv_rows = ann_index.query_vectors(emb, sf_dir, N_QUERIES)
        qnv_rows = _query_nv_rows(emb, sf_dir)
        xq = np.asarray([v for _, v in qv_rows], dtype=np.float64)
        if probe_eps is not None:
            # Adaptive probe width (round 13): the SPANN closeness rule
            # on the query side — see _probe_lists_adaptive.
            probe_lists = _probe_lists_adaptive(
                xq, cents_rows, nprobe, probe_eps,
                nprobe_max if nprobe_max is not None else len(cents_rows),
            )
        else:
            probe_lists = _assign_topn_np(xq, cents_rows, nprobe)
        # Directory pruning on the driver-known probe-set union: the
        # cent_id broadcast join below is still the per-query probe
        # filter; this literal isin() is what lets the parquet source
        # skip unprobed list directories at planning time (a join alone
        # prunes rows, not partitions). Shortlist candidates all come
        # from probed lists, so serving the re-rank from the same pruned
        # relation is exact.
        probed = sorted({int(c) for pl in probe_lists for c in pl})
        pruned = _bylist_codes_source(
            spark,
            sf_dir,
            open_bylist_codes,
            codes_name,
            ann_index.codes_artifact_name(
                "res", PQ_TRAINED_M, k, coarse_k=coarse_k
            ),
            probed,
            PQ_TRAINED_M,
        )
        raw = _bylist_raw_source(emb, open_bylist_raw, sf_dir, raw_name, probed)
        ncv = {
            cid: [x / math.sqrt(_strict_dot(cv, cv)) for x in cv]
            for cid, cv in cents_rows
        }
        keys: "list[tuple]" = []
        qrs: "list[list[float]]" = []
        for (qid, nv), plist in zip(qnv_rows, probe_lists):
            for cid in plist:
                keys.append((qid, cid))
                qrs.append([a - b for a, b in zip(nv, ncv[cid])])
        q = spark.createDataFrame(qnv_rows, "query_id long, qnv array<double>")
        qarr = _local_qarr_df(
            spark,
            [("query_id", "long"), ("cent_id", "int")],
            keys,
            qrs,
            rows,
            PQ_TRAINED_M,
            PQ_TRAINED_SUB,
        )
        return _ivfpq_scan_rank(
            pruned,
            qarr,
            raw,
            q,
            shortlist,
            m_subspaces=PQ_TRAINED_M,
            candidates_per_query=candidates_per_query,
            persist_codes=False,
        )

    codes = base.select(
        "vec_id",
        "cent_id",
        "r",
        *[_pq_code(F.col("r"), m).alias(f"c{m}") for m in range(PQ_M)],
    )

    # Residual codebooks PER LIST: ONE shuffle over (list, m, code).
    # Residuals from different lists have different scales/shapes, so a
    # global book washes out (measured: global-residual recall@5 0.56 vs
    # per-list 0.74 at sf0.01); per-list books quantize each list's own
    # residual cloud. Book size K x M x 2^bits cells — still model-sized.
    subs = codes.select(
        "cent_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.col(f"c{m}").alias("code"),
                        F.slice("r", m * PQ_SUB + 1, PQ_SUB).alias("sub"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("cent_id", "s.m", "s.code", "s.sub")
    cb = subs.groupBy("cent_id", "m", "code").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.expr(f"cast(floor(element_at(sub, {d}) * 1e9 + 0.5D) as bigint)")
            ).alias(f"s{d}")
            for d in range(1, PQ_SUB + 1)
        ],
    )
    cent = cb.select(
        "cent_id",
        "m",
        "code",
        *[
            (F.col(f"s{d}").cast("double") / F.col("n") / F.lit(1e9)).alias(f"cd{d}")
            for d in range(1, PQ_SUB + 1)
        ],
    )

    q = nvt.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qnv")
    )
    # Query residual per PROBED list: qr = qnv - nc_L for each of the
    # nprobe lists the query visits.
    qres = (
        _assign(emb.filter(F.col("vec_id") < N_QUERIES), cents, nprobe, "cent_id")
        .join(F.broadcast(ncents), "cent_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "cent_id",
            F.zip_with(
                _div_by("v", "norm"),
                F.col("ncv"),
                lambda a, b: a - b,
            ).alias("qr"),
        )
    )
    # ADC tables keyed by (query, probed list): distance from the query's
    # per-list residual to each cell of THAT list's residual book. Bounded
    # at N_QUERIES * nprobe * PQ_M * 2^PQ_CODE_BITS rows — model-sized.
    adc_terms = " + ".join(
        f"(element_at(qr, m * {PQ_SUB} + {d}) - cd{d})"
        f" * (element_at(qr, m * {PQ_SUB} + {d}) - cd{d})"
        for d in range(1, PQ_SUB + 1)
    )
    adc = _persisted(
        cent.join(F.broadcast(qres), "cent_id").select(
            "query_id", "cent_id", "m", "code", F.expr(f"0.0D + {adc_terms}").alias("t")
        )
    )

    return _ivfpq_scan_rank(
        codes,
        _adc_scatter_arrays(adc, ["query_id", "cent_id"], PQ_M),
        emb.select("vec_id", "v"),
        q,
        shortlist,
        candidates_per_query=candidates_per_query,
    )


def _ivfpq_scan_rank(
    codes: DataFrame,
    qarr: DataFrame,
    raw: DataFrame,
    q: DataFrame,
    shortlist: int,
    m_subspaces: int = PQ_M,
    candidates_per_query: "int | None" = None,
    persist_codes: bool = True,
) -> DataFrame:
    """Shared IVF-PQ ADC scan + two-phase shortlist + exact re-rank;
    ``codes`` is (vec_id, cent_id, c0..c{M-1}), ``qarr`` is one row per
    (query_id, cent_id) — PROBED lists only — carrying M dense 256-slot
    ADC lookup arrays (columns `0`..`M-1`).

    The single ``cent_id`` broadcast join IS the probe filter — a
    per-query ADC-array row exists only for (query, probed list), so
    joining on cent_id both fans out the probed queries and delivers the
    M lookup arrays; each candidate then pays M O(1) array
    ``element_at`` probes. Round 10 measured and rejected map<code, t>
    columns (map element_at LINEAR-scans ArrayBasedMapData, 8.17 vs
    5.58 s at sf0.1); round 11 replaced the M broadcast hash joins with
    the array form: outputs identical, and one join instead of M wins as
    M grows (measured on the flat-PQ scan: -30% at M=8/sf1).
    """
    codes = codes.select("vec_id", "cent_id", *[f"c{m}" for m in range(m_subspaces)])
    if persist_codes:
        codes = _persisted(codes)
    sc = codes.join(F.broadcast(qarr), "cent_id")
    t_sum = " + ".join(f"element_at(`{m}`, c{m} + 1)" for m in range(m_subspaces))
    scored = sc.select(
        "query_id",
        "vec_id",
        F.round(F.expr(f"0.0D + {t_sum}"), 6).alias("adc"),
    ).filter(F.col("vec_id") != F.col("query_id"))

    # Shortlist (one window or bucketed two-phase by candidate volume —
    # see _shortlist_topr; identical output either way).
    short = _shortlist_topr(scored, shortlist, candidates_per_query)
    # Re-rank with q folded into the shortlist broadcast — one
    # broadcast-hash join against the RAW corpus scan, with the
    # normalize-fold + cosine computed ABOVE the join (shortlist
    # survivors only), same fusion + fold placement as _pq_adc_rank.
    rer = raw.join(
        F.broadcast(short.join(F.broadcast(q), "query_id")), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qnv"), _div_by(F.col("v"), F.sqrt(_dot(F.col("v"), F.col("v"))))),
            6,
        ).alias("cosine"),
        "adc",
    )
    w3 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rer.select("*", F.row_number().over(w3).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "adc", "rank")
    )


def _topk_ivfpq_oracle() -> str:
    def code_sql(m: int) -> str:
        return " + ".join(
            f"CASE WHEN r[{m * PQ_SUB + j + 1}] >= 0.0 THEN {1 << j} ELSE 0 END"
            for j in range(PQ_CODE_BITS)
        )

    sums = ",\n         ".join(
        f"sum(CAST(floor(r[m*{PQ_SUB}+{d}] * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s{d}"
        for d in range(1, PQ_SUB + 1)
    )
    cents = ", ".join(
        f"CAST(s{d} AS DOUBLE)/n/1e9 AS cd{d}" for d in range(1, PQ_SUB + 1)
    )
    adc_terms = " + ".join(
        f"(p.qr[c.m*{PQ_SUB}+{d}] - c.cd{d}) * (p.qr[c.m*{PQ_SUB}+{d}] - c.cd{d})"
        for d in range(1, PQ_SUB + 1)
    )
    joins = "\n  ".join(
        f"JOIN adc a{m} ON a{m}.cent_id = b.cent_id AND a{m}.m = {m} "
        f"AND a{m}.code = b.c{m}"
        + ("" if m == 0 else f" AND a{m}.query_id = a0.query_id")
        for m in range(PQ_M)
    )
    case_code = "CASE ms.m " + " ".join(
        f"WHEN {m} THEN c{m}" for m in range(PQ_M - 1)
    ) + f" ELSE c{PQ_M - 1} END"
    return f"""
WITH e AS ({EMB_NORM_SQL}),
c AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM e
      WHERE vec_id >= {IVF_CENT_LO} AND vec_id < {IVF_CENT_HI}),
nc AS (SELECT cent_id, [cv[i]/cn for i in range(1, {EMB_DIM + 1})] AS ncv FROM c),
assigned AS (
    SELECT vec_id, v, norm, cent_id FROM (
        SELECT e.vec_id, e.v, e.norm, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                            c.cent_id) AS crank
        FROM e CROSS JOIN c
    ) WHERE crank <= 1
),
base AS (SELECT a.vec_id, a.cent_id,
           [a.v[i]/a.norm - nc.ncv[i] for i in range(1, {EMB_DIM + 1})] AS r
         FROM assigned a JOIN nc ON nc.cent_id = a.cent_id),
codes AS (SELECT vec_id, cent_id, r,
          {", ".join(f"{code_sql(m)} AS c{m}" for m in range(PQ_M))}
          FROM base),
subs AS (SELECT cent_id, ms.m AS m, {case_code} AS code, r
         FROM codes, (SELECT unnest(range({PQ_M})) AS m) ms),
cb AS (SELECT cent_id, m, code, count(*) AS n,
         {sums}
       FROM subs GROUP BY cent_id, m, code),
cent AS (SELECT cent_id, m, code, {cents} FROM cb),
nvt AS (SELECT vec_id, [v[i]/norm for i in range(1, {EMB_DIM + 1})] AS nv FROM e),
q AS (SELECT vec_id AS query_id, nv AS qnv FROM nvt WHERE vec_id < {N_QUERIES}),
qres AS (
    SELECT p.query_id, p.cent_id,
           [p.qv[i]/p.qn - nc.ncv[i] for i in range(1, {EMB_DIM + 1})] AS qr
    FROM (
        SELECT vec_id AS query_id, v AS qv, norm AS qn, cent_id FROM (
            SELECT e.vec_id, e.v, e.norm, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {DOT_SQL.format(a="e.v", b="c.cv")} / (e.norm * c.cn) DESC,
                                c.cent_id) AS crank
            FROM e CROSS JOIN c
            WHERE e.vec_id < {N_QUERIES}
        ) WHERE crank <= {IVF_NPROBE}
    ) p JOIN nc ON nc.cent_id = p.cent_id
),
adc AS MATERIALIZED (SELECT p.query_id, p.cent_id, c.m, c.code,
          CAST(0 AS DOUBLE) + {adc_terms} AS t
        FROM qres p JOIN cent c ON c.cent_id = p.cent_id),
b AS MATERIALIZED (SELECT vec_id, cent_id, c0, c1, c2, c3 FROM codes),
scored AS (
  SELECT a0.query_id, b.vec_id,
         round(CAST(0 AS DOUBLE) + {" + ".join(f"a{m}.t" for m in range(PQ_M))}, 6) AS adc
  FROM b
  {joins}
  WHERE b.vec_id <> a0.query_id
),
local AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id, vec_id % {PQ_TOPK_BUCKETS}
        ORDER BY adc, vec_id) AS lr
    FROM scored) WHERE lr <= {PQ_SHORTLIST_SQL}),
short AS (SELECT query_id, vec_id, adc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc, vec_id) AS sr
    FROM local) WHERE sr <= {PQ_SHORTLIST_SQL}),
rer AS (SELECT s.query_id, s.vec_id,
          round({DOT_SQL.format(a="qq.qnv", b="nvt.nv")}, 6) AS cosine,
          s.adc
        FROM short s
        JOIN nvt ON nvt.vec_id = s.vec_id
        JOIN q qq ON qq.query_id = s.query_id)
SELECT query_id, vec_id, cosine, adc, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM rer)
WHERE rank <= {TOP_K}
"""


TOPK_IVFPQ_ORACLE = _topk_ivfpq_oracle()


FIXED_IVFPQ_BOOKS_FNAME = f"ivfpqfix_res_m{PQ_M}_K{IVF_K}.parquet"
FIXED_IVFPQ_CENTS_FNAME = f"ivfpqfix_cents_K{IVF_K}.parquet"
FIXED_IVFPQ_CODES_FNAME = f"bylist_codes_ivfpqfix_m{PQ_M}_K{IVF_K}.parquet"
FIXED_IVFPQ_FLAT_CODES_FNAME = f"codes_ivfpqfix_m{PQ_M}_K{IVF_K}.parquet"
FIXED_IVFPQ_RAW_FNAME = f"bylist_raw_ivfpqfix_K{IVF_K}.parquet"


def _fixed_ivfpq_books_rows(
    base: DataFrame,
) -> "list[tuple[int, int, int, list[float]]]":
    """The per-list sign-orthant RESIDUAL codebooks as driver-side rows
    ``[(cent_id, m, code, cd)]`` — ``topk_ivfpq``'s in-plan cb/cent
    stages restated over the (vec_id, cent_id, r) relation and collected
    model-sized (<= K * M * 2^8 rows x 16 doubles). Same exact
    fixed-point arithmetic as ``_fixed_books_rows`` (the flat twin):
    ``float(bigint_sum) / float(bigint_n) / 1e9`` is the identical IEEE
    double sequence to Spark's ``cast(s as double) / n / 1e9``, so the
    persisted artifact is bit-identical to the in-plan aggregation the
    ``topk_ivfpq`` oracle verifies, and DuckDB reproduces it verbatim."""
    codes = base.select(
        "cent_id",
        "r",
        *[_pq_code(F.col("r"), m).alias(f"c{m}") for m in range(PQ_M)],
    )
    subs = codes.select(
        "cent_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.col(f"c{m}").alias("code"),
                        F.slice("r", m * PQ_SUB + 1, PQ_SUB).alias("sub"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("cent_id", "s.m", "s.code", "s.sub")
    cb = subs.groupBy("cent_id", "m", "code").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.expr(f"cast(floor(element_at(sub, {d}) * 1e9 + 0.5D) as bigint)")
            ).alias(f"s{d}")
            for d in range(1, PQ_SUB + 1)
        ],
    )
    out = []
    for r in cb.collect():  # model-sized: <= K * M * 256 rows
        cd = [float(r[f"s{d}"]) / float(r["n"]) / 1e9 for d in range(1, PQ_SUB + 1)]
        out.append((int(r["cent_id"]), int(r["m"]), int(r["code"]), cd))
    out.sort(key=lambda t: (t[0], t[1], t[2]))
    return out


def _adc_arrays_np_keyed(
    qrs: "list[list[float]]",
    list_ids: "list[int]",
    rows: "list[tuple[int, int, int, list[float]]]",
    m_subspaces: int,
    sub: int,
):
    """``_adc_arrays_np`` under PER-LIST books: row g's lookup arrays are
    computed against the codebook of the list it probes (``list_ids[g]``),
    with the identical ascending-d accumulation order, so every entry is
    bit-identical to the JVM adc-join formulation it replaces. Cells a
    list's book never emitted are +inf (same pad semantics — an asc
    shortlist can never surface them; here every scanned candidate's
    code exists in its own list's book by construction, because book
    cells are means of that list's occupants)."""
    import numpy as np

    k = 256
    books: "dict[int, object]" = {}
    for cid, m, code, cd in rows:
        b = books.get(cid)
        if b is None:
            b = books[cid] = np.full((m_subspaces, k, sub), np.inf, dtype=np.float64)
        b[m, code] = cd
    x = np.asarray(qrs, dtype=np.float64)
    bmat = np.stack([books[cid] for cid in list_ids])  # (G, M, 256, sub)
    out = []
    for m in range(m_subspaces):
        acc = np.zeros((len(list_ids), k), dtype=np.float64)
        for d in range(sub):
            diff = x[:, m * sub + d][:, None] - bmat[:, m, :, d]
            acc = acc + diff * diff
        out.append(acc)
    return out


def topk_ivfpq_fixed(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Residual IVF-PQ served entirely through the BY-LIST ARTIFACT +
    COST-RULE machinery — the deterministic serving twin that makes the
    round-15 pruning layer driver-hash-verifiable (VERDICT r15 order 1,
    the ``topk_pq_fixed`` pattern applied to the IVF-PQ composition).

    Same ARITHMETIC as ``topk_ivfpq`` (fixed K=16 coarse centroids =
    corpus rows [100,116), per-list sign-orthant residual books with
    exact fixed-point means, nprobe=8, max(50, n/10) shortlist — all
    hash-verified against DuckDB since round 10); same SERVING PLAN as
    ``topk_ivfpq_trained`` (hive-partitioned codes + raw artifacts via
    ``ann_index.cached_relation(partition_by="cent_id")``, driver-known
    probe-union directory pruning, the ``_bylist_raw_source`` cost-based
    re-rank branch over ``relation_paths``/``pruned_bytes``/
    ``column_bytes``, driver-built per-(query, probed-list) ADC lookup
    arrays, ``_ivfpq_scan_rank``). The combination is the point: every
    artifact and every driver-side decision this path makes is a pure
    function of the corpus, so the FULL by-list machinery — partition
    layout, pruned scans, byte arithmetic, branch flip — lands under the
    driver's value hash, where the k-means-trained path can only
    rows-check. Output is bit-identical to ``topk_ivfpq`` (suite-pinned),
    so the oracle IS ``TOPK_IVFPQ_ORACLE``, and both cost branches are
    forced output-invariant by tests/test_similarity_pq.py.

    Append lineages are NOT modeled here (books/codes derive from the
    live corpus): the append contract's hash coverage lives in
    ``ann_append_serving_fixed``; this twin exists to pin the by-list
    serving layer, one contract per twin."""
    import math

    from mapreduce_hadoop_spark.operators import ann_index

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    cents = _ivf_centroids(emb)
    ncents = cents.select("cent_id", _div_by("cv", "cn").alias("ncv"))

    def residuals(src: DataFrame) -> DataFrame:
        return (
            _assign(src, cents, 1, "cent_id")
            .join(F.broadcast(ncents), "cent_id")
            .select(
                "vec_id",
                "cent_id",
                F.zip_with(
                    _div_by("v", "norm"), F.col("ncv"), lambda a, b: a - b
                ).alias("r"),
            )
        )

    rows = ann_index.fixed_model(
        sf_dir,
        FIXED_IVFPQ_BOOKS_FNAME,
        ["cent_id", "m", "code", "cd"],
        lambda: _fixed_ivfpq_books_rows(residuals(emb)),
        frozen_base=False,
    )
    rows = [(int(c), int(m), int(code), list(cd)) for c, m, code, cd in rows]

    # The FAISS ``add`` half, by-list (round 15): codes AND a raw serving
    # copy hive-partitioned by coarse list, both pruned to the probe
    # union at read time — identical artifact layer to the trained path.
    def open_bylist_codes() -> DataFrame:
        return ann_index.cached_relation(
            spark,
            sf_dir,
            FIXED_IVFPQ_CODES_FNAME,
            lambda: residuals(emb).select(
                "vec_id",
                *[_pq_code(F.col("r"), m).alias(f"c{m}") for m in range(PQ_M)],
                "cent_id",
            ),
            partition_by="cent_id",
        )

    def open_bylist_raw() -> DataFrame:
        return ann_index.cached_relation(
            spark,
            sf_dir,
            FIXED_IVFPQ_RAW_FNAME,
            lambda: _assign(emb, cents, 1, "cent_id").select(
                "vec_id", "v", "cent_id"
            ),
            partition_by="cent_id",
        )

    # Query side, DRIVER-BUILT like the trained path — probe selection,
    # per-list query residuals, and ADC arrays replicate the JVM folds
    # term for term with STRICT sequential arithmetic (_strict_dot), so
    # the probes match `_assign(..., nprobe)`'s (ccos DESC, cent_id)
    # ranking bit-for-bit and DuckDB reproduces every value.
    crows = ann_index.fixed_model(
        sf_dir,
        FIXED_IVFPQ_CENTS_FNAME,
        ["cent_id", "cv"],
        lambda: sorted(
            (int(r["cent_id"]), [float(x) for x in r["cv"]])
            for r in cents.select("cent_id", "cv").collect()  # K=16 rows
        ),
        frozen_base=False,
    )
    crows = [(int(cid), list(cv)) for cid, cv in crows]
    cn = {cid: math.sqrt(_strict_dot(cv, cv)) for cid, cv in crows}
    ncv = {cid: [x / cn[cid] for x in cv] for cid, cv in crows}
    qv_rows = ann_index.query_vectors(emb, sf_dir, N_QUERIES)
    qnv_rows = _query_nv_rows(emb, sf_dir)
    probe_lists = []
    for qid, v in qv_rows:
        qn = math.sqrt(_strict_dot(v, v))
        scored = sorted(
            (-(_strict_dot(v, cv) / (qn * cn[cid])), cid) for cid, cv in crows
        )
        probe_lists.append([cid for _neg, cid in scored[:nprobe]])
    keys: "list[tuple]" = []
    qrs: "list[list[float]]" = []
    for (qid, nv), plist in zip(qnv_rows, probe_lists):
        for cid in plist:
            keys.append((qid, cid))
            qrs.append([a - b for a, b in zip(nv, ncv[cid])])
    adc = _adc_arrays_np_keyed(qrs, [cid for _q, cid in keys], rows, PQ_M, PQ_SUB)
    qarr = _local_qarr_df(
        spark,
        [("query_id", "long"), ("cent_id", "int")],
        keys,
        qrs,
        [],
        PQ_M,
        PQ_SUB,
        adc=adc,
    )

    probed = sorted({int(c) for pl in probe_lists for c in pl})
    pruned = _bylist_codes_source(
        spark,
        sf_dir,
        open_bylist_codes,
        FIXED_IVFPQ_CODES_FNAME,
        FIXED_IVFPQ_FLAT_CODES_FNAME,
        probed,
        PQ_M,
    )
    raw = _bylist_raw_source(
        emb, open_bylist_raw, sf_dir, FIXED_IVFPQ_RAW_FNAME, probed
    )
    q = spark.createDataFrame(qnv_rows, "query_id long, qnv array<double>")
    return _ivfpq_scan_rank(
        pruned,
        qarr,
        raw,
        q,
        _pq_shortlist(n),
        m_subspaces=PQ_M,
        candidates_per_query=n,
        persist_codes=False,
    )


def topk_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ under the TRAINED coarse quantizer at K = sqrt(n)
    lists — the deployed serving form: k-means centroids drop into the
    identical ``_ivfpq_from`` plan, and the list count grows with the
    corpus so the candidate fraction per query (nprobe/K ~ nprobe/sqrt(n))
    SHRINKS as data grows — the FAISS nlist recipe, vs the fixed K=16
    whose fraction is constant. Measured recall@5 as shipped (nprobe =
    max(8, K//3), scale-adaptive shortlist): 0.76 / 0.74 / 0.84 at
    sf0.001 / sf0.01 / sf0.1, vs the fixed-K twin's 0.78 / 0.72 / 0.72 —
    at sf0.1 that is +0.12 recall while scanning 36% of the corpus
    instead of 51% (K=44 vs 16), strictly better on both axes, and the
    gap widens with n as nprobe/sqrt(n) falls.

    Round 11: the residual codebooks are now ONE GLOBAL Lloyd-TRAINED
    book (``_ivfpq_from(trained_books=True)``): flat in K (removes the
    round-10 per-list ~8 GB-at-K=65536 caveat), persisted as an index
    artifact alongside the coarse centroids (the FAISS train/add split —
    a warm session plans ZERO training jobs), and with distortion that
    falls as data fills the cells, which is what lets the exact re-rank
    shortlist drop from the sign-orthant stopgap's n/10 to the
    near-constant max(50, n/100) (``_pq_trained_shortlist``).

    K-means training is not SQL-expressible -> rows-only driver check;
    recall is bounded against brute force in tests/test_similarity_pq.py,
    and the fixed-centroid ``topk_ivfpq`` is the hash-verified oracle twin
    of the plan shape.
    """
    import math

    from mapreduce_hadoop_spark.operators import ann_index

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    n = _emb_count(emb, sf_dir)
    # K (list count) is fixed at TRAIN time — the FAISS nlist contract:
    # under an append lineage the frozen base quantizer keeps serving,
    # so K derives from the snapshot it was trained on.
    import numpy as np

    k = max(IVF_K, math.isqrt(ann_index.model_corpus_count(emb, sf_dir)))
    nprobe = max(IVF_NPROBE, k // 3)
    cents = _trained_centroids(spark, emb, sf_dir, k=k)
    cents_rows = ann_index.coarse_centroids(spark, emb, sf_dir, k)

    # Round 13 (VERDICT r12 order 3): both serving dials ADAPT to the
    # query/quantizer geometry instead of sitting on constants that were
    # right only for organic data — fixed nprobe=K/3 with the base
    # shortlist read recall 0.54 on the clustered n=20k crossover corpus
    # (vs 1.00 organic). Probe width: the SPANN closeness rule, query
    # side (_probe_lists_adaptive — boundary queries widen their own
    # probe set). Shortlist: scaled by the SQUARE of the measured
    # width/floor ratio, the free clusteredness signal (see the
    # IVFPQ_PROBE_EPS block for the measured grid). Everything here is
    # driver-side arithmetic over artifact-backed, request-sized
    # relations — a warm query still plans zero query-side Spark jobs.
    qv_rows = ann_index.query_vectors(emb, sf_dir, N_QUERIES)
    xq = np.asarray([v for _, v in qv_rows], dtype=np.float64)
    widths = [
        len(p)
        for p in _probe_lists_adaptive(xq, cents_rows, nprobe, IVFPQ_PROBE_EPS, k)
    ]
    ratio = (sum(widths) / len(widths)) / min(nprobe, k)
    base_shortlist = _pq_trained_ivf_shortlist(n)
    shortlist = min(
        int(base_shortlist * ratio * ratio),
        max(base_shortlist, n // PQ_SHORTLIST_DIV),
    )

    return _ivfpq_from(
        emb,
        cents,
        nprobe,
        shortlist,
        spark=spark,
        sf_dir=sf_dir,
        trained_books=True,
        # Driver-side centroids (memoized/persisted) let assignment run
        # as the Arrow matmul instead of the n x K crossJoin + window.
        cents_rows=cents_rows,
        candidates_per_query=n,
        probe_eps=IVFPQ_PROBE_EPS,
        nprobe_max=k,
    )
