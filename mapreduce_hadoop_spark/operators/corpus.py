"""End-to-end corpus cleaning — the training-data pipeline, composed.

One DAG chaining the north-star operator families the way a real
LLM-data pipeline does: quality gate -> exact dedup -> near-dup removal ->
per-source corpus stats. Each stage is the already-oracle-checked operator
reused as-is; this query pins their *composition* (semi/anti-join
plumbing included) against a DuckDB twin of the whole pipeline.

Scale shape: the quality gate is a narrow scan-time filter; exact dedup is
one shuffle on the text hash; near-dup removal reuses MinHash-LSH (shuffle
on band keys, never all-pairs) and drops the larger doc_id of every
verified pair (greedy, deterministic — at 100 TB you'd union-find the pair
graph in O(pairs), which stays tiny relative to the corpus); the stats are
a partial-agg groupBy. No driver-side loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hadoop_spark.functions.hashing import md5_long, md5_long_sql
from mapreduce_hadoop_spark.operators import dedup, textops
from mapreduce_hadoop_spark.sources.tables import load_table

QUALITY_MIN = 0.5


def clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, quality, n_tokens) of the surviving corpus:
    quality >= 0.5, exact dups and near-dups removed, smaller doc_id
    survives. The pipeline's document-level output — ``corpus_clean_stats``
    aggregates it, the CLI ``corpus-clean`` job writes it."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    quality = textops.quality_score(spark, sf_dir).select(
        "doc_id", "quality", "n_tokens"
    )
    texth = load_table(spark, sf_dir, "documents").select(
        "doc_id", md5_long(F.col("text")).alias("h")
    )
    exact_keep = texth.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_ok = (
        texth.join(exact_keep, "h")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id")
    )
    near_dups = dedup.minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    return (
        docs.join(quality, "doc_id")
        .filter(F.col("quality") >= F.lit(QUALITY_MIN))
        .join(exact_ok, "doc_id", "left_semi")
        .join(near_dups, "doc_id", "left_anti")
    )


def corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stats of the cleaned corpus (quality >= 0.5, exact dups
    and near-dups removed, smaller doc_id survives)."""
    clean = clean_docs(spark, sf_dir)
    # Fixed-point average: quality is quantized to nano BIGINTs and summed
    # as integers (order-independent, exact), then 6-dp HALF_UP is pure
    # integer arithmetic — round(p/q) = (p + q/2) div q on non-negative
    # values with q = 1000 * n_docs. A double avg() depends on the
    # partial-merge order and flips round(.., 6) at half-boundaries
    # run-to-run; this cannot. The oracle quantizes identically.
    return (
        clean.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.expr("cast(round(quality * 1e9) as bigint)")).alias("q_nano"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(
                "((q_nano + 500 * n_docs) div (1000 * n_docs)) / 1e6"
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


CORPUS_CLEAN_ORACLE = f"""
WITH pairs AS (
    SELECT * FROM ({dedup.MINHASH_LSH_ORACLE})
),
quality AS ({textops.QUALITY_ORACLE}),
texth AS (SELECT doc_id, {md5_long_sql("text")} AS h FROM documents),
exact_keep AS (SELECT h, min(doc_id) AS keep_id FROM texth GROUP BY h),
exact_ok AS (
    SELECT doc_id FROM texth JOIN exact_keep USING (h) WHERE doc_id = keep_id
),
near_dups AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
clean AS (
    SELECT d.doc_id, d.source, q.quality, q.n_tokens
    FROM documents d
    JOIN quality q ON q.doc_id = d.doc_id
    WHERE q.quality >= {QUALITY_MIN}
      AND d.doc_id IN (SELECT doc_id FROM exact_ok)
      AND d.doc_id NOT IN (SELECT doc_id FROM near_dups)
),
grouped AS (
    SELECT source,
           count(*)      AS n_docs,
           -- DuckDB integer sum() -> HUGEINT -> pandas float64; cast keeps
           -- int64 to match Spark's BIGINT sum.
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(round(quality * 1e9) AS BIGINT)) AS BIGINT) AS q_nano
    FROM clean
    GROUP BY source
)
SELECT source, n_docs, total_tokens,
       ((q_nano + 500 * n_docs) // (1000 * n_docs)) / 1e6 AS avg_quality
FROM grouped
ORDER BY source
"""


# --- domain mixing ----------------------------------------------------------

# Per-source share of the output corpus: each source is capped at 3% of
# the total, so over-represented domains are downsampled to quota and
# small domains pass through whole — the pretraining-mix rebalance. (The
# test corpus has 20 near-uniform ~5% sources, so a 3% quota actually
# binds: every source samples at rate ~0.6.)
DOMAIN_QUOTA = 0.03
_MIX_MOD = 1_000_000


def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, lang) — deterministic per-source quota sampling.

    rate_s = min(1, quota * N_total / n_s); a doc survives iff
    md5(doc_id) % 1e6 < floor(rate_s * 1e6). The sample is a pure function
    of the key (stable across engines, retries, partitionings — same
    contract as events_hash_sample), and the rate relation is
    corpus-cardinality-sized (|sources| rows), so the plan is one tiny agg
    plus a broadcast join onto a map-only filter — no shuffle of the
    corpus itself.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    totals = counts.agg(F.sum("n_s").alias("n_total"))
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(DOMAIN_QUOTA) * F.col("n_total") / F.col("n_s"),
        ).alias("rate"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            md5_long(F.col("doc_id").cast("string")) % _MIX_MOD
            < F.floor(F.col("rate") * F.lit(float(_MIX_MOD))).cast("long")
        )
        .select("doc_id", "source", "lang")
    )


DOMAIN_MIX_ORACLE = f"""
WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM c),
r AS (
    -- CAST: DuckDB bare decimal literals are DECIMAL, not DOUBLE; the
    -- rate must be the same IEEE double Spark computes.
    SELECT source,
           least(CAST(1.0 AS DOUBLE),
                 CAST({DOMAIN_QUOTA} AS DOUBLE) * n_total / n_s) AS rate
    FROM c, t
)
SELECT doc_id, d.source, lang
FROM documents d JOIN r USING (source)
WHERE ({md5_long_sql("CAST(doc_id AS VARCHAR)")}) % {_MIX_MOD}
      < CAST(floor(rate * {_MIX_MOD}.0) AS BIGINT)
"""
