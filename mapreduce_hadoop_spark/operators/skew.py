"""Hot-key (skewed) join mitigation: salted replicated join.

AQE's skew-join handling (on in session.py) splits oversized sort-merge
partitions automatically, but only helps joins it can see are skewed at
runtime. This utility is the explicit form for joins *known* to have hot
keys (the power-law reality of user/document keys in training-data
pipelines): the fact side gets a per-row salt in [0, n); the (small but
not broadcastable) dim side is replicated n times; the join key becomes
(key, salt), spreading each hot key over n tasks. Result is exactly the
plain join — pinned by an equivalence test.

Cost model: dim side inflates n-fold — pick n ~ (hot-key rows / target
rows per task); for a dim too large to replicate, split it instead (salt
only the hot keys, plain-join the rest, union).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    row_id: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with ``n_salts``-way salting.

    ``row_id`` is any fact column (or expression) with per-row variation —
    its hash spreads rows of one hot key uniformly over the salt domain
    deterministically (no rand(): retries and tests stay stable).
    """
    row_id = F.col(row_id) if isinstance(row_id, str) else row_id
    f = fact.withColumn("_salt", F.pmod(F.hash(row_id), F.lit(n_salts)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
