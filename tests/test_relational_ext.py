"""Extended relational operators: sketch error bound + as-of edge cases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce_hadoop_spark.operators.relational_ext import (
    approx_distinct_users_daily,
    distinct_users_daily,
)


def test_approx_distinct_within_error_bound(spark, sf_dir):
    exact = {r["day"]: r["n_users"] for r in distinct_users_daily(spark, sf_dir).collect()}
    approx = {
        r["day"]: r["n_users_approx"]
        for r in approx_distinct_users_daily(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.1 * n), (day, n, approx[day])


def test_asof_semantics_inclusive_and_null(spark):
    # Hand fixture: order at exactly an event's timestamp picks that event
    # (at-or-before is inclusive); an order before any event gets null.
    from mapreduce_hadoop_spark.operators.relational_ext import orders_asof_events

    ev = spark.createDataFrame(
        [
            (0, datetime.datetime(2024, 1, 2), 7, "click", 1.0, "{}"),
            (1, datetime.datetime(2024, 1, 5), 7, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orders = spark.createDataFrame(
        [
            (100, 7, "O", 1.0, datetime.datetime(2024, 1, 1), "P"),  # before all
            (101, 7, "O", 1.0, datetime.datetime(2024, 1, 2), "P"),  # exact tie
            (102, 7, "O", 1.0, datetime.datetime(2024, 1, 9), "P"),  # after all
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    orders.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {
        r["o_orderkey"]: r["last_event_id"]
        for r in orders_asof_events(spark, d).collect()
    }
    assert got == {100: None, 101: 0, 102: 1}
