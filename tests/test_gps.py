"""Cross-engine determinism of the derived GPS views and cleanse pipeline."""

from __future__ import annotations

from mapreduce_hadoop_spark.operators import gps, segments


def _cmp(spark_df, duck, sql, key_cols, val_cols, tol=0.0):
    sdf = spark_df.toPandas().sort_values(key_cols).reset_index(drop=True)
    odf = duck.execute(sql).df().sort_values(key_cols).reset_index(drop=True)
    assert len(sdf) == len(odf)
    for c in val_cols:
        a, b = sdf[c], odf[c]
        if a.dtype.kind == "f":
            diff = (a - b).abs().max()
            assert diff <= tol, f"{c}: max abs diff {diff}"
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_positions_bit_identical(spark, sf_dir, duck):
    _cmp(
        gps.positions(spark, sf_dir),
        duck,
        gps.POSITIONS_SQL,
        ["event_id"],
        ["taxi", "t", "lat", "lon", "status"],
        tol=0.0,  # bit-exact: IEEE +,*,/,floor only
    )


def test_trip_endpoints_bit_identical(spark, sf_dir, duck):
    _cmp(
        gps.trip_endpoints(spark, sf_dir),
        duck,
        gps.TRIP_ENDPOINTS_SQL,
        ["event_id"],
        ["start_lat", "start_lon", "stop_lat", "stop_lon"],
        tol=0.0,
    )


def test_clean_positions_matches_oracle(spark, sf_dir, duck):
    sdf = segments.clean_positions_query(spark, sf_dir).toPandas()
    odf = duck.execute(segments.ORACLE_SQL).df()
    key = ["taxi", "t", "lat", "lon", "status"]
    a = sdf.sort_values(key).reset_index(drop=True)
    b = odf.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a[key].values == b[key].values).all()
