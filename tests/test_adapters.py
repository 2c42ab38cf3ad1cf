import numpy as np

from fdi_flow_spark.core.series import long_to_wide, wide_to_long

from .conftest import make_long


def test_wide_long_roundtrip(spark):
    rows = [(i, float(np.sin(i)), float(2 * i)) for i in range(30)]
    wide = spark.createDataFrame(rows, schema="t long, sensor1 double, sensor2 double")
    long_df = wide_to_long(wide, ts_col="t")
    assert set(long_df.columns) == {"series_id", "ts", "value"}
    assert long_df.count() == 60
    back = long_to_wide(long_df).orderBy("ts").toPandas()
    np.testing.assert_allclose(back["sensor1"], [r[1] for r in rows], rtol=1e-12)
    np.testing.assert_allclose(back["sensor2"], [r[2] for r in rows], rtol=1e-12)


def test_wide_to_long_subset_columns(spark):
    wide = spark.createDataFrame(
        [(0, 1.0, 2.0, "x")], schema="t long, a double, b double, note string"
    )
    out = wide_to_long(wide, ts_col="t", value_cols=["a", "b"])
    got = {(r.series_id, r.value) for r in out.collect()}
    assert got == {("a", 1.0), ("b", 2.0)}


def test_long_to_wide_pivot(spark):
    long_df = make_long(spark, {"s1": np.arange(5.0), "s2": np.arange(5.0) * 2})
    wide = long_to_wide(long_df).orderBy("ts").toPandas()
    assert list(wide.columns) == ["ts", "s1", "s2"]
    np.testing.assert_allclose(wide["s2"], np.arange(5.0) * 2)


def test_write_series_partitioned_roundtrip(spark, tmp_path):
    from fdi_flow_spark.sources.sinks import write_series

    df = make_long(spark, {"a": np.arange(20.0), "b": np.arange(20.0) * 3})
    path = str(tmp_path / "series_out")
    write_series(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 40
    # partition pruning: reading one series touches one partition directory
    only_a = back.where("series_id = 'a'")
    assert only_a.count() == 20
    vals = {r.ts: r.value for r in only_a.collect()}
    assert vals[7] == 7.0


def test_salted_agg_matches_direct(spark):
    from fdi_flow_spark.core.skew import salted_agg

    rng = np.random.default_rng(21)
    # skewed: 90% of rows share one key
    rows = [("hot" if i % 10 else f"k{i%7}", float(rng.normal(0, 1)), i) for i in range(5000)]
    df = spark.createDataFrame(rows, schema="k string, v double, i long")
    got = {
        r.k: (round(r.total, 6), r.cnt, round(r.mean, 6), r.lo)
        for r in salted_agg(
            df, ["k"], [("sum", "v", "total"), ("count", "v", "cnt"), ("avg", "v", "mean"), ("min", "i", "lo")]
        ).collect()
    }
    from pyspark.sql import functions as F

    exp = {
        r.k: (round(r.total, 6), r.cnt, round(r.mean, 6), r.lo)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("cnt"),
            F.avg("v").alias("mean"),
            F.min("i").alias("lo"),
        )
        .collect()
    }
    assert got == exp


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange operators — the co-located join contract write_bucketed exists
    to provide."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from fdi_flow_spark.sources.sinks import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    try:
        write_bucketed(left, "bk_left", ["k"], n_buckets=8, sort_cols=["k"])
        write_bucketed(right, "bk_right", ["k"], n_buckets=8, sort_cols=["k"])
        # disable broadcast so the shuffle-avoidance claim is actually
        # exercised (a broadcast join would sidestep bucketing entirely)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
            assert joined.count() == 1000
            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_local_df_single_slice_and_semantics(spark):
    """r10: small driver-side relations must land on ONE slice — a
    defaultParallelism-sliced pickled relation pays one sequential
    Python-worker round trip per slice inside any single-task action
    (measured ~5 s to write one row on local[32])."""
    from fdi_flow_spark.core.partitioning import local_df

    df = local_df(spark, [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
                  "cell long, centroid array<double>")
    assert df.rdd.getNumPartitions() == 1
    assert df.schema.simpleString() == "struct<cell:bigint,centroid:array<double>>"
    assert sorted(map(tuple, df.collect())) == [(1, [1.0, 2.0]), (2, [3.0, 4.0])]
    empty = local_df(spark, [], "cell long")
    assert empty.count() == 0 and empty.columns == ["cell"]
