"""Batch ≡ streaming equivalence for the stateful operators: feed the same
series through applyInPandasWithState in forced micro-batches
(maxFilesPerTrigger=1) and through the batch operators; results must match
bit-for-bit (the recurrence state is carried exactly)."""

import shutil
import tempfile

import numpy as np
import pytest

from fdi_flow_spark.operators import exponential_smoothing, kalman_filter_1d
from fdi_flow_spark.streaming import streaming_ewma, streaming_kalman_1d

from .conftest import make_long


@pytest.fixture()
def chunked_stream_dir(spark):
    """Two ordered parquet chunks of a 2-series frame; yields (dir, batch_df)."""
    rng = np.random.default_rng(9)
    series = {
        "a": rng.normal(0, 1, 40),
        "b": np.linspace(0, 5, 40) + rng.normal(0, 0.2, 40),
    }
    df = make_long(spark, series)
    d = tempfile.mkdtemp(prefix="fdi_stream_")
    df.where("ts < 20").coalesce(1).write.parquet(f"{d}/batch=0")
    df.where("ts >= 20").coalesce(1).write.parquet(f"{d}/batch=1")
    yield d, df
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, src_dir, op):
    stream = (
        spark.readStream.schema("series_id string, ts long, value double, batch int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = op(stream.select("series_id", "ts", "value"))
    q = (
        out.writeStream.format("memory")
        .queryName("sink_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("sink_tbl").toPandas().sort_values(["series_id", "ts"])


def _as_map(pdf):
    return {
        sid: g["value"].to_numpy() for sid, g in pdf.groupby("series_id")
    }


def test_streaming_ewma_equals_batch(spark, chunked_stream_dir):
    d, batch_df = chunked_stream_dir
    got = _as_map(_run_stream(spark, d, lambda s: streaming_ewma(s, alpha=0.3)))
    expected = (
        exponential_smoothing(batch_df, alpha=0.3)
        .toPandas()
        .sort_values(["series_id", "ts"])
    )
    exp = _as_map(expected)
    for sid in exp:
        np.testing.assert_array_equal(got[sid], exp[sid])
    spark.catalog.dropTempView("sink_tbl")


def test_streaming_kalman_equals_batch(spark, chunked_stream_dir):
    d, batch_df = chunked_stream_dir
    got = _as_map(
        _run_stream(spark, d, lambda s: streaming_kalman_1d(s, q=0.5, r=2.0))
    )
    exp = _as_map(
        kalman_filter_1d(batch_df, q=0.5, r=2.0)
        .toPandas()
        .sort_values(["series_id", "ts"])
    )
    for sid in exp:
        np.testing.assert_array_equal(got[sid], exp[sid])
    spark.catalog.dropTempView("sink_tbl")


def test_streaming_observer_equals_batch(spark):
    import shutil
    import tempfile

    from fdi_flow_spark.models import LinearContinuousStateSpaceModel
    from fdi_flow_spark.observers import LuenbergerObserver, observer_replay
    from fdi_flow_spark.streaming import streaming_observer

    A = np.array([[-2.0, 1.0], [1.0, -1.0]])
    B = np.array([[-1.0], [1.0]])
    C = np.array([[1.0, 0.0]])
    dt, n = 0.1, 60
    m = LinearContinuousStateSpaceModel(A, B, C, [[0.0]])
    u = np.array([[10 * np.sin(2 * np.pi * i * dt) * dt] for i in range(n)])
    truth = m.simulate(u, [2.0, 3.0], n * dt, dt, method="euler")
    rows = [
        ("sys1", i, [float(u[i, 0])], [float(truth["outputs"][i, 0])]) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, schema="series_id string, step long, u array<double>, y array<double>"
    )
    factory = lambda: LuenbergerObserver(A, B, C, dt, desired_poles=[-3.0, -4.0])  # noqa: E731

    d = tempfile.mkdtemp(prefix="fdi_obs_stream_")
    try:
        df.where("step < 30").coalesce(1).write.parquet(f"{d}/b=0")
        df.where("step >= 30").coalesce(1).write.parquet(f"{d}/b=1")
        stream = (
            spark.readStream.schema(
                "series_id string, step long, u array<double>, y array<double>, b int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = streaming_observer(
            stream.select("series_id", "step", "u", "y"), factory
        )
        q = (
            out.writeStream.format("memory")
            .queryName("obs_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("obs_sink").toPandas().sort_values("step")
        exp = observer_replay(df, factory).toPandas().sort_values("step")
        for g, e in zip(got["x_hat"], exp["x_hat"]):
            np.testing.assert_array_equal(np.array(g), np.array(e))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.dropTempView("obs_sink")
