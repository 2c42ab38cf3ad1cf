"""Parallelism hygiene for compute-heavy narrow stages.

A parquet scan parallelizes at row-group granularity, so a table written as
one fat row group (or a handful of small files) arrives as ~1 input split —
and every narrow op downstream (shingle explosion, per-doc scoring, Arrow
kernels) runs on one core no matter how wide the cluster is. The compute-
heavy pipelines guard against that with ``ensure_min_parallelism``: when —
and only when — the incoming partition count is below the cluster's default
parallelism, fan out with one cheap pre-explosion shuffle (the raw rows,
not the exploded data). On healthy layouts (100 TB = thousands of splits)
the check is true a priori and the call is a no-op — it never adds a
shuffle to data that is already spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` up to ``sparkContext.defaultParallelism`` iff its
    current partition count is lower. Optional ``cols`` hash-partition by key
    (lets a later groupBy on the same key reuse the exchange); otherwise
    round-robin."""
    if df.isStreaming:
        # no .rdd on a stream; micro-batch parallelism is the source's
        # (maxFilesPerTrigger / partition count), repartitioning adds a
        # per-batch shuffle for nothing
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def local_df(spark, rows, schema) -> DataFrame:
    """Small driver-side relation (model tables, probe lists, index
    metadata) as a SINGLE-partition DataFrame.

    ``spark.createDataFrame(list, ...)`` parallelizes the pickled rows into
    ``defaultParallelism`` slices; each slice is computed through its own
    Python-worker round trip (~150 ms), so ANY single-task action over it —
    a ``coalesce(1)`` metadata write, a broadcast-exchange build — pays
    32 sequential round trips on local[32]: ~5 s to write one row (measured;
    the IVF-PQ index build spent 15 of its 20 s in three such writes). One
    slice = one round trip, identical row/schema semantics. On a real
    cluster the same waste shows up as 1000 no-op tasks for a 10-row table.
    Empty ``rows`` stays on the plain path (nothing to compute).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
