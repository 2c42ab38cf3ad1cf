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
