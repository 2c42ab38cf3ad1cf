"""Sinks. The reference writes nothing (plots only); a Spark engine's native
sink is partitioned parquet. These helpers encode the layout conventions the
operators assume downstream (partition by series for co-located reads, sorted
within files for windowed scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_series(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | None = "series_id",
    sort_within: bool = True,
) -> None:
    """Write a long-format series frame as partitioned parquet.

    Partitioning by ``series_id`` gives partition pruning for per-series
    reads; sorting within partitions by ``ts`` keeps windowed rescans
    spill-free. For very high series cardinality pass ``partition_by=None``
    (millions of tiny directories is the classic small-files failure) and
    rely on bucketing at the table level instead.
    """
    out = df
    if sort_within and "ts" in df.columns:
        cols = ([partition_by] if partition_by else []) + ["ts"]
        out = df.sortWithinPartitions(*cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)
