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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sort-bucketed) managed table.

    Bucketing pre-shuffles the data ONCE at write time: two tables bucketed
    on the same key with the same bucket count join with NO Exchange on
    either side — the join that at 100 TB would shuffle terabytes per query
    instead reads co-located buckets. Same for groupBy on the bucket key.
    Sorted buckets additionally let sort-merge join skip its sort.
    (Bucketed tables must be managed tables — `saveAsTable`, not `parquet(path)`.)
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table, format="parquet")


def materialize_media(docs: DataFrame, path: str, kinds: tuple = ("image", "audio")) -> None:
    """Encode the deterministic media fixture ONCE and persist it as parquet
    partitioned by ``kind`` — the lake layout a real multimodal corpus has
    (payload bytes landed by ingest, never re-encoded per query). Readers
    (`spark.read.parquet(path).where(kind = ...)`) get partition pruning on
    the modality, and every downstream decode/feature query pays only the
    decode — which is the operator under test, and the only cost that
    exists at 100 TB where media arrives already encoded."""
    from fdi_flow_spark.pipelines.multimodal import media_from_documents

    (
        media_from_documents(docs, encode_payloads=True, kinds=kinds)
        .write.mode("overwrite")
        .partitionBy("kind")
        .parquet(path)
    )
