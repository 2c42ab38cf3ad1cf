"""Sources: parquet testdata loaders and the events->series derivation.

The driver testdata (`TESTDATA.md`) is one parquet per table under
``/root/testdata/sf*/``. The reference engine reads CSV with a header and a
column pick (reference ``forecasting/time_series_model.py:107-109``);
:func:`read_csv_series` is that ingress re-expressed as a Spark scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless read
    # as a long. Runtime-settable, so this also covers externally-created
    # sessions (the driver builds its own SparkSession for entry()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical long series frame derived from the ``events`` table.

    series_id = event_type, ts = dense 0-based index ordered by
    (event timestamp, event_id) — event_id breaks timestamp ties so the
    ordering (and therefore every windowed result) is deterministic and
    matches the DuckDB oracle's ROW_NUMBER on the same keys.
    """
    ev = load_table(spark, sf_dir, "events")
    # Rename BEFORE the window so the output partitioning attribute
    # (series_id) survives into downstream operators — aliasing the
    # partition column after the fact drops hashpartitioning(event_type)
    # at the next projection and forces a second Exchange per chained op.
    renamed = ev.select(
        F.col("event_type").alias("series_id"),
        F.col("ts").alias("_event_ts"),
        F.col("event_id"),
        F.col("value").cast("double").alias("value"),
    )
    w = Window.partitionBy("series_id").orderBy("_event_ts", "event_id")
    return renamed.select(
        "series_id",
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("ts"),
        "value",
    )


# Shared SQL snippet for oracles: the same derivation in ANSI SQL (DuckDB).
EVENTS_SERIES_SQL = """
SELECT event_type AS series_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS BIGINT) AS ts,
       CAST(value AS DOUBLE) AS value
FROM events
"""


def read_csv_series(
    spark: SparkSession, path: str, value_col: str = "y", stride: int = 1
) -> DataFrame:
    """CSV ingress matching the reference's forecasting loader semantics:
    header row, pick one column, optional ``[::stride]`` downsample
    (reference ``time_series_model.py:107-109`` uses stride=200).

    The file name becomes the series_id; row order inside one CSV file is
    preserved by reading with a monotonically increasing id per file.
    """
    df = spark.read.option("header", "true").csv(path)
    df = df.withColumn("_file", F.input_file_name()).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("_file").orderBy("_seq")
    out = df.select(
        F.col("_file").alias("series_id"),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    if stride > 1:
        out = out.where(F.col("ts") % stride == 0).withColumn(
            "ts", (F.col("ts") / stride).cast("long")
        )
    return out
