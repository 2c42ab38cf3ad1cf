"""Canonical long-format series contract + wide<->long adapters.

The reference treats a 2-D array's rows (``axis=0``) or columns (``axis=1``)
as independent 1-D series (``filters.py:58-67`` in the reference); in Spark
the single canonical layout is long/tidy:

    (series_id STRING, ts LONG, value DOUBLE)

``ts`` is a dense 0-based per-series step index (the reference's implicit
positional index). The ``axis`` flag disappears — callers adapt wide frames
with :func:`wide_to_long`. Every windowed operator keys on
``PARTITION BY series_id ORDER BY ts``; sharing this exact Window spec across
chained operators lets Catalyst reuse one Exchange+Sort for all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

LONG_SCHEMA = StructType(
    [
        StructField("series_id", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
    ]
)

SERIES_ID = "series_id"
TS = "ts"
VALUE = "value"


def series_window(order_col: str = TS) -> Window:
    """The shared per-series ordered Window spec (one Exchange for all ops)."""
    return Window.partitionBy(SERIES_ID).orderBy(order_col)


def with_row_idx(df: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """Attach a dense 0-based ``row_idx`` per series.

    ``order_cols`` must be a deterministic total order within a series
    (default ``[ts]``; pass a tiebreaker column when ``ts`` can repeat).
    """
    order_cols = order_cols or [TS]
    w = Window.partitionBy(SERIES_ID).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("row_idx", F.row_number().over(w) - F.lit(1))


def wide_to_long(df: DataFrame, ts_col: str, value_cols: list[str] | None = None) -> DataFrame:
    """Wide frame ``(ts, sensor1..sensorN)`` -> long ``(series_id, ts, value)``.

    Mirrors the reference's ``axis=1`` default (columns are series). Uses
    ``stack`` so it stays a narrow projection (no shuffle).
    """
    value_cols = value_cols or [c for c in df.columns if c != ts_col]
    pairs = ", ".join(f"'{c}', cast(`{c}` as double)" for c in value_cols)
    stacked = df.selectExpr(
        f"cast(`{ts_col}` as long) as {TS}",
        f"stack({len(value_cols)}, {pairs}) as ({SERIES_ID}, {VALUE})",
    )
    return stacked.select(SERIES_ID, TS, VALUE)


def long_to_wide(df: DataFrame) -> DataFrame:
    """Long ``(series_id, ts, value)`` -> wide ``(ts, <series...>)`` via pivot.

    Pivot shuffles once on ``ts``; intended for small result frames
    (driver-side plotting / parity tests), not the 100 TB hot path.
    """
    return df.groupBy(TS).pivot(SERIES_ID).agg(F.first(VALUE)).orderBy(TS)


def assert_long(df: DataFrame) -> DataFrame:
    missing = {SERIES_ID, TS, VALUE} - set(df.columns)
    if missing:
        raise ValueError(f"expected long-format series frame, missing columns: {sorted(missing)}")
    return df
