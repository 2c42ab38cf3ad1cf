"""Window filters expressed as pure Spark SQL window math (no Python UDFs).

Semantics match the reference's NumPy kernels exactly (citations are to
``/root/reference/``):

- ``moving_average``: ``fdi_flow/preprocessing/filters.py:122-188``
- ``median_filter``:  ``fdi_flow/preprocessing/filters.py:192-238``

Both stay entirely inside WholeStageCodegen: one Exchange+Sort on
``(series_id, ts)`` feeds every window aggregate, and edge padding is
rebuilt arithmetically (first/last value replication counts) instead of
materializing padded copies — at 100 TB the padded array never exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fdi_flow_spark.core.series import SERIES_ID, TS, VALUE, assert_long


def _series_stats(df: DataFrame) -> DataFrame:
    """Attach per-series n / first / last / row_idx with one window pass."""
    whole = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ordered = Window.partitionBy(SERIES_ID).orderBy(TS)
    return (
        df.withColumn("_n", F.count(VALUE).over(whole))
        .withColumn("_first", F.first(VALUE).over(whole))
        .withColumn("_last", F.last(VALUE).over(whole))
        .withColumn("_i", F.row_number().over(ordered) - F.lit(1))
    )


def moving_average(
    df: DataFrame, window_size: int = 3, pad_with_zeros: bool = False
) -> DataFrame:
    """Per-series moving average.

    ``pad_with_zeros=False`` (valid mode): emits ``n-W+1`` rows, re-indexed
    ``ts=0..n-W`` (reference ``filters.py:159-160``). ``pad_with_zeros=True``
    actually *edge*-pads (the reference pads with ``mode='edge'`` despite the
    flag name, ``filters.py:162-174``): even W pads left ``(W-1)//2`` and
    right ``(W-1)//2+1``, odd W pads symmetrically; output keeps length n.
    Series shorter than the window are returned unchanged
    (``filters.py:152-153``).
    """
    assert_long(df)
    W = window_size
    if W <= 0:
        raise ValueError("Window size must be positive")
    if W == 1:
        return df.select(SERIES_ID, TS, VALUE)

    s = _series_stats(df)
    if not pad_with_zeros:
        # Trailing frame = window ending at current row; valid rows start at W-1.
        trail = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(-(W - 1), 0)
        out = s.withColumn("_ma", F.avg(VALUE).over(trail))
        return out.where((F.col("_n") < W) | (F.col("_i") >= W - 1)).select(
            SERIES_ID,
            F.when(F.col("_n") < W, F.col("_i"))
            .otherwise(F.col("_i") - (W - 1))
            .cast("long")
            .alias(TS),
            F.when(F.col("_n") < W, F.col(VALUE)).otherwise(F.col("_ma")).alias(VALUE),
        )

    pad_left = (W - 1) // 2
    pad_right = W - 1 - pad_left  # even W: pad_left+1; odd W: == pad_left
    core = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(-pad_left, pad_right)
    s = s.withColumn("_core_sum", F.sum(VALUE).over(core))
    lcnt = F.greatest(F.lit(0), F.lit(pad_left) - F.col("_i"))
    rcnt = F.greatest(F.lit(0), F.col("_i") + F.lit(pad_right) - (F.col("_n") - 1))
    padded = (
        F.col("_core_sum") + F.col("_first") * lcnt + F.col("_last") * rcnt
    ) / F.lit(float(W))
    return s.select(
        SERIES_ID,
        F.col("_i").cast("long").alias(TS),
        F.when(F.col("_n") < W, F.col(VALUE)).otherwise(padded).alias(VALUE),
    )


def median_filter(
    df: DataFrame, window_size: int = 3, pad_with_zeros: bool = False
) -> DataFrame:
    """Per-series centered windowed median, output length n.

    Pads ``W//2`` on each side with the edge value (``pad_with_zeros=False``)
    or literal zeros (``True``), then takes ``np.median`` over each width-W
    slice (reference ``filters.py:219-230``; even W averages the two middle
    order statistics). Implemented as one centered ``collect_list`` frame +
    arithmetic pad counts + ``sort_array`` — no exploded padded copy.
    """
    assert_long(df)
    W = window_size
    if W <= 0:
        raise ValueError("Window size must be positive")
    pad = W // 2
    lo, hi = -pad, W - 1 - pad  # frame covers padded slice [i-pad, i+W-1-pad]

    s = _series_stats(df)
    frame = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(lo, hi)
    s = s.withColumn("_arr", F.collect_list(VALUE).over(frame))
    lcnt = F.greatest(F.lit(0), F.lit(pad) - F.col("_i"))
    rcnt = F.greatest(F.lit(0), F.col("_i") + F.lit(hi) - (F.col("_n") - 1))
    if pad_with_zeros:
        lpad_val, rpad_val = F.lit(0.0), F.lit(0.0)
    else:
        lpad_val, rpad_val = F.col("_first"), F.col("_last")
    full = F.concat(
        F.array_repeat(lpad_val, lcnt.cast("int")),
        F.col("_arr"),
        F.array_repeat(rpad_val, rcnt.cast("int")),
    )
    srt = F.sort_array(full)
    if W % 2 == 1:
        med = F.element_at(srt, W // 2 + 1)
    else:
        med = (F.element_at(srt, W // 2) + F.element_at(srt, W // 2 + 1)) / F.lit(2.0)
    return s.select(
        SERIES_ID,
        F.col("_i").cast("long").alias(TS),
        med.alias(VALUE),
    )
