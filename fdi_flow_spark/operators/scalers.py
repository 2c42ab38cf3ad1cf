"""Per-series scalers: fit-and-transform-in-one over the full series.

Reference semantics (``/root/reference/fdi_flow/preprocessing/scalers.py``):
stats are computed on the very data being scaled (no fit state). All three
are one unbounded window pass per series — a single Exchange+Sort feeds
every statistic, and the scaled value is computed in WholeStageCodegen.

- ``standard_scale``: population std (``np.std``, ddof=0) — NOT MLlib's
  sample std; skip divide when std == 0 (``scalers.py:65-77``).
- ``minmax_scale``: constant series map to range midpoint (``scalers.py:112-113``).
- ``robust_scale``: exact linear-interpolation percentiles (``np.percentile``
  default == Spark ``percentile`` == DuckDB ``quantile_cont``); skip divide
  when IQR == 0 (``scalers.py:142-158``). ``percentile_approx`` is available
  behind ``exact=False`` for 100 TB-scale runs where hash-parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fdi_flow_spark.core.series import SERIES_ID, TS, VALUE, assert_long


def _whole(df_cols_order: str = TS) -> Window:
    return Window.partitionBy(SERIES_ID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def standard_scale(
    df: DataFrame, with_mean: bool = True, with_std: bool = True
) -> DataFrame:
    assert_long(df)
    w = _whole()
    mean = F.avg(VALUE).over(w)
    std = F.stddev_pop(VALUE).over(w)
    centered = F.col(VALUE) - (mean if with_mean else F.lit(0.0))
    scaled = (
        F.when(std > 0, centered / std).otherwise(centered) if with_std else centered
    )
    return df.select(SERIES_ID, TS, scaled.alias(VALUE))


def minmax_scale(df: DataFrame, feature_range: tuple = (0.0, 1.0)) -> DataFrame:
    lo, hi = feature_range
    if lo >= hi:
        raise ValueError("Minimum of feature range must be less than maximum")
    assert_long(df)
    w = _whole()
    dmin, dmax = F.min(VALUE).over(w), F.max(VALUE).over(w)
    scaled = (F.col(VALUE) - dmin) / (dmax - dmin) * F.lit(hi - lo) + F.lit(lo)
    out = F.when(dmax - dmin == 0, F.lit((lo + hi) / 2.0)).otherwise(scaled)
    return df.select(SERIES_ID, TS, out.alias(VALUE))


def robust_scale(
    df: DataFrame,
    with_centering: bool = True,
    with_scaling: bool = True,
    exact: bool = True,
) -> DataFrame:
    assert_long(df)
    # Exact percentiles via groupBy + broadcast join back (percentile as a
    # window fn is not guaranteed across Spark versions; the per-series stats
    # frame is tiny, so the join is broadcast).
    pfn = "percentile" if exact else "percentile_approx"
    stats = df.groupBy(SERIES_ID).agg(
        F.expr(f"{pfn}(value, 0.5)").alias("_med"),
        F.expr(f"{pfn}(value, 0.25)").alias("_q25"),
        F.expr(f"{pfn}(value, 0.75)").alias("_q75"),
    )
    j = df.join(F.broadcast(stats), SERIES_ID)
    centered = F.col(VALUE) - (F.col("_med") if with_centering else F.lit(0.0))
    # NOTE: reference computes percentiles of the *centered* data for IQR, but
    # IQR is translation-invariant: q75(x-m)-q25(x-m) == q75(x)-q25(x).
    iqr = F.col("_q75") - F.col("_q25")
    scaled = F.when(iqr > 0, centered / iqr).otherwise(centered) if with_scaling else centered
    return j.select(SERIES_ID, TS, scaled.alias(VALUE))
