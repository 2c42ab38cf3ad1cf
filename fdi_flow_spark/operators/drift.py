"""Drift / change detection operators expressed as pure Spark SQL window math.

The reference library's mission is fault detection and isolation on time
series (`/root/reference/README.md:3`): it ships the *estimators* (filters,
observers, classifiers) but leaves the classical sequential change-detection
layer to the user. These operators close that gap Spark-first — every one is
a closed-form composition of ordered-window aggregates (zero Python UDFs,
zero collects), so they ride the same single ``(series_id, ts)``
Exchange+Sort as the §2.1 filters and hold up at 100 TB: per-series
sequential recursions are rewritten as prefix-sum identities that Spark (and
the DuckDB oracle) evaluate with one pass.

Operators
---------
- :func:`cusum` — two-sided CUSUM (Page 1954). The textbook recursion
  ``S+_i = max(0, S+_{i-1} + d_i)`` is a *reflected* prefix sum:
  ``S+_i = C_i - min(0, min_{j<=i} C_j)`` with ``C`` the running sum of
  deviations — an exact identity (proved in tests against the sequential
  recursion), so the whole detector is ``SUM OVER`` + ``MIN OVER``.
- :func:`page_hinkley` — Page–Hinkley mean-shift test (running-mean
  deviations, cumulative sum, running minimum).
- :func:`changepoint_scan` — single change-point location via the scaled
  two-sample mean-shift statistic ``sqrt(t(n-t)/n)|mean_L - mean_R|``
  evaluated at every split from prefix sums (CUSUM-type AMOC scan).
- :func:`mad_outliers` — Iglewicz–Hoaglin modified z-score
  ``0.6745 (x - med) / MAD`` with exact medians; both medians ride the same
  per-series window partition (one Exchange, no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fdi_flow_spark.core.series import SERIES_ID, TS, VALUE, assert_long


def _whole(order: bool = False) -> Window:
    if order:
        return (
            Window.partitionBy(SERIES_ID)
            .orderBy(TS)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    return Window.partitionBy(SERIES_ID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def cusum(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    target: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM drift detector (Page 1954).

    ``d+_i = x_i - target - k`` and ``d-_i = target - x_i - k``; the
    one-sided statistics follow the recursion ``S_i = max(0, S_{i-1} + d_i)``
    with ``S_0 = max(0, d_0)``. ``target=None`` uses the per-series mean
    (fit-on-self, like the §2.2 scalers). ``alarm`` is true when either side
    exceeds ``h``.

    Scale design: the recursion is evaluated via the reflection identity
    ``S_i = C_i - min(0, min_{j<=i} C_j)`` (``C`` = prefix sum of ``d``), so
    there is no per-row Python and no sequential operator — just two ordered
    prefix aggregates over the shared series Exchange.
    """
    assert_long(df)
    run = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tgt = F.lit(float(target)) if target is not None else F.avg(VALUE).over(_whole())
    s = df.withColumn("_tgt", tgt)
    dpos = F.col(VALUE) - F.col("_tgt") - F.lit(float(k))
    dneg = F.col("_tgt") - F.col(VALUE) - F.lit(float(k))
    s = s.withColumn("_cp", F.sum(dpos).over(run)).withColumn("_cn", F.sum(dneg).over(run))
    spos = F.col("_cp") - F.least(F.lit(0.0), F.min("_cp").over(run))
    sneg = F.col("_cn") - F.least(F.lit(0.0), F.min("_cn").over(run))
    return s.select(
        SERIES_ID,
        TS,
        VALUE,
        spos.alias("cusum_pos"),
        sneg.alias("cusum_neg"),
        ((spos > F.lit(float(h))) | (sneg > F.lit(float(h)))).alias("alarm"),
    )


def page_hinkley(
    df: DataFrame,
    delta: float = 0.005,
    lam: float = 50.0,
) -> DataFrame:
    """Page–Hinkley mean-increase test.

    ``m_i = sum_{j<=i} (x_j - xbar_j - delta)`` where ``xbar_j`` is the
    running mean up to ``j``; ``PH_i = m_i - min_{j<=i} m_j``; alarm when
    ``PH_i > lam``. Running mean, cumulative sum, and running minimum are
    all ordered-window aggregates over one Exchange.
    """
    assert_long(df)
    run = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = df.withColumn("_rm", F.avg(VALUE).over(run))
    s = s.withColumn("_m", F.sum(F.col(VALUE) - F.col("_rm") - F.lit(float(delta))).over(run))
    ph = F.col("_m") - F.min("_m").over(run)
    return s.select(
        SERIES_ID,
        TS,
        VALUE,
        ph.alias("ph_stat"),
        (ph > F.lit(float(lam))).alias("alarm"),
    )


def changepoint_scan(df: DataFrame, min_size: int = 5) -> DataFrame:
    """Most likely single change point per series (AMOC mean-shift scan).

    For every admissible split after row ``t`` (1-based prefix length,
    ``min_size <= t <= n - min_size``) compute the scaled two-sample
    statistic ``stat_t = sqrt(t (n-t) / n) * |mean(x[..t]) - mean(x[t..])|``
    from prefix sums, and return the argmax row per series. The rank is
    pinned on ``(round(stat, 9) DESC, cp_ts ASC)`` — rounding absorbs
    last-bit accumulation-order differences across engines/retries, and the
    earliest split wins genuine plateaus — so the winner is deterministic.
    Output: ``(series_id, cp_ts, stat, mean_left, mean_right)`` where
    ``cp_ts`` is the 0-based index of the last row of the left segment.

    One ordered prefix-sum pass + one TakeOrdered-style rank; no candidate
    materialization beyond the input rows themselves.
    """
    assert_long(df)
    if min_size < 1:
        raise ValueError("min_size must be >= 1")
    run = Window.partitionBy(SERIES_ID).orderBy(TS).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = Window.partitionBy(SERIES_ID).orderBy(TS)
    s = (
        df.withColumn("_p", F.sum(VALUE).over(run))
        .withColumn("_t", F.row_number().over(ordered).cast("double"))
        .withColumn("_n", F.count(VALUE).over(_whole(order=True)).cast("double"))
        .withColumn("_tot", F.sum(VALUE).over(_whole(order=True)))
    )
    n, t = F.col("_n"), F.col("_t")
    mean_l = F.col("_p") / t
    mean_r = (F.col("_tot") - F.col("_p")) / (n - t)
    stat = F.sqrt(t * (n - t) / n) * F.abs(mean_l - mean_r)
    cand = s.where((t >= F.lit(float(min_size))) & (t <= n - F.lit(float(min_size)))).select(
        SERIES_ID,
        F.col(TS).alias("cp_ts"),
        stat.alias("stat"),
        mean_l.alias("mean_left"),
        mean_r.alias("mean_right"),
    )
    best = Window.partitionBy(SERIES_ID).orderBy(
        F.round(F.col("stat"), 9).desc(), F.col("cp_ts").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(best))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def mad_outliers(df: DataFrame, threshold: float = 3.5) -> DataFrame:
    """Robust outlier flags via the modified z-score (Iglewicz & Hoaglin).

    ``z_i = 0.6745 (x_i - median) / MAD`` with ``MAD = median(|x - median|)``
    (exact linear-interpolation percentiles, matching NumPy/DuckDB). A
    constant series (``MAD = 0``) yields ``z = 0`` / no outliers. Both
    medians are tiny per-series aggregates broadcast-joined back (the
    robust_scale pattern — percentile-as-window is not guaranteed across
    Spark versions); the stats frames are n_series rows, so both joins are
    broadcasts, never shuffles of the data itself.
    """
    assert_long(df)
    meds = df.groupBy(SERIES_ID).agg(F.expr("percentile(value, 0.5)").alias("_med"))
    s = df.join(F.broadcast(meds), SERIES_ID)
    mads = s.groupBy(SERIES_ID).agg(
        F.expr("percentile(abs(value - _med), 0.5)").alias("_mad")
    )
    s = s.join(F.broadcast(mads), SERIES_ID)
    z = F.when(
        F.col("_mad") == 0.0, F.lit(0.0)
    ).otherwise(F.lit(0.6745) * (F.col(VALUE) - F.col("_med")) / F.col("_mad"))
    return s.select(
        SERIES_ID,
        TS,
        VALUE,
        z.alias("mod_z"),
        (F.abs(z) > F.lit(float(threshold))).alias("outlier"),
    )
