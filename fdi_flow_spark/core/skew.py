"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in ``core.session``) covers joins; a
pathologically hot *group key* still funnels one reducer. For algebraic
aggregates the fix is salting: partial-aggregate on (key, salt) so the hot
key fans out over ``salt_buckets`` reducers, then combine per key. The
partial shuffle carries at most ``|keys| x salt_buckets`` rows per metric —
independent of the skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PARTIAL = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_FINAL = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.sum(c),  # counts combine by summing
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed ``keys``.

    ``metrics`` is a list of ``(fn, column, alias)`` with fn in
    {sum, count, min, max, avg}. ``avg`` decomposes into sum+count and is
    recombined exactly. Results equal a direct ``groupBy(keys).agg`` (up to
    float summation order).
    """
    plan: list[tuple[str, str, str]] = []
    avgs: list[tuple[str, str]] = []
    for fn, col, alias in metrics:
        if fn == "avg":
            plan.append(("sum", col, f"__{alias}_sum"))
            plan.append(("count", col, f"__{alias}_cnt"))
            avgs.append((alias, col))
        elif fn in _PARTIAL:
            plan.append((fn, col, alias))
        else:
            raise ValueError(f"unsupported metric {fn!r}")

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[fn](col).alias(alias) for fn, col, alias in plan]
    )
    final = partial.groupBy(*keys).agg(
        *[_FINAL[fn](alias).alias(alias) for fn, alias in ((fn, alias) for fn, _, alias in plan)]
    )
    for alias, _ in avgs:
        final = final.withColumn(alias, F.col(f"__{alias}_sum") / F.col(f"__{alias}_cnt"))
        final = final.drop(f"__{alias}_sum", f"__{alias}_cnt")
    return final
