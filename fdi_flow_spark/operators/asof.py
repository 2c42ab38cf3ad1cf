"""As-of (temporal) join — a custom operator the reference lacks but a
time-series engine needs (SURVEY.md §2.8 maps resampling/alignment to it).

Implementation is the *union-tag* pattern, not a per-row subquery: tag right
rows 0 and left rows 1, union, sort per key by (time, tag, tiebreak), and
carry the last non-null right payload forward with
``last(..., ignorenulls=True)`` over a running frame. One shuffle + one sort,
no N×M join — at 100 TB this is the only shape that survives (a naive
range-join explodes; Catalyst cannot prune it).

Tie semantics: a right row at exactly the left row's time IS matched
(``at or before``: tag 0 sorts first). ``direction='forward'`` mirrors with a
reversed sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the closest right row at or
    before (``backward``) / at or after (``forward``) its time, per ``on`` key.

    Returns all left columns plus ``payload_cols`` (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    left_cols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(r.schema[f"_p_{c}"].dataType).alias(f"_p_{c}") for c in payload_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    r = r.select(
        "_k", "_t", "_tag",
        *[F.col(f"_p_{c}") for c in payload_cols],
        *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(f"_l_{c}") for c in left_cols],
    )
    u = r.unionByName(l)

    tb = (F.col(f"_p_{tiebreak}") if tiebreak in payload_cols else F.col(tiebreak)) if tiebreak else None
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_tag").asc()] + ([tb.asc()] if tiebreak is not None else [])
    else:  # forward: scan time descending, right rows still first at equal times
        order = [F.col("_t").desc(), F.col("_tag").asc()] + ([tb.desc()] if tiebreak is not None else [])
    w = Window.partitionBy("_k").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    filled = u.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload_cols
        ],
    )
    out = filled.where(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out
