"""Plan-shape guards (SURVEY.md §5.5): the 'free lunch' assumptions —
column pruning, filter pushdown, single-Exchange window chains — are load-
bearing at 100 TB, so they are asserted, not assumed."""

import contextlib
import io

from pyspark.sql import functions as F

from fdi_flow_spark.operators import (
    median_filter,
    minmax_scale,
    moving_average,
    standard_scale,
)
from fdi_flow_spark.sources.tables import events_series, load_table

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_events_scan_prunes_columns(spark):
    plan = _plan(events_series(spark, SF))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema  # unused wide column never read
    assert "user_id" not in read_schema


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")).select(
        "l_quantity"
    )
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThanOrEqual(l_shipdate" in pushed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema  # projection pruned


def test_chained_window_ops_share_one_exchange(spark):
    """series derivation -> MA -> scaler must reuse a single
    hashpartitioning(series_id) Exchange (shared-shuffle contract of the
    canonical long layout)."""
    df = standard_scale(moving_average(events_series(spark, SF), 5))
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_three_op_chain_still_one_exchange(spark):
    df = minmax_scale(median_filter(moving_average(events_series(spark, SF), 5), 3))
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scaler_plan_is_pure_jvm(spark):
    """The scaler chain must stay JVM-side: vectorized parquet scan, no
    Python evaluation nodes (BatchEvalPython/ArrowEvalPython/FlatMapGroups)."""
    plan = _plan(standard_scale(events_series(spark, SF)), "formatted")
    assert "Batched: true" in plan  # vectorized columnar scan
    assert "Python" not in plan

