"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a named
``(spark, sf_dir) -> DataFrame`` callable.
``oracle_sql()`` — DuckDB twins for the SQL-expressible subset (driver
compares row-count + schema + order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events -> canonical series ->
    MovingAverage(5, valid) -> StandardScaler. Exercises scan, window math,
    and per-series normalization in one Catalyst plan."""
    from fdi_flow_spark.operators import moving_average, standard_scale
    from fdi_flow_spark.sources.tables import events_series

    series = events_series(spark, "/root/testdata/sf0.001")
    return standard_scale(moving_average(series, 5, pad_with_zeros=False))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fdi_flow_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fdi_flow_spark.plans.registry import ORACLES

    return dict(ORACLES)
