from fdi_flow_spark.core.session import get_spark
from fdi_flow_spark.core.series import (
    LONG_SCHEMA,
    long_to_wide,
    wide_to_long,
    with_row_idx,
)

__all__ = ["get_spark", "LONG_SCHEMA", "long_to_wide", "wide_to_long", "with_row_idx"]
