from fdi_flow_spark.streaming.stateful import (
    streaming_ewma,
    streaming_kalman_1d,
    streaming_observer,
    streaming_segment_windows,
)

__all__ = [
    "streaming_ewma",
    "streaming_kalman_1d",
    "streaming_observer",
    "streaming_segment_windows",
]
