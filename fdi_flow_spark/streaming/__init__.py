from fdi_flow_spark.streaming.ann import streaming_ivfpq_probe
from fdi_flow_spark.streaming.containment import streaming_containment_probe
from fdi_flow_spark.streaming.stateful import (
    streaming_cusum,
    streaming_dedup_exact,
    streaming_ewma,
    streaming_holt,
    streaming_kalman_1d,
    streaming_observer,
    streaming_page_hinkley,
    streaming_segment_windows,
    streaming_sessions,
)

__all__ = [
    "streaming_containment_probe",
    "streaming_cusum",
    "streaming_ivfpq_probe",
    "streaming_dedup_exact",
    "streaming_ewma",
    "streaming_holt",
    "streaming_kalman_1d",
    "streaming_observer",
    "streaming_page_hinkley",
    "streaming_segment_windows",
    "streaming_sessions",
]
