from fdi_flow_spark.observers.linalg import (
    ackermann_gain,
    feedback_gain,
    place_observer_gain,
)
from fdi_flow_spark.observers.observers import (
    KalmanFilter,
    KalmanFilterMatrix,
    LuenbergerObserver,
    SlidingModeObserver,
    observer_replay,
)

__all__ = [
    "LuenbergerObserver",
    "KalmanFilter",
    "KalmanFilterMatrix",
    "SlidingModeObserver",
    "observer_replay",
    "ackermann_gain",
    "feedback_gain",
    "place_observer_gain",
]
