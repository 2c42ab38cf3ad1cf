"""Reference import-path shim: lets fdi_flow user code switch to the Spark
engine by renaming only the root package (fdi_flow -> fdi_flow_spark).
Implementations live in the module named in the import below."""

from fdi_flow_spark.state_observers.kalman import KalmanFilter
from fdi_flow_spark.state_observers.luenberger import LuenbergerObserver
from fdi_flow_spark.state_observers.sliding_mode import SlidingModeObserver

__all__ = ["KalmanFilter", "LuenbergerObserver", "SlidingModeObserver"]
