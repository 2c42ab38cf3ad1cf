from fdi_flow_spark.models.generators import (
    DynamicSystemDataGenerator,
    simulate_batch,
    simulate_discrete_replay,
    simulate_replay,
)
from fdi_flow_spark.models.systems import (
    LinearContinuousStateSpaceModel,
    LinearDiscreteStateSpaceModel,
    NonlinearDiscreteStateSpaceModel,
    NonlinearStateSpaceModel,
)
from fdi_flow_spark.models.utils import plot_simulation_results

__all__ = [
    "LinearContinuousStateSpaceModel",
    "LinearDiscreteStateSpaceModel",
    "NonlinearStateSpaceModel",
    "NonlinearDiscreteStateSpaceModel",
    "DynamicSystemDataGenerator",
    "simulate_batch",
    "simulate_discrete_replay",
    "simulate_replay",
    "plot_simulation_results",
]
