from fdi_flow_spark.forecasting.inference import NumpyForecastModel, predict_distributed
from fdi_flow_spark.forecasting.predictor import TimeSeriesPredictor, prepare_supervised_data

__all__ = [
    "NumpyForecastModel",
    "TimeSeriesPredictor",
    "predict_distributed",
    "prepare_supervised_data",
]
