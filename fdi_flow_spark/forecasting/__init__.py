from fdi_flow_spark.forecasting.inference import NumpyForecastModel, predict_distributed
from fdi_flow_spark.forecasting.plots import (
    history_curves,
    normalized_segments,
    plot_normalized_data,
    plot_predictions,
    plot_training_history,
    prediction_segment,
)
from fdi_flow_spark.forecasting.predictor import TimeSeriesPredictor, prepare_supervised_data

__all__ = [
    "NumpyForecastModel",
    "TimeSeriesPredictor",
    "predict_distributed",
    "prepare_supervised_data",
    "history_curves",
    "normalized_segments",
    "prediction_segment",
    "plot_normalized_data",
    "plot_training_history",
    "plot_predictions",
]
