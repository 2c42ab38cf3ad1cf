from fdi_flow_spark.forecasting.predictor import TimeSeriesPredictor, prepare_supervised_data

__all__ = ["TimeSeriesPredictor", "prepare_supervised_data"]
