from fdi_flow_spark.ml.detectors import (
    CatBoostFaultDetector,
    GradientBoostingFaultDetector,
    KNNFaultDetector,
    LGBMFaultDetector,
    RandomForestFaultDetector,
    SVMFaultDetector,
    XGBFaultDetector,
    xgboost_spark_available,
)

__all__ = [
    "xgboost_spark_available",
    "KNNFaultDetector",
    "RandomForestFaultDetector",
    "SVMFaultDetector",
    "GradientBoostingFaultDetector",
    "XGBFaultDetector",
    "LGBMFaultDetector",
    "CatBoostFaultDetector",
]
