from fdi_flow_spark.ml.detectors import (
    CatBoostFaultDetector,
    GradientBoostingFaultDetector,
    KNNFaultDetector,
    LGBMFaultDetector,
    RandomForestFaultDetector,
    SVMFaultDetector,
    XGBFaultDetector,
)

__all__ = [
    "KNNFaultDetector",
    "RandomForestFaultDetector",
    "SVMFaultDetector",
    "GradientBoostingFaultDetector",
    "XGBFaultDetector",
    "LGBMFaultDetector",
    "CatBoostFaultDetector",
]
