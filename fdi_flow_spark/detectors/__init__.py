"""Reference import-path shim: lets fdi_flow user code switch to the Spark
engine by renaming only the root package (fdi_flow -> fdi_flow_spark).
Implementations live in the module named in the import below."""

from fdi_flow_spark.detectors.sklearn_detectors import (
    GradientBoostingFaultDetector,
    KNNFaultDetector,
    RandomForestFaultDetector,
    SVMFaultDetector,
)
from fdi_flow_spark.detectors.catboost_detector import CatBoostFaultDetector
from fdi_flow_spark.detectors.lgbm_detectors import LGBMFaultDetector
from fdi_flow_spark.detectors.xgb_detectors import XGBFaultDetector

__all__ = [
    "CatBoostFaultDetector",
    "GradientBoostingFaultDetector",
    "KNNFaultDetector",
    "LGBMFaultDetector",
    "RandomForestFaultDetector",
    "SVMFaultDetector",
    "XGBFaultDetector",
]
