from fdi_flow_spark.operators.analytics import (
    cross_corr_pairs,
    gap_fill,
    rolling_corr_pairs,
    pattern_search,
    seasonal_decompose,
    series_acf,
    series_pacf,
    series_profile,
    session_stats,
    sessionize,
    time_bucket_rollup,
    value_histogram,
)
from fdi_flow_spark.operators.drift import (
    changepoint_scan,
    cusum,
    mad_outliers,
    page_hinkley,
)
from fdi_flow_spark.operators.filters import median_filter, moving_average
from fdi_flow_spark.operators.recurrences import (
    bandpass_filter,
    double_exponential_smoothing,
    exponential_smoothing,
    kalman_filter_1d,
)
from fdi_flow_spark.operators.spectral import spectral_features
from fdi_flow_spark.operators.scalers import minmax_scale, robust_scale, standard_scale
from fdi_flow_spark.operators.segmenters import (
    failure_encode,
    resample,
    segment,
    spline_upsample,
    supervised_windows,
)

__all__ = [
    "moving_average",
    "median_filter",
    "exponential_smoothing",
    "double_exponential_smoothing",
    "kalman_filter_1d",
    "bandpass_filter",
    "standard_scale",
    "minmax_scale",
    "robust_scale",
    "segment",
    "resample",
    "spline_upsample",
    "failure_encode",
    "supervised_windows",
    "cusum",
    "page_hinkley",
    "changepoint_scan",
    "mad_outliers",
    "series_acf",
    "series_pacf",
    "series_profile",
    "cross_corr_pairs",
    "rolling_corr_pairs",
    "gap_fill",
    "pattern_search",
    "sessionize",
    "session_stats",
    "time_bucket_rollup",
    "value_histogram",
    "seasonal_decompose",
    "spectral_features",
]
