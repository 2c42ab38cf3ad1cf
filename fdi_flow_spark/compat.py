"""Drop-in reference API: the ``fdi_flow`` preprocessing classes, backed by
the Spark engine.

A reference user writes ``ExponentialSmoothing(alpha=0.3).apply(data)`` with
``data`` a list / ndarray / Series / DataFrame
(``/root/reference/fdi_flow/preprocessing/filters.py:7-39`` BaseFilter
contract: validate -> kernel -> restore container). These classes keep the
exact constructor signatures and container round-trip — including the
``axis`` convention (``axis=0``: rows are series; ``axis=1``, default:
columns are series) — while every computation runs through the distributed
DataFrame operators. A Spark ``DataFrame`` in the canonical long layout
passes straight through to the operator (the scale path); ArrayLike inputs
ride a createDataFrame round-trip on the active session (the convenience /
parity path — collect sizes are the user's own in-memory arrays, so the
round-trip is driver-bounded by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fdi_flow_spark.operators import (
    double_exponential_smoothing,
    exponential_smoothing,
    failure_encode,
    kalman_filter_1d,
    median_filter,
    minmax_scale,
    moving_average,
    resample,
    robust_scale,
    segment,
    spline_upsample,
    standard_scale,
)
from fdi_flow_spark.operators.recurrences import bandpass_filter

__all__ = [
    "BandpassFilter",
    "DoubleExponentialSmoothing",
    "ExponentialSmoothing",
    "FailureEncoder",
    "KalmanFilter",
    "MedianFilter",
    "MinMaxScaler",
    "MovingAverage",
    "RobustScaler",
    "SplineUpsampler",
    "StandardScaler",
    "TimeSeriesSegmenter",
    "TimeSeriesResampler",
]


def _check_axis(axis: int) -> int:
    """Constructor-time axis validation, mirroring the reference filters /
    segmenters (``filters.py:53-54`` et al.). Scalers deliberately skip this:
    the reference's ``BaseScaler.apply`` accepts any axis and treats non-0
    as columns (``scalers.py:31-35``), and compat reproduces that."""
    if axis not in (0, 1):
        raise ValueError("Axis must be 0 (rows) or 1 (columns)")
    return axis


def _check_unit_interval(name: str, value: float) -> float:
    if not 0 < value < 1:
        raise ValueError(f"{name.capitalize()} must be between 0 and 1")
    return value


def _series_matrix(data, axis: int):
    """ArrayLike -> (matrix with one series per ROW, meta for round-trip)."""
    if isinstance(data, list):
        arr = np.asarray(data, dtype=float)
        kind = "list"
    elif isinstance(data, pd.Series):
        arr = data.to_numpy(dtype=float)
        kind = "series"
    elif isinstance(data, pd.DataFrame):
        arr = data.to_numpy(dtype=float)
        kind = "frame"
    elif isinstance(data, np.ndarray):
        arr = np.asarray(data, dtype=float)
        kind = "array"
    else:
        raise ValueError(
            "Unsupported input type. Use List, np.ndarray, pd.Series, "
            "pd.DataFrame, or a Spark DataFrame in (series_id, ts, value) form."
        )
    if arr.ndim == 1:
        return arr[None, :], {"kind": kind, "ndim": 1, "axis": axis, "src": data}
    rows = arr if axis == 0 else arr.T
    return rows, {"kind": kind, "ndim": 2, "axis": axis, "src": data}


def _restore(rows: np.ndarray, meta) -> "np.ndarray | list | pd.Series | pd.DataFrame":
    if meta["ndim"] == 1:
        out = rows[0]
    else:
        out = rows if meta["axis"] == 0 else rows.T
    kind, src = meta["kind"], meta["src"]
    if kind == "list":
        return out.tolist()
    if kind == "series":
        idx = src.index if len(out) == len(src) else None
        return pd.Series(out, index=idx)
    if kind == "frame":
        same = out.shape == src.shape
        return pd.DataFrame(
            out,
            index=src.index if same else None,
            columns=src.columns if same else None,
        )
    return out


def _spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        from fdi_flow_spark.core.session import get_spark

        s = get_spark(app_name="fdi_flow_spark-compat")
    return s


def _rows_to_long(rows: np.ndarray) -> DataFrame:
    recs = [
        (f"c{si:06d}", int(t), float(v))
        for si, series in enumerate(rows)
        for t, v in enumerate(series)
    ]
    return _spark().createDataFrame(recs, "series_id string, ts long, value double")


def _collect_rows(df: DataFrame, n_series: int) -> np.ndarray:
    pdf = df.toPandas().sort_values(["series_id", "ts"])
    groups = [g["value"].to_numpy() for _, g in pdf.groupby("series_id", sort=True)]
    if len(groups) != n_series:
        raise RuntimeError("series dropped during compat round-trip")
    return np.vstack(groups)


class _LongOpShim:
    """Shared apply(): Spark DataFrame -> operator verbatim; ArrayLike ->
    long round-trip with container/orientation restore."""

    axis = 1

    def _op(self, df: DataFrame) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def apply(self, data):
        if isinstance(data, DataFrame):
            return self._op(data)
        rows, meta = _series_matrix(data, self.axis)
        out = self._collect(self._op(_rows_to_long(rows)), len(rows))
        return _restore(out, meta)

    def _collect(self, df: DataFrame, n_series: int) -> np.ndarray:
        return _collect_rows(df, n_series)


class ExponentialSmoothing(_LongOpShim):
    def __init__(self, alpha: float = 0.3, axis: int = 1):
        self.alpha = _check_unit_interval("alpha", alpha)  # filters.py:51-52
        self.axis = _check_axis(axis)

    def _op(self, df):
        return exponential_smoothing(df, alpha=self.alpha)


class DoubleExponentialSmoothing(_LongOpShim):
    def __init__(self, alpha: float = 0.3, beta: float = 0.1, axis: int = 1):
        if not 0 < alpha < 1 or not 0 < beta < 1:  # filters.py:87-88
            raise ValueError("Alpha and beta must be between 0 and 1")
        self.alpha = alpha
        self.beta = beta
        self.axis = _check_axis(axis)

    def _op(self, df):
        return double_exponential_smoothing(df, alpha=self.alpha, beta=self.beta)


class MovingAverage(_LongOpShim):
    def __init__(self, window_size: int = 3, pad_with_zeros: bool = False, axis: int = 1):
        if window_size <= 0:  # filters.py:133-134
            raise ValueError("Window size must be positive")
        self.window_size = window_size
        self.pad_with_zeros = pad_with_zeros
        self.axis = _check_axis(axis)

    def _op(self, df):
        return moving_average(df, self.window_size, pad_with_zeros=self.pad_with_zeros)


class MedianFilter(_LongOpShim):
    def __init__(self, window_size: int = 3, pad_with_zeros: bool = False, axis: int = 1):
        if window_size <= 0:  # filters.py:201-202
            raise ValueError("Window size must be positive")
        self.window_size = window_size
        self.pad_with_zeros = pad_with_zeros
        self.axis = _check_axis(axis)

    def _op(self, df):
        return median_filter(df, self.window_size, pad_with_zeros=self.pad_with_zeros)


class BandpassFilter(_LongOpShim):
    def __init__(self, low_cutoff: float, high_cutoff: float, sample_rate: float, axis: int = 1):
        if low_cutoff >= high_cutoff:  # filters.py:252-255
            raise ValueError("Low cutoff must be less than high cutoff")
        if sample_rate <= 0:
            raise ValueError("Sample rate must be positive")
        self.low_cutoff = low_cutoff
        self.high_cutoff = high_cutoff
        self.sample_rate = sample_rate
        self.axis = _check_axis(axis)

    def _op(self, df):
        return bandpass_filter(df, self.low_cutoff, self.high_cutoff, self.sample_rate)


class KalmanFilter(_LongOpShim):
    def __init__(self, q: float = 1.0, r: float = 1.0, x0=None, p0: float = 1.0, axis: int = 1):
        self.q, self.r, self.x0, self.p0 = q, r, x0, p0
        self.axis = _check_axis(axis)  # filters.py:318-319

    def _op(self, df):
        return kalman_filter_1d(df, q=self.q, r=self.r, x0=self.x0, p0=self.p0)


class _ScalerShim(_LongOpShim):
    def apply(self, data, axis: int = 1):  # reference passes axis at apply time
        self.axis = axis
        return super().apply(data)


class StandardScaler(_ScalerShim):
    def __init__(self, with_mean: bool = True, with_std: bool = True):
        self.with_mean = with_mean
        self.with_std = with_std

    def _op(self, df):
        return standard_scale(df, with_mean=self.with_mean, with_std=self.with_std)


class MinMaxScaler(_ScalerShim):
    def __init__(self, feature_range: tuple = (0, 1)):
        if feature_range[0] >= feature_range[1]:  # scalers.py:89-90
            raise ValueError("Minimum of feature range must be less than maximum")
        self.feature_range = feature_range

    def _op(self, df):
        return minmax_scale(df, feature_range=self.feature_range)


class RobustScaler(_ScalerShim):
    def __init__(self, with_centering: bool = True, with_scaling: bool = True):
        self.with_centering = with_centering
        self.with_scaling = with_scaling

    def _op(self, df):
        return robust_scale(
            df, with_centering=self.with_centering, with_scaling=self.with_scaling
        )


class TimeSeriesResampler(_LongOpShim):
    def __init__(self, target_size: int, method: str = "linear", axis: int = 1):
        if target_size <= 0:  # segmenters.py:116-121
            raise ValueError("Target size must be positive")
        if method not in ("linear", "nearest", "cubic"):
            raise ValueError("Method must be 'linear', 'nearest' or 'cubic'")
        self.target_size = target_size
        self.method = method
        self.axis = _check_axis(axis)

    def _op(self, df):
        return resample(df, self.target_size, method=self.method)


class SplineUpsampler(_LongOpShim):
    def __init__(
        self, target_size: int, spline_degree: int = 3, smoothing: float = 0.0, axis: int = 1
    ):
        if target_size <= 0:  # segmenters.py:186-191
            raise ValueError("Target size must be positive")
        if spline_degree not in (1, 2, 3):
            raise ValueError("Spline degree must be 1, 2 or 3")
        self.target_size = target_size
        self.spline_degree = spline_degree
        self.smoothing = smoothing
        self.axis = _check_axis(axis)

    def _op(self, df):
        return spline_upsample(
            df, self.target_size, spline_degree=self.spline_degree, smoothing=self.smoothing
        )


class TimeSeriesSegmenter:
    """Reference ``segment() -> List[window]`` contract
    (``segmenters.py:9-103``), windows assembled from the distributed
    ``segment`` operator's packed rows.

    Pandas input follows the reference's dedicated pandas path
    (``segmenters.py:72-103``): windows are ``iloc`` row slices with the
    original index/columns preserved, REGARDLESS of ``axis`` (the reference
    never transposes pandas input), and a series shorter than the window
    errors when ``drop_last=False`` (the reference hits an unbound loop
    variable there; we raise a ValueError with an actual message)."""

    def __init__(self, window_size: int, step: int = 1, drop_last: bool = True, axis: int = 1):
        if window_size <= 0:
            raise ValueError("Window size must be positive")
        self.window_size = window_size
        self.step = step
        self.drop_last = drop_last
        self.axis = _check_axis(axis)

    def _window_starts(self, n_samples: int) -> list[int]:
        """The reference's emitted start set, including the overlapping
        ``data[-W:]`` tail quirk (``segmenters.py:51-53``)."""
        starts = list(range(0, n_samples - self.window_size + 1, self.step))
        if not self.drop_last:
            if not starts:
                raise ValueError(
                    f"series of length {n_samples} is shorter than "
                    f"window_size={self.window_size} (reference raises here "
                    "when drop_last=False)"
                )
            if (n_samples - starts[-1] - self.step) > 0:
                starts.append(n_samples - self.window_size)
        return starts

    def segment(self, data):
        if isinstance(data, DataFrame):
            return segment(data, self.window_size, self.step, self.drop_last)
        if isinstance(data, (pd.Series, pd.DataFrame)):
            return [
                data.iloc[s : s + self.window_size]
                for s in self._window_starts(len(data))
            ]
        rows, meta = _series_matrix(data, self.axis)
        df = segment(_rows_to_long(rows), self.window_size, self.step, self.drop_last)
        pdf = df.toPandas().sort_values(["series_id", "window_id"])
        per_series = {
            sid: [np.asarray(f) for f in g.sort_values("window_id")["features"]]
            for sid, g in pdf.groupby("series_id", sort=True)
        }
        sids = sorted(per_series)
        n_windows = len(per_series[sids[0]]) if sids else 0
        out = []
        for w in range(n_windows):
            stacked = np.vstack([per_series[s][w] for s in sids])  # series x W
            if meta["ndim"] == 1:
                out.append(_restore(stacked, meta))
            else:
                out.append(_restore(stacked, meta))
        return out


class FailureEncoder:
    """Reference per-series failure code (``segmenters.py:245-297``):
    1-D in -> scalar; 2-D in -> one code per series along ``axis``."""

    def __init__(self, failure_threshold: float = 10.0, axis: int = 1):
        self.failure_threshold = failure_threshold
        self.axis = axis

    def encode(self, data):
        if isinstance(data, DataFrame):
            return failure_encode(data, failure_threshold=self.failure_threshold)
        rows, meta = _series_matrix(data, self.axis)
        df = failure_encode(_rows_to_long(rows), failure_threshold=self.failure_threshold)
        pdf = df.toPandas().sort_values("series_id")
        codes = pdf["fail_code"].to_numpy()
        if meta["ndim"] == 1:
            return float(codes[0])
        return codes
