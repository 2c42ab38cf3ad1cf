"""Reference drop-in API (fdi_flow_spark.compat): same constructors, same
.apply container round-trip, distributed execution underneath."""

import numpy as np
import pandas as pd
import pytest

from fdi_flow_spark import compat

from .reference_kernels import (
    ref_ewma,
    ref_failure_encode,
    ref_holt,
    ref_kalman1d,
    ref_median_filter,
    ref_minmax_scale,
    ref_moving_average,
    ref_robust_scale,
    ref_standard_scale,
)


@pytest.fixture(scope="module")
def mat(spark):  # spark fixture keeps an active session for the shims
    rng = np.random.default_rng(31)
    return rng.normal(0, 1, (4, 25))  # 4 series of 25 samples


def test_ewma_list_and_ndarray_roundtrip(spark, mat):
    f = compat.ExponentialSmoothing(alpha=0.4)
    one = mat[0]
    out_list = f.apply(one.tolist())
    assert isinstance(out_list, list)
    np.testing.assert_allclose(out_list, ref_ewma(one, 0.4), rtol=1e-12)
    # 2-D, axis=0 (rows are series)
    f0 = compat.ExponentialSmoothing(alpha=0.4, axis=0)
    out = f0.apply(mat)
    assert isinstance(out, np.ndarray) and out.shape == mat.shape
    for i in range(mat.shape[0]):
        np.testing.assert_allclose(out[i], ref_ewma(mat[i], 0.4), rtol=1e-12)
    # 2-D, axis=1 (columns are series) — transpose convention
    f1 = compat.ExponentialSmoothing(alpha=0.4, axis=1)
    out_t = f1.apply(mat.T)
    np.testing.assert_allclose(out_t, out.T, rtol=1e-12)


def test_filters_match_reference_kernels(spark, mat):
    x = mat[1]
    np.testing.assert_allclose(
        compat.DoubleExponentialSmoothing(0.3, 0.2).apply(x), ref_holt(x, 0.3, 0.2), rtol=1e-10
    )
    np.testing.assert_allclose(
        compat.MovingAverage(5, pad_with_zeros=True).apply(x),
        ref_moving_average(x, 5, True),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        compat.MedianFilter(3, pad_with_zeros=False).apply(x),
        ref_median_filter(x, 3, False),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        compat.KalmanFilter(q=0.5, r=2.0).apply(x), ref_kalman1d(x, 0.5, 2.0, None, 1.0), rtol=1e-10
    )


def test_moving_average_valid_shrinks_output(spark, mat):
    x = mat[2]
    out = compat.MovingAverage(4, pad_with_zeros=False).apply(x)
    np.testing.assert_allclose(out, ref_moving_average(x, 4, False), rtol=1e-12)
    assert len(out) == len(x) - 3


def test_scalers_axis_at_apply_time(spark, mat):
    s = compat.StandardScaler()
    out = s.apply(mat, axis=0)
    for i in range(mat.shape[0]):
        np.testing.assert_allclose(out[i], ref_standard_scale(mat[i]), rtol=1e-10)
    np.testing.assert_allclose(
        compat.MinMaxScaler((-1.0, 1.0)).apply(mat[0].tolist()),
        ref_minmax_scale(mat[0], -1.0, 1.0),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        compat.RobustScaler().apply(mat[3]), ref_robust_scale(mat[3]), rtol=1e-10
    )


def test_pandas_containers_preserved(spark, mat):
    ser = pd.Series(mat[0], index=pd.RangeIndex(10, 35))
    out = compat.ExponentialSmoothing(0.3).apply(ser)
    assert isinstance(out, pd.Series) and list(out.index) == list(ser.index)
    frame = pd.DataFrame(mat.T, columns=list("abcd"))  # columns are series (axis=1)
    out_f = compat.StandardScaler().apply(frame, axis=1)
    assert isinstance(out_f, pd.DataFrame) and list(out_f.columns) == list("abcd")
    for c in "abcd":
        np.testing.assert_allclose(
            out_f[c].to_numpy(), ref_standard_scale(frame[c].to_numpy()), rtol=1e-10
        )


def test_segmenter_list_of_windows(spark, mat):
    x = mat[0][:11]
    segs = compat.TimeSeriesSegmenter(window_size=4, step=3, drop_last=False).segment(x)
    assert all(isinstance(s, np.ndarray) and len(s) == 4 for s in segs)
    # reference tail quirk: last window re-slices the final W samples
    np.testing.assert_allclose(segs[-1], x[-4:])
    np.testing.assert_allclose(segs[0], x[:4])


def test_failure_encoder_scalar_and_per_series(spark):
    x = np.array([0, 0, 5, 5, 5, 0, 0, 0, 0, 2.0])
    got = compat.FailureEncoder(failure_threshold=10.0).encode(x)
    assert got == ref_failure_encode(x, 10.0)
    m = np.vstack([x, np.zeros(10)])
    codes = compat.FailureEncoder(failure_threshold=10.0, axis=0).encode(m)
    assert list(codes) == [ref_failure_encode(x, 10.0), 0.0]


def test_spark_dataframe_passthrough(spark, mat):
    from .conftest import make_long

    df = make_long(spark, {"a": mat[0]})
    out = compat.ExponentialSmoothing(0.3).apply(df)
    # a Spark DataFrame in, a Spark DataFrame out — no collect
    from pyspark.sql import DataFrame

    assert isinstance(out, DataFrame)
    vals = np.array([r.value for r in out.orderBy("ts").collect()])
    np.testing.assert_allclose(vals, ref_ewma(mat[0], 0.3), rtol=1e-12)


def test_reference_import_paths_resolve():
    # a fdi_flow user switches by renaming only the root package
    from fdi_flow_spark.detectors.sklearn_detectors import KNNFaultDetector  # noqa: F401
    from fdi_flow_spark.forecasting.time_series_model import (  # noqa: F401
        TimeSeriesPredictor,
    )
    from fdi_flow_spark.models.data_generators import (  # noqa: F401
        DynamicSystemDataGenerator,
    )
    from fdi_flow_spark.models.linear_models import (
        LinearContinuousStateSpaceModel,
    )
    from fdi_flow_spark.preprocessing.filters import ExponentialSmoothing
    from fdi_flow_spark.state_observers.kalman import KalmanFilter

    from fdi_flow_spark import compat
    from fdi_flow_spark.models import systems
    from fdi_flow_spark.observers.observers import KalmanFilterMatrix

    assert ExponentialSmoothing is compat.ExponentialSmoothing
    assert LinearContinuousStateSpaceModel is systems.LinearContinuousStateSpaceModel
    assert KalmanFilter is KalmanFilterMatrix


def test_constructor_validation_mirrors_reference():
    """Reference constructors reject bad alpha/beta/axis/window/range at
    __init__ (filters.py:51-54, 87-90, 133-136, 252-257; scalers.py:89-90;
    segmenters.py:116-121, 186-191) — compat must too."""
    with pytest.raises(ValueError):
        compat.ExponentialSmoothing(alpha=0.0)
    with pytest.raises(ValueError):
        compat.ExponentialSmoothing(alpha=1.0)
    with pytest.raises(ValueError):
        compat.ExponentialSmoothing(axis=2)
    with pytest.raises(ValueError):
        compat.DoubleExponentialSmoothing(beta=1.5)
    with pytest.raises(ValueError):
        compat.MovingAverage(window_size=0)
    with pytest.raises(ValueError):
        compat.MedianFilter(axis=-1)
    with pytest.raises(ValueError):
        compat.BandpassFilter(low_cutoff=5.0, high_cutoff=1.0, sample_rate=100.0)
    with pytest.raises(ValueError):
        compat.BandpassFilter(low_cutoff=1.0, high_cutoff=5.0, sample_rate=0.0)
    with pytest.raises(ValueError):
        compat.KalmanFilter(axis=3)
    with pytest.raises(ValueError):
        compat.MinMaxScaler(feature_range=(1, 1))
    with pytest.raises(ValueError):
        compat.TimeSeriesResampler(target_size=0)
    with pytest.raises(ValueError):
        compat.TimeSeriesResampler(target_size=10, method="quadratic")
    with pytest.raises(ValueError):
        compat.SplineUpsampler(target_size=10, spline_degree=5)
    with pytest.raises(ValueError):
        compat.TimeSeriesSegmenter(window_size=4, axis=7)


def test_segmenter_pandas_row_slices_ignore_axis():
    """Reference _segment_pandas always slices ROWS with the original index
    preserved, regardless of axis (segmenters.py:72-103)."""
    frame = pd.DataFrame(
        np.arange(22.0).reshape(11, 2), columns=["a", "b"], index=np.arange(100, 111)
    )
    for axis in (0, 1):
        segs = compat.TimeSeriesSegmenter(
            window_size=4, step=3, drop_last=False, axis=axis
        ).segment(frame)
        assert all(isinstance(s, pd.DataFrame) for s in segs)
        assert [list(s.index) for s in segs] == [
            [100, 101, 102, 103],
            [103, 104, 105, 106],
            [106, 107, 108, 109],
            [107, 108, 109, 110],  # tail quirk: final W rows re-sliced
        ]
        assert list(segs[0].columns) == ["a", "b"]
    ser = pd.Series(np.arange(11.0), index=np.arange(50, 61))
    segs = compat.TimeSeriesSegmenter(window_size=4, step=3, drop_last=False).segment(ser)
    assert all(isinstance(s, pd.Series) for s in segs)
    assert list(segs[-1].index) == [57, 58, 59, 60]


def test_segmenter_pandas_short_series_raises():
    ser = pd.Series(np.arange(3.0))
    # drop_last=True: reference returns [] (empty start range)
    assert compat.TimeSeriesSegmenter(window_size=5).segment(ser) == []
    # drop_last=False: reference errors (unbound loop variable); we raise
    with pytest.raises(ValueError, match="shorter than"):
        compat.TimeSeriesSegmenter(window_size=5, drop_last=False).segment(ser)
