import numpy as np
import pytest

from fdi_flow_spark.operators import (
    failure_encode,
    resample,
    segment,
    spline_upsample,
    supervised_windows,
)
from fdi_flow_spark.operators.segmenters import cubic_spline_eval

from .conftest import make_long
from .reference_kernels import (
    ref_failure_encode,
    ref_resample_linear,
    ref_resample_nearest,
    ref_segment_starts,
)


@pytest.mark.parametrize(
    "n,W,step,drop_last",
    [
        (20, 5, 1, True),
        (20, 5, 3, True),
        (20, 5, 3, False),
        (10, 4, 3, False),  # tail duplicates last regular window (start 6 twice)
        (10, 4, 3, True),
        (7, 7, 2, False),
        (6, 7, 1, True),  # series shorter than window -> no windows
    ],
)
def test_segment_starts(spark, n, W, step, drop_last):
    arr = np.arange(n, dtype=np.float64)
    df = make_long(spark, {"s": arr})
    out = (
        segment(df, W, step, drop_last)
        .orderBy("window_id")
        .select("window_id", "window_start", "features")
        .collect()
    )
    expected_starts = ref_segment_starts(n, W, step, drop_last)
    assert [r.window_start for r in out] == expected_starts
    assert [r.window_id for r in out] == list(range(len(expected_starts)))
    for r in out:
        np.testing.assert_array_equal(
            np.array(r.features), arr[r.window_start : r.window_start + W]
        )


def test_segment_exploded(spark):
    arr = np.arange(12, dtype=np.float64) * 1.5
    df = make_long(spark, {"s": arr})
    rows = segment(df, 4, 2, True, exploded=True).collect()
    assert len(rows) == len(ref_segment_starts(12, 4, 2, True)) * 4
    for r in rows:
        assert r.value == arr[r.window_start + r.pos]


def test_supervised_windows(spark):
    arr = np.arange(15, dtype=np.float64)
    df = make_long(spark, {"s": arr})
    rows = supervised_windows(df, time_steps=5, output_steps=2).orderBy("window_start").collect()
    # i in [0, n-T-H] inclusive -> 15-5-2+1 = 9 windows
    assert len(rows) == 9
    for r in rows:
        i = r.window_start
        np.testing.assert_array_equal(np.array(r.x), arr[i : i + 5])
        np.testing.assert_array_equal(np.array(r.y), arr[i + 5 : i + 7])


@pytest.mark.parametrize("target", [5, 37, 100, 1])
def test_resample_linear(spark, target):
    arr = np.sin(np.linspace(0, 6, 23))
    df = make_long(spark, {"s": arr})
    out = resample(df, target, "linear").orderBy("ts").collect()
    expected = ref_resample_linear(arr, target) if target > 1 else arr[:1]
    np.testing.assert_allclose([r.value for r in out], expected, rtol=1e-12)


@pytest.mark.parametrize("target", [5, 37, 100])
def test_resample_nearest(spark, target):
    arr = np.cos(np.linspace(0, 4, 19))
    df = make_long(spark, {"s": arr})
    out = resample(df, target, "nearest").orderBy("ts").collect()
    np.testing.assert_allclose(
        [r.value for r in out], ref_resample_nearest(arr, target), rtol=0
    )


def test_resample_cubic_recovers_cubic_poly(spark):
    # A global cubic polynomial is reproduced exactly by not-a-knot splines.
    x = np.linspace(0, 1, 12)
    arr = 2 * x**3 - 3 * x**2 + 0.5 * x + 1
    df = make_long(spark, {"s": arr})
    out = resample(df, 31, "cubic").orderBy("ts").collect()
    xn = np.linspace(0, 1, 31)
    expected = 2 * xn**3 - 3 * xn**2 + 0.5 * xn + 1
    np.testing.assert_allclose([r.value for r in out], expected, rtol=1e-9, atol=1e-9)


def test_cubic_spline_interpolates_knots():
    x = np.linspace(0, 1, 9)
    y = np.random.default_rng(5).normal(0, 1, 9)
    out = cubic_spline_eval(x, y, x)
    np.testing.assert_allclose(out, y, rtol=1e-9, atol=1e-9)


def test_spline_upsample_linear_degree(spark):
    arr = np.array([0.0, 1.0, 4.0, 9.0, 16.0])
    df = make_long(spark, {"s": arr})
    out = spline_upsample(df, 9, spline_degree=1).orderBy("ts").collect()
    np.testing.assert_allclose([r.value for r in out], ref_resample_linear(arr, 9), rtol=1e-12)


@pytest.mark.parametrize(
    "arr,thr",
    [
        (np.zeros(10), 10.0),
        (np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 2.0]), 10.0),
        (np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 2.0]), 20.0),
        (np.array([1, 1, 2, 2, 3.0]), 10.0),  # tie between 1 and 2 -> 1 (value ASC)
        (np.array([0, 5, 5, 7, 7, 7, 0, 0.0]), 50.0),
    ],
)
def test_failure_encode(spark, arr, thr):
    df = make_long(spark, {"s": arr})
    row = failure_encode(df, thr).collect()[0]
    assert row.fail_code == ref_failure_encode(arr, thr)


# ---------------- smoothing spline (Reinsch, FITPACK s>0 contract) ----------


def test_smoothing_spline_rss_matches_s():
    # The defining property: residual sum of squares at the knots equals s.
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    rng = np.random.default_rng(7)
    x = np.linspace(0, 1, 200)
    y = np.sin(2 * np.pi * x) + rng.normal(0, 0.3, 200)
    for s in (0.5, 2.0, 8.0):
        f = smoothing_spline_eval(x, y, s, x)
        rss = float(np.sum((y - f) ** 2))
        assert abs(rss - s) < 1e-6 * max(s, 1.0), (s, rss)


def test_smoothing_spline_large_s_is_least_squares_line():
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    rng = np.random.default_rng(11)
    x = np.linspace(0, 2, 50)
    y = 3.0 * x - 1.0 + rng.normal(0, 0.1, 50)
    slope, intercept = np.polyfit(x, y, 1)
    x_new = np.linspace(0, 2, 17)
    out = smoothing_spline_eval(x, y, 1e6, x_new)
    np.testing.assert_allclose(out, slope * x_new + intercept, rtol=1e-10, atol=1e-10)


def test_smoothing_spline_tiny_s_approaches_interpolation():
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    rng = np.random.default_rng(13)
    x = np.linspace(0, 1, 40)
    y = rng.normal(0, 1, 40)
    f = smoothing_spline_eval(x, y, 1e-10, x)
    np.testing.assert_allclose(f, y, atol=2e-5)


def test_smoothing_spline_denoises_toward_truth():
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    rng = np.random.default_rng(17)
    x = np.linspace(0, 1, 400)
    truth = np.sin(2 * np.pi * x)
    noise = rng.normal(0, 0.25, 400)
    y = truth + noise
    # s at the noise energy level: the classic choice s ~ n * sigma^2
    f = smoothing_spline_eval(x, y, 400 * 0.25**2, x)
    assert np.mean((f - truth) ** 2) < 0.2 * np.mean((y - truth) ** 2)


def test_smoothing_spline_s_zero_is_interpolating_spline():
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    x = np.linspace(0, 1, 9)
    y = np.random.default_rng(5).normal(0, 1, 9)
    x_new = np.linspace(0, 1, 31)
    np.testing.assert_allclose(
        smoothing_spline_eval(x, y, 0.0, x_new), cubic_spline_eval(x, y, x_new), rtol=1e-12
    )


def test_smoothing_spline_small_n():
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    # n=3: pentadiagonal system degenerates to 1x1; must still honor RSS==s
    x = np.array([0.0, 0.5, 1.0])
    y = np.array([0.0, 1.0, 0.0])
    f = smoothing_spline_eval(x, y, 0.1, x)
    assert abs(float(np.sum((y - f) ** 2)) - 0.1) < 1e-8
    # n=2 falls back to linear interpolation
    np.testing.assert_allclose(
        smoothing_spline_eval([0.0, 1.0], [1.0, 3.0], 5.0, [0.5]), [2.0]
    )


def test_spline_upsample_smoothing_spark(spark):
    rng = np.random.default_rng(23)
    arrs = {f"s{i}": np.sin(np.linspace(0, 6, 120)) + rng.normal(0, 0.2, 120) for i in range(3)}
    df = make_long(spark, arrs)
    out = spline_upsample(df, 200, spline_degree=3, smoothing=1.5).collect()
    assert len(out) == 3 * 200
    by_series = {}
    for r in out:
        by_series.setdefault(r.series_id, []).append((r.ts, r.value))
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    for sid, rows in by_series.items():
        rows.sort()
        got = np.array([v for _, v in rows])
        x = np.linspace(0, 1, 120)
        expect = smoothing_spline_eval(x, arrs[sid], 1.5, np.linspace(0, 1, 200))
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)
