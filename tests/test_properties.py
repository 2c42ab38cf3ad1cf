"""Property-based tests (SURVEY.md §5.3) — hypothesis drives the NumPy golden
kernels and, for a sampled subset, the Spark operators themselves (Spark round
trips are expensive, so the heavy properties run on the kernels that the
parity suite already ties to Spark)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from .reference_kernels import (
    ref_failure_encode,
    ref_minmax_scale,
    ref_moving_average,
    ref_robust_scale,
    ref_segment_starts,
    ref_standard_scale,
)

finite_series = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=200,
)


@given(finite_series)
@settings(max_examples=200, deadline=None)
def test_standard_scale_invariants(xs):
    arr = np.asarray(xs, dtype=np.float64)
    out = ref_standard_scale(arr)
    centered = arr - arr.mean()
    s_c = np.std(centered)
    if s_c == 0:
        # constant after centering: the kernel skips the divide by design
        np.testing.assert_array_equal(out, centered)
        return
    if s_c < 1e-12 * max(1.0, np.abs(arr).max()):
        # spread is rounding noise relative to magnitude; scaling amplifies
        # ulp-level residuals, so only finiteness is meaningful here
        assert np.all(np.isfinite(out))
        return
    assert abs(out.mean()) < 1e-6
    assert abs(np.std(out) - 1.0) < 1e-6


@given(finite_series)
@settings(max_examples=200, deadline=None)
def test_minmax_bounds_and_constant_midpoint(xs):
    out = ref_minmax_scale(np.array(xs), -2.0, 4.0)
    if np.max(xs) == np.min(xs):
        assert np.all(out == 1.0)  # midpoint of (-2, 4)
    else:
        assert out.min() >= -2.0 - 1e-9 and out.max() <= 4.0 + 1e-9
        assert abs(out.min() - (-2.0)) < 1e-9 and abs(out.max() - 4.0) < 1e-9


@given(finite_series)
@settings(max_examples=200, deadline=None)
def test_robust_scale_median_zero(xs):
    arr = np.asarray(xs, dtype=np.float64)
    centered = arr - np.median(arr)
    iqr = np.percentile(centered, 75) - np.percentile(centered, 25)
    if 0 < iqr < 1e-300 or (iqr > 0 and iqr <= 1e-12 * np.max(np.abs(arr))):
        # pathological spreads: denormal IQR overflows the division to inf,
        # and an IQR at ULP scale relative to the data magnitude means
        # centering cancels catastrophically (median of an even-length pair
        # rounds to an endpoint, e.g. [1e6, 1e6 - 1e-10]) — the reference
        # kernel inherits the same float behavior, so no invariant holds
        return
    out = ref_robust_scale(arr)
    assert abs(np.median(out)) < 1e-9


@given(finite_series, st.integers(1, 20))
@settings(max_examples=200, deadline=None)
def test_moving_average_valid_length(xs, W):
    out = ref_moving_average(np.array(xs), W, pad_with_zeros=False)
    n = len(xs)
    assert len(out) == (n if n < W else n - W + 1)
    padded = ref_moving_average(np.array(xs), W, pad_with_zeros=True)
    assert len(padded) == n
    # averages stay within data bounds
    assert padded.min() >= min(xs) - 1e-9 and padded.max() <= max(xs) + 1e-9


@given(
    st.integers(1, 100), st.integers(1, 30), st.integers(1, 10), st.booleans()
)
@settings(max_examples=300, deadline=None)
def test_segment_start_arithmetic(n, W, step, drop_last):
    starts = ref_segment_starts(n, W, step, drop_last)
    if n < W:
        assert starts == []
        return
    regular = list(range(0, n - W + 1, step))
    assert starts[: len(regular)] == regular
    if drop_last:
        assert starts == regular
    else:
        # tail appears iff (n - last_regular - step) > 0, always starting n-W
        extra = starts[len(regular):]
        if (n - regular[-1] - step) > 0:
            assert extra == [n - W]
        else:
            assert extra == []


@given(
    st.lists(st.sampled_from([0.0, 1.0, 2.0, 3.0]), min_size=1, max_size=60),
    st.floats(min_value=0, max_value=100, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_failure_encode_threshold_semantics(xs, thr):
    code = ref_failure_encode(np.array(xs), thr)
    nz = [x for x in xs if x != 0]
    if not nz:
        assert code == 0.0
    elif 100.0 * len(nz) / len(xs) >= thr:
        assert code in nz  # mode is one of the nonzero values
    else:
        assert code == 0.0


# ---------------- smoothing spline + RK45 (pure NumPy kernels) --------------


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
        min_size=4,
        max_size=60,
    ),
    st.floats(min_value=1e-3, max_value=50.0),
)
@settings(max_examples=60, deadline=None)
def test_smoothing_spline_rss_never_exceeds_s(ys, s):
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    y = np.asarray(ys, dtype=np.float64)
    x = np.linspace(0.0, 1.0, len(y))
    f = smoothing_spline_eval(x, y, s, x)
    rss = float(np.sum((y - f) ** 2))
    # contract: RSS == s when the constraint binds, RSS < s when even the
    # LSQ line is smoother than requested; never (meaningfully) above s
    assert rss <= s * (1 + 1e-6) + 1e-9, (rss, s)
    assert np.all(np.isfinite(f))


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
        min_size=4,
        max_size=40,
    )
)
@settings(max_examples=40, deadline=None)
def test_smoothing_spline_huge_s_is_line(ys):
    from fdi_flow_spark.operators.segmenters import smoothing_spline_eval

    y = np.asarray(ys, dtype=np.float64)
    x = np.linspace(0.0, 1.0, len(y))
    slope, intercept = np.polyfit(x, y, 1)
    out = smoothing_spline_eval(x, y, 1e9, x)
    np.testing.assert_allclose(out, slope * x + intercept, rtol=1e-6, atol=1e-6)


@given(
    st.floats(min_value=-3.0, max_value=-0.05),
    st.floats(min_value=-5.0, max_value=5.0),
    st.floats(min_value=0.5, max_value=8.0),
)
@settings(max_examples=40, deadline=None)
def test_rk45_exponential_decay_inside_tolerance(lam, x0, tf):
    from fdi_flow_spark.models.systems import _rk45_path

    time = np.linspace(0.0, tf, 101)
    out = _rk45_path(lambda t, x: lam * x, np.array([x0]), time)
    exact = x0 * np.exp(lam * time)
    # default rtol=1e-3/atol=1e-6; allow accumulation over the horizon
    tol = 5e-3 * np.max(np.abs(exact)) + 5e-5
    assert np.max(np.abs(out[:, 0] - exact)) < tol


@given(st.floats(min_value=0.2, max_value=6.0), st.floats(min_value=-2.0, max_value=2.0))
@settings(max_examples=30, deadline=None)
def test_rk45_harmonic_oscillator_energy(w, x0):
    from fdi_flow_spark.models.systems import _rk45_path

    A = np.array([[0.0, 1.0], [-w * w, 0.0]])
    time = np.linspace(0.0, 4.0, 161)
    out = _rk45_path(lambda t, x: A @ x, np.array([x0, 0.0]), time, rtol=1e-8, atol=1e-10)
    exact = x0 * np.cos(w * time)
    np.testing.assert_allclose(out[:, 0], exact, atol=5e-5 * max(1.0, abs(x0)))


# ---------------------------------------------- drift-layer properties (r5c)

def _closed_form_cusum(x, k, target):
    """The distributed rewrite's reflected prefix sum, as NumPy."""
    d = x - target - k
    c = np.cumsum(d)
    pos = c - np.minimum(0.0, np.minimum.accumulate(c))
    dn = target - x - k
    cn = np.cumsum(dn)
    neg = cn - np.minimum(0.0, np.minimum.accumulate(cn))
    return pos, neg


def _recursive_cusum(x, k, target):
    sp = sn = 0.0
    pos, neg = [], []
    for v in x:
        sp = max(0.0, sp + (v - target - k))
        sn = max(0.0, sn + (target - v - k))
        pos.append(sp)
        neg.append(sn)
    return np.array(pos), np.array(neg)


@given(
    finite_series,
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_cusum_reflection_identity(xs, k, target):
    """The prefix-sum rewrite the Spark cusum operator uses equals the
    textbook max(0, .) recursion on arbitrary finite input — the identity
    the whole distributed formulation rests on."""
    x = np.asarray(xs, dtype=np.float64)
    cp, cn = _closed_form_cusum(x, k, target)
    rp, rn = _recursive_cusum(x, k, target)
    scale = max(1.0, np.abs(x).max() + abs(target) + k)
    np.testing.assert_allclose(cp, rp, atol=1e-7 * scale * max(1, len(x)))
    np.testing.assert_allclose(cn, rn, atol=1e-7 * scale * max(1, len(x)))
    assert (cp >= -1e-9 * scale).all() and (cn >= -1e-9 * scale).all()


def _session_ids(ts_sorted, gap):
    sid, out, prev = 0, [], None
    for t in ts_sorted:
        if prev is not None and t - prev > gap:
            sid += 1
        out.append(sid)
        prev = t
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=100),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=200, deadline=None)
def test_sessionize_conditional_cumsum_invariants(ts_list, gap):
    """Session ids are a nondecreasing 0-based sequence; ids increment
    exactly at gaps > threshold; equal timestamps always share a session —
    the invariants the Spark conditional-cumsum kernel and its tie
    insensitivity rely on."""
    ts = sorted(ts_list)
    ids = _session_ids(ts, gap)
    assert ids[0] == 0
    for (t0, i0), (t1, i1) in zip(zip(ts, ids), zip(ts[1:], ids[1:])):
        assert i1 - i0 in (0, 1)
        assert (i1 == i0 + 1) == (t1 - t0 > gap)
        if t1 == t0:
            assert i1 == i0
