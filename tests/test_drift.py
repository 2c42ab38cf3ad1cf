"""Drift/change-detection and series-analytics operator tests.

Golden twins are sequential NumPy recursions written from the published
definitions (Page 1954 CUSUM, Page-Hinkley, Iglewicz & Hoaglin modified
z-score, statsmodels seasonal_decompose semantics) — NOT the closed forms
the Spark operators use, so each test also proves the prefix-sum identity
the distributed rewrite relies on.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fdi_flow_spark.operators import (
    changepoint_scan,
    cross_corr_pairs,
    cusum,
    gap_fill,
    mad_outliers,
    page_hinkley,
    seasonal_decompose,
    series_acf,
    time_bucket_rollup,
)
from tests.conftest import make_long


# ------------------------------------------------------- sequential twins

def seq_cusum(x, k, target):
    sp = sn = 0.0
    out = []
    for v in x:
        sp = max(0.0, sp + (v - target - k))
        sn = max(0.0, sn + (target - v - k))
        out.append((sp, sn))
    return np.array(out)


def seq_page_hinkley(x, delta):
    m = 0.0
    mmin = np.inf
    csum = 0.0
    out = []
    for i, v in enumerate(x):
        csum += v
        rm = csum / (i + 1)
        m += v - rm - delta
        mmin = min(mmin, m)
        out.append(m - mmin)
    return np.array(out)


def seq_changepoint(x, min_size):
    n = len(x)
    best = (-1.0, None)
    for t in range(min_size, n - min_size + 1):  # prefix length
        ml, mr = x[:t].mean(), x[t:].mean()
        stat = np.sqrt(t * (n - t) / n) * abs(ml - mr)
        if stat > best[0] + 1e-15:
            best = (stat, t - 1)  # 0-based last row of left segment
    return best


def collect_sorted(df, cols):
    return df.toPandas().sort_values(cols).reset_index(drop=True)


# ---------------------------------------------------------------- cusum

def test_cusum_matches_sequential_recursion(spark):
    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(0, 1, 60), rng.normal(3, 1, 40)])
    df = make_long(spark, {"s": x})
    out = collect_sorted(cusum(df, k=0.5, h=8.0, target=0.0), ["ts"])
    ref = seq_cusum(x, 0.5, 0.0)
    np.testing.assert_allclose(out["cusum_pos"].to_numpy(), ref[:, 0], atol=1e-9)
    np.testing.assert_allclose(out["cusum_neg"].to_numpy(), ref[:, 1], atol=1e-9)
    # The shift at i=60 must alarm on the positive side and stay quiet before
    # (this seed's noise walks the negative side up to ~5.9, hence h=8).
    alarms = out["alarm"].to_numpy()
    assert not alarms[:55].any()
    assert alarms[65:].all()


def test_cusum_default_target_is_series_mean(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(5, 1, 80)
    df = make_long(spark, {"s": x})
    out = collect_sorted(cusum(df, k=0.5, h=4.0), ["ts"])
    ref = seq_cusum(x, 0.5, x.mean())
    np.testing.assert_allclose(out["cusum_pos"].to_numpy(), ref[:, 0], atol=1e-9)


def test_cusum_two_series_independent(spark):
    rng = np.random.default_rng(11)
    xs = {"a": rng.normal(0, 1, 50), "b": np.concatenate([np.zeros(25), np.ones(25) * 9])}
    df = make_long(spark, xs)
    out = cusum(df, k=0.5, h=5.0, target=0.0).toPandas()
    for sid, x in xs.items():
        g = out[out.series_id == sid].sort_values("ts")
        ref = seq_cusum(x, 0.5, 0.0)
        np.testing.assert_allclose(g["cusum_pos"].to_numpy(), ref[:, 0], atol=1e-9)


# --------------------------------------------------------- page-hinkley

def test_page_hinkley_matches_sequential(spark):
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 1, 70), rng.normal(4, 1, 30)])
    df = make_long(spark, {"s": x})
    out = collect_sorted(page_hinkley(df, delta=0.005, lam=20.0), ["ts"])
    ref = seq_page_hinkley(x, 0.005)
    np.testing.assert_allclose(out["ph_stat"].to_numpy(), ref, atol=1e-9)
    assert out["alarm"].to_numpy()[-1]
    assert not out["alarm"].to_numpy()[:60].any()


# ----------------------------------------------------- changepoint scan

def test_changepoint_finds_planted_shift(spark):
    rng = np.random.default_rng(9)
    x = np.concatenate([rng.normal(0, 0.5, 40), rng.normal(2.5, 0.5, 60)])
    df = make_long(spark, {"s": x})
    row = changepoint_scan(df, min_size=5).collect()[0]
    stat, cp = seq_changepoint(x, 5)
    assert row["cp_ts"] == cp
    assert abs(row["stat"] - stat) < 1e-9
    assert 35 <= row["cp_ts"] <= 43  # the plant is at index 39


def test_changepoint_tie_breaks_earliest(spark):
    # Symmetric two-level square wave: scan stat has plateaus; earliest wins.
    x = np.array([0.0] * 10 + [1.0] * 10)
    df = make_long(spark, {"s": x})
    row = changepoint_scan(df, min_size=2).collect()[0]
    stat, cp = seq_changepoint(x, 2)
    assert row["cp_ts"] == cp == 9


# --------------------------------------------------------- mad outliers

def test_mad_outliers_matches_numpy(spark):
    rng = np.random.default_rng(13)
    x = rng.normal(0, 1, 101)
    x[17] = 30.0
    x[60] = -25.0
    df = make_long(spark, {"s": x})
    out = collect_sorted(mad_outliers(df, threshold=3.5), ["ts"])
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    z = 0.6745 * (x - med) / mad
    np.testing.assert_allclose(out["mod_z"].to_numpy(), z, atol=1e-9)
    flagged = set(out[out["outlier"]]["ts"])
    assert {17, 60} <= flagged


def test_mad_constant_series_no_outliers(spark):
    df = make_long(spark, {"s": np.full(20, 3.0)})
    out = mad_outliers(df).toPandas()
    assert (out["mod_z"] == 0).all()
    assert not out["outlier"].any()


# ------------------------------------------------------------------ acf

def test_acf_matches_numpy_estimator(spark):
    rng = np.random.default_rng(21)
    t = np.arange(200)
    x = np.sin(2 * np.pi * t / 20) + rng.normal(0, 0.2, 200)
    df = make_long(spark, {"s": x})
    out = collect_sorted(series_acf(df, max_lag=6), ["lag"])
    xc = x - x.mean()
    den = (xc * xc).sum()
    for _, r in out.iterrows():
        k = int(r["lag"])
        num = (xc[:-k] * xc[k:]).sum()
        assert abs(r["acf"] - num / den) < 1e-9
        assert r["n_pairs"] == 200 - k
    # A 20-sample sine has strong positive acf near lag 1..3.
    assert out.loc[out["lag"] == 1, "acf"].iloc[0] > 0.8


# ------------------------------------------------------- cross correlation

def test_cross_corr_pairs(spark):
    rng = np.random.default_rng(31)
    base = rng.normal(0, 1, 150)
    xs = {"a": base, "b": base * 2 + rng.normal(0, 0.1, 150), "c": rng.normal(0, 1, 150)}
    df = make_long(spark, xs)
    out = cross_corr_pairs(df).toPandas().set_index(["series_a", "series_b"])
    ab = out.loc[("a", "b")]
    assert ab["n"] == 150
    assert abs(ab["corr"] - np.corrcoef(xs["a"], xs["b"])[0, 1]) < 1e-9
    assert abs(out.loc[("a", "c")]["corr"]) < 0.3
    # pairs are ordered and unique
    assert len(out) == 3


def test_cross_corr_pairs_bounded_by_pair_list(spark):
    """The `pairs` escape hatch (r5 VERDICT): only listed pairs
    materialize, values identical to the all-pairs path."""
    rng = np.random.default_rng(32)
    xs = {k: rng.normal(0, 1, 80) for k in "abcd"}
    df = make_long(spark, xs)
    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "series_a string, series_b string"
    )
    out = cross_corr_pairs(df, pairs=pairs).toPandas().set_index(
        ["series_a", "series_b"]
    )
    assert set(out.index) == {("a", "b"), ("c", "d")}
    full = cross_corr_pairs(df).toPandas().set_index(["series_a", "series_b"])
    for key in out.index:
        assert abs(out.loc[key]["corr"] - full.loc[key]["corr"]) < 1e-12
        assert out.loc[key]["n"] == full.loc[key]["n"]


def test_cross_corr_pairs_bounded_by_group(spark):
    """The `group_col` escape hatch: pairs form only within a group, and
    the group column rides through the output."""
    rng = np.random.default_rng(33)
    xs = {k: rng.normal(0, 1, 60) for k in "abcd"}
    df = make_long(spark, xs).withColumn(
        "plant", F.when(F.col("series_id").isin("a", "b"), "p1").otherwise("p2")
    )
    out = cross_corr_pairs(df, group_col="plant").toPandas()
    assert set(zip(out["series_a"], out["series_b"])) == {("a", "b"), ("c", "d")}
    assert set(out["plant"]) == {"p1", "p2"}
    full = cross_corr_pairs(df.drop("plant")).toPandas().set_index(
        ["series_a", "series_b"]
    )
    got = out.set_index(["series_a", "series_b"])
    for key in got.index:
        assert abs(got.loc[key]["corr"] - full.loc[key]["corr"]) < 1e-12


def test_rolling_corr_pairs_bounded_paths_match_full(spark):
    from fdi_flow_spark.operators import rolling_corr_pairs

    rng = np.random.default_rng(34)
    xs = {k: rng.normal(0, 1, 50) for k in "abc"}
    df = make_long(spark, xs)
    full = (
        rolling_corr_pairs(df, window=10)
        .toPandas()
        .set_index(["series_a", "series_b", "ts"])
        .sort_index()
    )
    pairs = spark.createDataFrame([("a", "c")], "series_a string, series_b string")
    sub = (
        rolling_corr_pairs(df, window=10, pairs=pairs)
        .toPandas()
        .set_index(["series_a", "series_b", "ts"])
        .sort_index()
    )
    assert set(sub.index.droplevel("ts")) == {("a", "c")}
    sel = full.reset_index()
    sel = (
        sel[(sel["series_a"] == "a") & (sel["series_b"] == "c")]
        .set_index(["series_a", "series_b", "ts"])
        .sort_index()
    )
    pd.testing.assert_frame_equal(sub, sel)


def test_pair_list_canonicalization_property(spark):
    """r7-ADVICE pin: messy pair lists — reversed rows, (a,b)+(b,a)
    double-listing, duplicated rows, degenerate (x,x) — must yield the
    SAME result as the clean canonical list (folded, deduped, self-pairs
    dropped), never doubled co-moment sums or silent drops. Property runs
    over several seeded shuffles of the mess."""
    from fdi_flow_spark.operators import rolling_corr_pairs

    rng = np.random.default_rng(35)
    xs = {k: rng.normal(0, 1, 60) for k in "abc"}
    df = make_long(spark, xs)
    clean = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "series_a string, series_b string"
    )

    def run(op, pairs_df):
        cols = ["series_a", "series_b"] + (
            ["ts"] if op is rolling_corr_pairs else []
        )
        return op(df, pairs=pairs_df).toPandas().set_index(cols).sort_index()

    for op in (cross_corr_pairs, rolling_corr_pairs):
        want = run(op, clean)
        mess_rows = [
            ("b", "a"),  # reversed — must fold, not drop
            ("a", "b"),  # duplicate of the fold target
            ("a", "c"),
            ("c", "a"),  # double-listed other way round
            ("b", "b"),  # degenerate
        ]
        for seed in (0, 1, 2):
            shuffled = list(mess_rows)
            np.random.default_rng(seed).shuffle(shuffled)
            mess = spark.createDataFrame(
                shuffled, "series_a string, series_b string"
            )
            got = run(op, mess)
            pd.testing.assert_frame_equal(got, want)


# --------------------------------------------------------------- gap fill

def test_gap_fill_linear_matches_pandas(spark):
    x = np.array([1.0, np.nan, np.nan, 4.0, 5.0, np.nan, 7.0])
    rows = [("s", i, None if np.isnan(v) else float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, schema="series_id string, ts long, value double")
    out = collect_sorted(gap_fill(df, "linear"), ["ts"])
    ref = pd.Series(x).interpolate(limit_direction="both").to_numpy()
    np.testing.assert_allclose(out["value"].to_numpy(), ref, atol=1e-12)
    assert list(out["filled"]) == [False, True, True, False, False, True, False]


def test_gap_fill_edges_and_ffill(spark):
    x = [None, None, 2.0, None, 6.0, None]
    rows = [("s", i, v) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, schema="series_id string, ts long, value double")
    lin = collect_sorted(gap_fill(df, "linear"), ["ts"])["value"].to_numpy()
    np.testing.assert_allclose(lin, [2.0, 2.0, 2.0, 4.0, 6.0, 6.0])
    ff = collect_sorted(gap_fill(df, "ffill"), ["ts"])["value"].to_numpy()
    np.testing.assert_allclose(ff, [2.0, 2.0, 2.0, 2.0, 6.0, 6.0])


# ------------------------------------------------------------ time bucket

def test_time_bucket_rollup(spark):
    x = np.arange(25, dtype=float)
    df = make_long(spark, {"s": x})
    out = collect_sorted(time_bucket_rollup(df, width=10), ["bucket"])
    assert list(out["bucket"]) == [0, 10, 20]
    assert list(out["n"]) == [10, 10, 5]
    np.testing.assert_allclose(out["avg_value"], [4.5, 14.5, 22.0])
    np.testing.assert_allclose(out["first_value"], [0.0, 10.0, 20.0])
    np.testing.assert_allclose(out["last_value"], [9.0, 19.0, 24.0])


# ----------------------------------------------------- seasonal decompose

def naive_seasonal_decompose(x, period):
    """statsmodels.seasonal_decompose(model='additive') re-derived."""
    n = len(x)
    half = period // 2
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        if period % 2 == 0:
            w = np.ones(period + 1)
            w[0] = w[-1] = 0.5
            trend[i] = (x[i - half : i + half + 1] * w).sum() / period
        else:
            trend[i] = x[i - half : i + half + 1].mean()
    detrended = x - trend
    pm = np.array([np.nanmean(detrended[p::period]) for p in range(period)])
    seasonal_base = pm - pm.mean()
    seasonal = np.array([seasonal_base[i % period] for i in range(n)])
    return trend, seasonal, x - trend - seasonal


@pytest.mark.parametrize("period", [4, 7])
def test_seasonal_decompose_matches_statsmodels_semantics(spark, period):
    rng = np.random.default_rng(17)
    t = np.arange(90)
    x = 0.05 * t + np.tile(rng.normal(0, 1, period), 90 // period + 1)[:90]
    df = make_long(spark, {"s": x})
    out = collect_sorted(seasonal_decompose(df, period), ["ts"])
    trend, seasonal, resid = naive_seasonal_decompose(x, period)
    np.testing.assert_allclose(
        out["trend"].to_numpy(dtype=float), trend, atol=1e-9, equal_nan=True
    )
    np.testing.assert_allclose(out["seasonal"].to_numpy(), seasonal, atol=1e-9)
    np.testing.assert_allclose(
        out["resid"].to_numpy(dtype=float), resid, atol=1e-9, equal_nan=True
    )
    # The seasonal component sums to ~0 over one period.
    assert abs(out["seasonal"].to_numpy()[:period].sum()) < 1e-9


# --------------------------------------------------------- series profile

def test_series_profile_matches_scipy_free_numpy(spark):
    rng = np.random.default_rng(41)
    x = rng.gamma(2.0, 10.0, 300)  # right-skewed on purpose
    from fdi_flow_spark.operators import series_profile

    df = make_long(spark, {"s": x, "const": np.full(10, 2.0)})
    out = series_profile(df).toPandas().set_index("series_id")
    r = out.loc["s"]
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    assert r["n"] == 300 and r["n_distinct"] == len(np.unique(x))
    assert abs(r["mean"] - mu) < 1e-9
    assert abs(r["std_pop"] - np.sqrt(m2)) < 1e-9
    assert abs(r["skewness"] - m3 / m2**1.5) < 1e-8
    assert abs(r["kurtosis"] - m4 / m2**2) < 1e-8
    assert r["skewness"] > 0.5  # gamma(2) is right-skewed
    c = out.loc["const"]
    assert c["std_pop"] == 0.0
    assert c["skewness"] is None or np.isnan(c["skewness"])
    assert c["n_distinct"] == 1


# ----------------------------------------------- structural invariants

def test_cusum_invariants_random(spark):
    """CUSUM statistics are nonnegative; alarms are monotone in h; the
    reflection identity holds on adversarial (heavily negative) input."""
    rng = np.random.default_rng(99)
    x = np.concatenate([rng.normal(-5, 3, 50), rng.normal(5, 3, 50)])
    df = make_long(spark, {"s": x})
    lo = cusum(df, k=0.1, h=2.0, target=0.0).toPandas().sort_values("ts")
    hi = cusum(df, k=0.1, h=20.0, target=0.0).toPandas().sort_values("ts")
    assert (lo["cusum_pos"] >= -1e-12).all() and (lo["cusum_neg"] >= -1e-12).all()
    # same statistics regardless of h; alarms only shrink as h grows
    np.testing.assert_array_equal(lo["cusum_pos"].to_numpy(), hi["cusum_pos"].to_numpy())
    assert (hi["alarm"] <= lo["alarm"]).all()
    ref = seq_cusum(x, 0.1, 0.0)
    np.testing.assert_allclose(lo["cusum_pos"].to_numpy(), ref[:, 0], atol=1e-9)
    np.testing.assert_allclose(lo["cusum_neg"].to_numpy(), ref[:, 1], atol=1e-9)


def test_gap_fill_identity_on_complete_series(spark):
    rng = np.random.default_rng(55)
    x = rng.normal(0, 1, 60)
    df = make_long(spark, {"s": x})
    out = collect_sorted(gap_fill(df, "linear"), ["ts"])
    np.testing.assert_array_equal(out["value"].to_numpy(), x)
    assert not out["filled"].any()


def test_seasonal_decompose_reconstructs_value(spark):
    rng = np.random.default_rng(77)
    x = rng.normal(10, 2, 80)
    df = make_long(spark, {"s": x})
    out = collect_sorted(seasonal_decompose(df, 8), ["ts"])
    mid = out.dropna(subset=["trend"])
    np.testing.assert_allclose(
        mid["trend"] + mid["seasonal"] + mid["resid"], mid["value"], atol=1e-9
    )


# ----------------------------------------------------------- sessionize

def test_sessionize_gap_boundaries_and_stats(spark):
    from fdi_flow_spark.operators import session_stats, sessionize

    rows = [
        ("u1", 0), ("u1", 10), ("u1", 50),      # session 0
        ("u1", 200), ("u1", 210),               # session 1 (gap 150 > 100)
        ("u1", 1000),                           # session 2
        ("u2", 5),                              # separate key
    ]
    df = spark.createDataFrame(rows, schema="user_id string, t long")
    s = sessionize(df, "user_id", "t", max_gap=100).toPandas()
    sid = {(r.user_id, r.t): r.session_id for r in s.itertuples()}
    assert [sid[("u1", t)] for t in (0, 10, 50, 200, 210, 1000)] == [0, 0, 0, 1, 1, 2]
    assert sid[("u2", 5)] == 0
    st = (
        session_stats(df, "user_id", "t", max_gap=100)
        .toPandas()
        .set_index(["user_id", "session_id"])
        .sort_index()
    )
    assert st.loc[("u1", 0)]["n_events"] == 3
    assert st.loc[("u1", 0)]["duration"] == 50
    assert st.loc[("u1", 2)]["n_events"] == 1
    assert st.loc[("u1", 2)]["duration"] == 0


def test_sessionize_tie_rows_order_insensitive(spark):
    """Rows with equal timestamps land in the same session regardless of
    their arbitrary peer order (the conditional-cumsum invariance the
    oracle relies on) — exercised under different partition layouts."""
    from fdi_flow_spark.operators import sessionize

    rows = [("u", 0), ("u", 500), ("u", 500), ("u", 500), ("u", 600)]
    base = spark.createDataFrame(rows, schema="user_id string, t long")
    expected = {0: 0, 500: 1, 600: 1}
    for parts in (1, 3, 5):
        out = sessionize(base.repartition(parts), "user_id", "t", max_gap=100)
        got = out.toPandas()
        for r in got.itertuples():
            assert r.session_id == expected[r.t], (parts, r)


# ------------------------------------------------------- pattern search

def naive_pattern_search(x, q, k):
    q = np.asarray(q, float)
    qz = (q - q.mean()) / q.std()
    m = len(q)
    out = []
    for i in range(len(x) - m + 1):
        w = x[i : i + m]
        sig = w.std()
        if sig == 0:
            continue
        wz = (w - w.mean()) / sig
        out.append((i, float(np.sqrt(max(0.0, ((qz - wz) ** 2).sum())))))
    out.sort(key=lambda t: (round(t[1], 9), t[0]))
    return out[:k]


def test_pattern_search_matches_naive_and_finds_plant(spark):
    from fdi_flow_spark.operators import pattern_search

    rng = np.random.default_rng(61)
    x = rng.normal(0, 1, 300)
    sig = np.array([0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0])  # spike shape
    x[100:108] = sig * 4 + 0.5          # planted scaled+shifted copy
    x[200:208] = sig * -2               # inverted copy (should NOT match)
    df = make_long(spark, {"s": x})
    got = (
        pattern_search(df, sig, k=3)
        .toPandas()
        .sort_values("dist")
        .reset_index(drop=True)
    )
    ref = naive_pattern_search(x, sig, 3)
    assert list(got["start_ts"]) == [i for i, _ in ref]
    np.testing.assert_allclose(got["dist"].to_numpy(), [d for _, d in ref], atol=1e-9)
    # z-normalization makes the scaled+shifted plant an (almost) exact match
    assert got.loc[0, "start_ts"] == 100
    assert got.loc[0, "dist"] < 1e-6


def test_pattern_search_excludes_flat_windows_and_validates(spark):
    from fdi_flow_spark.operators import pattern_search

    x = np.concatenate([np.full(20, 5.0), [5.0, 6.0, 7.0, 6.0], np.full(20, 5.0)])
    df = make_long(spark, {"s": x})
    out = pattern_search(df, [0.0, 1.0, 2.0, 1.0], k=2).toPandas()
    assert (out["dist"] >= 0).all()
    assert out.iloc[0]["start_ts"] == 20  # the only structured window wins
    with pytest.raises(ValueError):
        pattern_search(df, [1.0, 1.0, 1.0], k=2)  # constant query


# ----------------------------------------------------- spectral features

def test_spectral_features_golden(spark):
    from fdi_flow_spark.operators import spectral_features
    from fdi_flow_spark.operators.spectral import spectral_features_numpy

    rng = np.random.default_rng(71)
    t = np.arange(256)
    sine = np.sin(2 * np.pi * 8 * t / 64)          # 8 cycles per 64-window
    noise = rng.normal(0, 1, 256)
    df = make_long(spark, {"sine": sine, "noise": noise, "flat": np.full(256, 2.0)})
    out = spectral_features(df, window_size=64, step=64, sample_rate=64.0, n_bands=4)
    pdf = out.toPandas().sort_values(["series_id", "window_id"]).reset_index(drop=True)

    # golden: same windows through the numpy kernel directly
    for sid, x in {"sine": sine, "noise": noise}.items():
        mat = np.stack([x[i : i + 64] for i in range(0, 193, 64)])
        ref = spectral_features_numpy(mat, 64.0, 4)
        g = pdf[pdf.series_id == sid]
        np.testing.assert_allclose(
            np.stack(g["band_energy"].to_numpy()), ref["band_energy"], atol=1e-9
        )
        np.testing.assert_allclose(g["dominant_freq"], ref["dominant_freq"], atol=1e-9)
        np.testing.assert_allclose(g["spectral_entropy"], ref["spectral_entropy"], atol=1e-9)

    s = pdf[pdf.series_id == "sine"].iloc[0]
    assert abs(s["dominant_freq"] - 8.0) < 1e-9        # 8 Hz at sr=64, W=64
    assert s["spectral_entropy"] < 0.1                 # pure tone: low entropy
    assert abs(sum(s["band_energy"]) - 1.0) < 1e-9
    n = pdf[pdf.series_id == "noise"].iloc[0]
    assert n["spectral_entropy"] > 0.6                 # broadband: high entropy
    f = pdf[pdf.series_id == "flat"].iloc[0]
    assert f["total_power"] == 0.0 and sum(f["band_energy"]) == 0.0


def test_seasonal_decompose_short_series_nulls(spark):
    """A series shorter than one period cannot center a full phase set —
    seasonal (and hence resid) must be null, not silently mis-centered."""
    df = make_long(spark, {"s": np.arange(5.0)})
    out = seasonal_decompose(df, 8).toPandas()
    assert out["seasonal"].isna().all()
    assert out["trend"].isna().all()


def test_rolling_corr_pairs_matches_pandas(spark):
    from fdi_flow_spark.operators import rolling_corr_pairs

    rng = np.random.default_rng(83)
    n = 120
    base = np.sin(np.arange(n) / 5.0)
    xs = {
        "a": base + rng.normal(0, 0.1, n),
        # b tracks a for 60 samples then breaks (decorrelation event)
        "b": np.concatenate([base[:60] + rng.normal(0, 0.1, 60), rng.normal(0, 1, 60)]),
    }
    df = make_long(spark, xs)
    out = (
        rolling_corr_pairs(df, window=20)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    ref = (
        pd.Series(xs["a"]).rolling(20).corr(pd.Series(xs["b"])).to_numpy()
    )
    got = out["corr"].to_numpy(dtype=float)
    assert np.isnan(got[:19]).all()  # incomplete windows -> null
    np.testing.assert_allclose(got[19:], ref[19:], atol=1e-9)
    # healthy segment strongly correlated; broken segment decorrelated
    assert np.nanmin(got[25:55]) > 0.9
    assert abs(np.nanmean(got[95:])) < 0.5


def test_seasonal_incomplete_phase_coverage_nulls(spark):
    """period <= n < ~2*period: some phases have no valid trend rows, so
    centering over the full phase set is undefined — seasonal must be null
    everywhere (the statsmodels-twin NaN), never mis-centered."""
    x = np.zeros(10)
    x[4] = 10.0
    df = make_long(spark, {"s": x})
    out = seasonal_decompose(df, 8).toPandas()
    assert out["seasonal"].isna().all()


def test_time_bucket_negative_ts_floor_bins(spark):
    rows = [("s", t, 1.0) for t in (-15, -5, -1, 0, 5, 10)]
    df = spark.createDataFrame(rows, schema="series_id string, ts long, value double")
    out = {r["bucket"]: r["n"] for r in time_bucket_rollup(df, 10).collect()}
    assert out == {-20: 1, -10: 2, 0: 2, 10: 1}


def test_spectral_single_bin_entropy_zero(spark):
    from fdi_flow_spark.operators import spectral_features

    df = make_long(spark, {"s": np.array([1.0, 2.0, 1.5, 2.5])})
    out = spectral_features(df, window_size=2, step=2, n_bands=1).toPandas()
    assert len(out) == 2
    assert (out["spectral_entropy"] == 0.0).all()
    assert not out["spectral_entropy"].isna().any()


# ------------------------------------------------------- value histogram

def test_value_histogram_matches_numpy(spark):
    from fdi_flow_spark.operators.analytics import value_histogram

    rng = np.random.default_rng(91)
    x = rng.normal(10, 3, 500)
    df = make_long(spark, {"s": x, "const": np.full(7, 4.0)})
    out = value_histogram(df, bins=10).toPandas()
    g = out[out.series_id == "s"].sort_values("bin").reset_index(drop=True)
    ref_n, ref_edges = np.histogram(x, bins=10)
    assert list(g["n"]) == list(ref_n)
    np.testing.assert_allclose(g["bin_lo"], ref_edges[:-1], atol=1e-9)
    np.testing.assert_allclose(g["bin_hi"], ref_edges[1:], atol=1e-9)
    assert g["n"].sum() == 500
    c = out[out.series_id == "const"]
    assert len(c) == 1 and c.iloc[0]["n"] == 7 and c.iloc[0]["bin_lo"] == 4.0


def test_value_histogram_includes_empty_bins(spark):
    # bimodal: values only at the extremes -> middle bins exist with n=0
    x = np.concatenate([np.zeros(5), np.full(5, 100.0)])
    from fdi_flow_spark.operators.analytics import value_histogram

    df = make_long(spark, {"s": x})
    out = value_histogram(df, bins=10).toPandas().sort_values("bin")
    assert len(out) == 10
    assert list(out["n"]) == [5, 0, 0, 0, 0, 0, 0, 0, 0, 5]


# ------------------------------------------------------------------ pacf

def test_pacf_matches_yule_walker_solve(spark):
    """Independent golden: PACF at lag k = last coefficient of the
    Yule-Walker solve R_k phi = r_k (Toeplitz inversion), vs the
    operator's Durbin-Levinson recursion."""
    from fdi_flow_spark.operators import series_pacf

    rng = np.random.default_rng(101)
    n = 2000
    x = np.zeros(n)
    e = rng.normal(0, 1, n)
    for t in range(2, n):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + e[t]
    df = make_long(spark, {"s": x})
    out = collect_sorted(series_pacf(df, max_lag=5), ["lag"])

    xc = x - x.mean()
    den = (xc * xc).sum()
    r = np.array([1.0] + [(xc[:-k] * xc[k:]).sum() / den for k in range(1, 6)])
    for k in range(1, 6):
        R = np.array([[r[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(R, r[1 : k + 1])
        assert abs(out.loc[k - 1, "pacf"] - phi[-1]) < 1e-9, k
    # AR(2): pacf cuts off after lag 2
    assert abs(out.loc[1, "pacf"] + 0.3) < 0.1     # ~ -0.3 at lag 2
    assert np.abs(out.loc[2:, "pacf"]).max() < 0.1  # lags 3..5 ~ 0
