import numpy as np
import pytest

from fdi_flow_spark.operators import minmax_scale, robust_scale, standard_scale

from .conftest import collect_series, make_long
from .reference_kernels import ref_minmax_scale, ref_robust_scale, ref_standard_scale


def _arrays():
    rng = np.random.default_rng(11)
    return {
        "a": rng.normal(5, 2, 80),
        "b": np.linspace(-3, 9, 41),
        "const": np.full(20, 7.0),
    }


@pytest.mark.parametrize("with_mean,with_std", [(True, True), (False, True), (True, False)])
def test_standard(spark, with_mean, with_std):
    arrays = _arrays()
    out = collect_series(standard_scale(make_long(spark, arrays), with_mean, with_std))
    for sid, arr in arrays.items():
        np.testing.assert_allclose(
            out[sid], ref_standard_scale(arr, with_mean, with_std), rtol=1e-9, atol=1e-12
        )


@pytest.mark.parametrize("rng_pair", [(0.0, 1.0), (-1.0, 1.0), (2.0, 10.0)])
def test_minmax(spark, rng_pair):
    arrays = _arrays()
    out = collect_series(minmax_scale(make_long(spark, arrays), rng_pair))
    for sid, arr in arrays.items():
        np.testing.assert_allclose(out[sid], ref_minmax_scale(arr, *rng_pair), rtol=1e-12)


@pytest.mark.parametrize(
    "centering,scaling", [(True, True), (False, True), (True, False)]
)
def test_robust(spark, centering, scaling):
    arrays = _arrays()
    out = collect_series(robust_scale(make_long(spark, arrays), centering, scaling))
    for sid, arr in arrays.items():
        np.testing.assert_allclose(
            out[sid], ref_robust_scale(arr, centering, scaling), rtol=1e-9, atol=1e-12
        )


def test_standard_invariants(spark):
    arrays = {"a": np.random.default_rng(3).normal(10, 4, 200)}
    out = collect_series(standard_scale(make_long(spark, arrays)))["a"]
    assert abs(out.mean()) < 1e-9
    assert abs(np.std(out) - 1.0) < 1e-9


def test_robust_approx_close_to_exact(spark):
    """The percentile_approx path (``exact=False``) is the opt-in 100 TB
    variant (SURVEY §4): a sketch aggregate instead of exact percentiles.
    At this series length the sketch is rank-exact, so the only deviation
    is interpolated-vs-sample-value percentiles — bound it."""
    from fdi_flow_spark.sources.tables import events_series
    from pyspark.sql import functions as F

    s = events_series(spark, "/root/testdata/sf0.001")
    ex = robust_scale(s).withColumnRenamed("value", "v_exact")
    ap = robust_scale(s, exact=False).withColumnRenamed("value", "v_approx")
    row = (
        ex.join(ap, ["series_id", "ts"])
        .agg(
            F.count("*").alias("n"),
            F.max(F.abs(F.col("v_exact") - F.col("v_approx"))).alias("max_abs"),
            F.avg(F.abs(F.col("v_exact") - F.col("v_approx"))).alias("mean_abs"),
        )
        .first()
    )
    assert row["n"] == s.count()
    assert row["max_abs"] <= 0.2
    assert row["mean_abs"] <= 0.02
