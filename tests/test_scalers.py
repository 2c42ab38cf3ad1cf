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
