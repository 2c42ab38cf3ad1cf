import os
import shutil
import tempfile

import numpy as np
import pytest

from fdi_flow_spark.forecasting import TimeSeriesPredictor, prepare_supervised_data

from .conftest import make_long


def test_prepare_supervised_data(spark):
    arr = np.sin(np.linspace(0, 20, 300))
    df = make_long(spark, {"s": arr})
    wins, (lo, hi) = prepare_supervised_data(df, time_steps=10, output_steps=2)
    assert lo == pytest.approx(arr.min())
    assert hi == pytest.approx(arr.max())
    pdf = wins.orderBy("window_start").toPandas()
    assert len(pdf) == 300 - 10 - 2 + 1
    norm = (arr - lo) / (hi - lo)
    np.testing.assert_allclose(np.array(pdf.iloc[0]["x"]), norm[:10], rtol=1e-7)
    np.testing.assert_allclose(np.array(pdf.iloc[0]["y"]), norm[10:12], rtol=1e-7)


def test_prepare_with_stride(spark):
    arr = np.arange(1000, dtype=np.float64)
    df = make_long(spark, {"s": arr})
    wins, _ = prepare_supervised_data(df, time_steps=3, output_steps=1, stride=200)
    # 1000 points / 200 stride = 5 points -> 5-3-1+1 = 2 windows
    assert wins.count() == 2


def test_load_and_preprocess_csv_pipeline(spark):
    """Reference load_and_preprocess_data semantics end-to-end: CSV ingress,
    [::200] downsample, joint global min-max, windowing, train concat."""
    d = tempfile.mkdtemp(prefix="fdi_fc_")
    try:
        rng = np.random.default_rng(2)
        n = 201 * 30  # -> 31 points after [::200]
        files = []
        for i in range(3):
            vals = rng.normal(i, 1.0, n)
            path = os.path.join(d, f"f{i}.csv")
            with open(path, "w") as f:
                f.write("t,y\n")
                for j, v in enumerate(vals):
                    f.write(f"{j},{v}\n")
            files.append((path, vals))
        pred = TimeSeriesPredictor(time_steps=5, output_step=1)
        X_train, y_train, X_test, y_test = pred.load_and_preprocess_data(
            spark, [files[0][0], files[1][0]], files[2][0]
        )
        down = [vals[::200].astype("float32") for _, vals in files]
        gmin = min(a.min() for a in down)
        gmax = max(a.max() for a in down)
        assert pred.min_value == pytest.approx(gmin, rel=1e-6)
        assert pred.max_value == pytest.approx(gmax, rel=1e-6)
        per_file = len(down[0]) - 5 - 1 + 1
        assert X_train.shape == (2 * per_file, 5, 1)
        assert X_test.shape == (per_file, 5, 1)
        assert y_train.shape == (2 * per_file, 1)
        # X/Y values are the normalized series windows
        norm0 = (down[0] - gmin) / (gmax - gmin)
        np.testing.assert_allclose(X_train[0, :, 0], norm0[:5], rtol=1e-5)
        np.testing.assert_allclose(y_train[0], norm0[5:6], rtol=1e-5)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_build_model_gated_without_tf():
    pred = TimeSeriesPredictor()
    try:
        import tensorflow  # noqa: F401

        pytest.skip("tensorflow installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        pred.build_model()
