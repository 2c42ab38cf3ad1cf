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


def test_train_model_numpy_fallback_without_tf():
    """Without TF, build_model is a no-op marker and train_model runs the
    NumPy twin trainer — same architecture, Adam+MSE+BPTT — and the trained
    model serves predict/evaluate_model."""
    try:
        import tensorflow  # noqa: F401

        pytest.skip("tensorflow installed; NumPy fallback not exercised")
    except ImportError:
        pass
    t = np.arange(800) * 0.2
    sig = (np.sin(t) * 0.5 + 0.5).astype(np.float64)
    T, H = 10, 1
    X = np.stack([sig[i : i + T] for i in range(len(sig) - T - H)])[:, :, None]
    Y = np.stack([sig[i + T : i + T + H] for i in range(len(sig) - T - H)])
    pred = TimeSeriesPredictor(time_steps=T, output_step=H, epochs=6, batch_size=64)
    assert pred.build_model() is None
    hist = pred.train_model(X, Y, validation_split=0.1)
    assert hist["loss"][-1] < hist["loss"][0] * 0.2  # it actually learns
    assert len(hist["val_loss"]) == 6
    mse = pred.evaluate_model(X[-50:], Y[-50:])
    assert mse < 0.01
    out = pred.predict(X[:7])
    assert out.shape == (7, H)


# ----------------- NumPy trainer (forecasting.training) ---------------------


@pytest.mark.parametrize("model_type,T", [("lstm", 5), ("convlstm", 9)])
def test_training_gradients_match_finite_differences(model_type, T):
    """Central-difference check of every backward pass (BPTT through the
    LSTM, conv/pool/relu for convlstm): sampled coordinates of every weight
    tensor agree with numerical gradients to ~1e-5 in float64."""
    from fdi_flow_spark.forecasting.inference import NumpyForecastModel
    from fdi_flow_spark.forecasting.training import _forward_backward

    rng = np.random.default_rng(0)
    init = NumpyForecastModel.init_random(model_type, T, 2, seed=1, units=3, conv_filters=2)
    ws = [
        np.asarray(w, dtype=np.float64) + 0.01 * rng.standard_normal(np.asarray(w).shape)
        for w in init.weights
    ]
    X = rng.standard_normal((4, T, 1))
    Y = rng.standard_normal((4, 2))
    _, grads = _forward_backward(model_type, ws, X, Y)
    eps = 1e-6
    for w, g in zip(ws, grads):
        picks = rng.choice(w.size, size=min(12, w.size), replace=False)
        for k in picks:
            idx = np.unravel_index(k, w.shape)
            orig = w[idx]
            w[idx] = orig + eps
            lp, _ = _forward_backward(model_type, ws, X, Y)
            w[idx] = orig - eps
            lm, _ = _forward_backward(model_type, ws, X, Y)
            w[idx] = orig
            num = (lp - lm) / (2 * eps)
            rel = abs(num - g[idx]) / max(1e-8, abs(num) + abs(g[idx]))
            assert rel < 1e-5, (idx, num, g[idx])


@pytest.mark.parametrize("model_type", ["lstm", "convlstm"])
def test_train_numpy_model_beats_persistence(model_type):
    """Trained on a sine, both architectures cut train loss >10x and beat
    the last-value persistence baseline by >2x on held-out windows."""
    from fdi_flow_spark.forecasting.training import train_numpy_model

    t = np.arange(2000) * 0.2
    sig = np.sin(t) * 0.5 + 0.5
    T, H = 20, 3
    X = np.stack([sig[i : i + T] for i in range(len(sig) - T - H)])
    Y = np.stack([sig[i + T : i + T + H] for i in range(len(sig) - T - H)])
    ntr = int(len(X) * 0.8)
    model, hist = train_numpy_model(
        model_type, X[:ntr], Y[:ntr], epochs=10, batch_size=64, units=16, seed=3
    )
    assert hist["loss"][-1] < hist["loss"][0] * 0.1
    pred = model.predict(X[ntr:])
    mse = float(((pred - Y[ntr:]) ** 2).mean())
    naive = float(((X[ntr:, -1][:, None] - Y[ntr:]) ** 2).mean())
    assert mse < naive * 0.5


# --------------- NumPy inference twin (forecasting.inference) ---------------


def _naive_lstm(x, kernel, recurrent, bias):
    # independent per-sample, per-step scalar-loop formulation
    u = recurrent.shape[0]
    outs = []
    for xi in x:
        h = np.zeros(u)
        c = np.zeros(u)
        for t in range(xi.shape[0]):
            z = xi[t] @ kernel + h @ recurrent + bias
            sig = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
            i, f, g, o = (
                sig(z[:u]),
                sig(z[u : 2 * u]),
                np.tanh(z[2 * u : 3 * u]),
                sig(z[3 * u :]),
            )
            c = f * c + i * g
            h = o * np.tanh(c)
        outs.append(h)
    return np.array(outs)


def test_lstm_forward_matches_naive_loop():
    from fdi_flow_spark.forecasting.inference import lstm_forward

    rng = np.random.default_rng(3)
    n, T, C, u = 5, 7, 2, 4
    x = rng.normal(0, 1, (n, T, C))
    k = rng.normal(0, 0.5, (C, 4 * u))
    r = rng.normal(0, 0.5, (u, 4 * u))
    b = rng.normal(0, 0.1, 4 * u)
    np.testing.assert_allclose(lstm_forward(x, k, r, b), _naive_lstm(x, k, r, b), rtol=1e-12)


def test_conv1d_and_maxpool_match_naive():
    from fdi_flow_spark.forecasting.inference import conv1d_forward, maxpool1d

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (3, 10, 2))
    W = rng.normal(0, 1, (3, 2, 5))
    b = rng.normal(0, 1, 5)
    got = conv1d_forward(x, W, b)
    assert got.shape == (3, 8, 5)
    for s in range(3):
        for t in range(8):
            expect = b + sum(x[s, t + i] @ W[i] for i in range(3))
            np.testing.assert_allclose(got[s, t], expect, rtol=1e-12)
    p = maxpool1d(got, 2)
    assert p.shape == (3, 4, 5)
    np.testing.assert_allclose(p[1, 0], np.maximum(got[1, 0], got[1, 1]), rtol=1e-12)


def test_numpy_model_shapes_and_determinism():
    from fdi_flow_spark.forecasting.inference import NumpyForecastModel

    X = np.random.default_rng(6).normal(0, 1, (11, 50))
    for mt in ("lstm", "convlstm"):
        m = NumpyForecastModel.init_random(mt, 50, output_steps=3, seed=9)
        out = m.predict(X)
        assert out.shape == (11, 3)
        np.testing.assert_array_equal(out, NumpyForecastModel.init_random(mt, 50, 3, 9).predict(X))
    with pytest.raises(ValueError):
        NumpyForecastModel("lstm", [np.zeros(2)] * 3)
    with pytest.raises(ValueError):
        NumpyForecastModel("transformer", [])


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("tensorflow"),
    reason="tensorflow absent",
)
def test_numpy_model_matches_keras():
    import tensorflow  # noqa: F401

    p = TimeSeriesPredictor(time_steps=20, output_step=2, model_type="convlstm")
    model = p.build_model()
    from fdi_flow_spark.forecasting.inference import NumpyForecastModel

    m = NumpyForecastModel.from_keras(model, "convlstm")
    X = np.random.default_rng(8).normal(0, 1, (6, 20)).astype(np.float32)
    np.testing.assert_allclose(
        m.predict(X), model.predict(X.reshape(6, 20, 1), verbose=0), atol=1e-5
    )


def test_predict_distributed_numpy_matches_local(spark):
    from fdi_flow_spark.forecasting.inference import NumpyForecastModel

    rng = np.random.default_rng(12)
    arrs = {f"s{i}": rng.normal(0, 1, 80) for i in range(2)}
    wins, _ = prepare_supervised_data(make_long(spark, arrs), time_steps=16, output_steps=2)
    m = NumpyForecastModel.init_random("lstm", 16, output_steps=2, seed=1)
    p = TimeSeriesPredictor(time_steps=16, output_step=2, model_type="lstm")
    p.use_numpy_model(m)
    rows = p.predict_distributed(wins).orderBy("series_id", "window_start").collect()
    X = np.array([r.x for r in rows])
    local = m.predict(X)
    got = np.array([r.y_pred for r in rows])
    # float32 inference: BLAS blocking differs with batch shape, so agreement
    # is at f32 epsilon, not bitwise
    np.testing.assert_allclose(got, local, rtol=1e-5, atol=1e-6)
