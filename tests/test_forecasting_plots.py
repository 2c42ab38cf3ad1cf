"""P5 forecasting plot helpers (reference time_series_model.py:277-426)
and the bounded-collect guard on load_and_preprocess_data.

The data-shaping halves are pure functions tested without matplotlib;
the figure halves are tested for real figure objects when matplotlib is
installed, and for the documented NotImplementedError contract when not.
"""

import os
import shutil
import tempfile

import numpy as np
import pytest

from fdi_flow_spark.forecasting import (
    TimeSeriesPredictor,
    history_curves,
    normalized_segments,
    plot_normalized_data,
    plot_training_history,
    prediction_segment,
)


def _has_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def test_history_curves_numpy_trainer_dict():
    hist = {"loss": [0.5, 0.3, 0.2], "val_loss": [0.6, 0.4, 0.35]}
    curves = history_curves(hist)
    assert curves == {"loss": [0.5, 0.3, 0.2], "val_loss": [0.6, 0.4, 0.35]}


def test_history_curves_keras_like_object_and_metric_filter():
    class H:  # Keras History duck type
        history = {
            "loss": [1.0, 0.5],
            "val_loss": [1.1, 0.6],
            "mean_absolute_error": [0.9, 0.4],
            "val_mean_absolute_error": [0.95, 0.5],
            "accuracy": [0.1, 0.2],
        }

    curves = history_curves(H(), metrics=["mean_absolute_error"])
    assert set(curves) == {
        "loss",
        "val_loss",
        "mean_absolute_error",
        "val_mean_absolute_error",
    }


def test_history_curves_rejects_empty():
    with pytest.raises(ValueError):
        history_curves(None)
    with pytest.raises(ValueError):
        history_curves({})


def test_prediction_segment_alignment_single_step():
    actual = np.arange(100, dtype=float)
    preds = np.arange(50, dtype=float).reshape(-1, 1)
    seg = prediction_segment(actual, preds, time_steps=10, num_points_to_plot=20)
    # actual covers time_steps + k points; predictions shifted by time_steps
    assert len(seg["actual"]) == 30
    np.testing.assert_array_equal(seg["pred_x"], np.arange(10, 30))
    np.testing.assert_array_equal(seg["pred_y"], np.arange(20, dtype=float))


def test_prediction_segment_multi_step_plots_first_step():
    preds = np.stack([np.arange(8.0), np.arange(8.0) + 100], axis=1)  # (8, 2)
    seg = prediction_segment(
        np.zeros(50), preds, time_steps=5, output_step=2, num_points_to_plot=200
    )
    np.testing.assert_array_equal(seg["pred_y"], np.arange(8.0))  # step 0 only
    assert len(seg["pred_x"]) == 8


def test_normalized_segments_accepts_arrays_and_dataframes(spark):
    from .conftest import make_long

    arr = np.linspace(0, 1, 25)
    df = make_long(spark, {"s": arr})
    segs = normalized_segments([arr, df])
    assert len(segs) == 2
    np.testing.assert_allclose(segs[0], arr)
    np.testing.assert_allclose(segs[1], arr, rtol=1e-12)


@pytest.mark.skipif(_has_matplotlib(), reason="matplotlib installed")
def test_plot_helpers_raise_without_matplotlib():
    with pytest.raises(NotImplementedError):
        plot_normalized_data([np.zeros(3)], 1)
    with pytest.raises(NotImplementedError):
        plot_training_history({"loss": [1.0]})


@pytest.mark.skipif(not _has_matplotlib(), reason="matplotlib absent")
def test_plot_helpers_return_figures():
    fig1 = plot_normalized_data([np.zeros(5), np.ones(5)], num_train_files=1)
    fig2 = plot_training_history(
        {"loss": [1.0, 0.5], "val_loss": [1.2, 0.7], "mean_squared_error": [2.0, 1.0]},
        metrics=["mean_squared_error"],
    )
    assert fig1.axes and len(fig2.axes) == 2


def test_load_and_preprocess_collect_guard(spark):
    """The driver-side windows collect is bounded: max_collect_rows trips a
    ValueError pointing at the stride/time_steps knobs (VERDICT r5 item 7)."""
    d = tempfile.mkdtemp(prefix="fdi_fc_guard_")
    try:
        path = os.path.join(d, "series.csv")
        # loader downsamples [::200] -> 13 points -> 8 supervised windows
        with open(path, "w") as f:
            f.write("t,y\n")
            for j in range(201 * 12):
                f.write(f"{j},{float(j % 17)}\n")
        pred = TimeSeriesPredictor(time_steps=5, output_step=1)
        with pytest.raises(ValueError, match="max_collect_rows"):
            pred.load_and_preprocess_data(spark, [path], path, max_collect_rows=3)
        # generous bound: same inputs pass through untouched
        X_train, _, X_test, _ = pred.load_and_preprocess_data(
            spark, [path], path, max_collect_rows=10_000
        )
        assert X_train.shape[0] > 3 and X_train.shape == X_test.shape
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_predictor_plot_methods_reference_contract(spark, capsys):
    """The reference exposes the three plots as TimeSeriesPredictor METHODS
    and prints-and-returns-None when prerequisites are missing
    (time_series_model.py:305-311, :357-363); the wrapper methods keep that
    contract while delegating to forecasting/plots.py."""
    pred = TimeSeriesPredictor(time_steps=5)
    assert pred.plot_training_history() is None
    assert "train the model" in capsys.readouterr().out
    assert pred.plot_predictions(np.zeros((1, 5, 1)), np.zeros((1, 1))) is None
    assert "model not trained" in capsys.readouterr().out

    d = tempfile.mkdtemp(prefix="fdi_fc_plotm_")
    try:
        path = os.path.join(d, "series.csv")
        with open(path, "w") as f:
            f.write("t,y\n")
            for j in range(201 * 12):
                f.write(f"{j},{float(j % 17)}\n")
        pred.load_and_preprocess_data(spark, [path], path)
        # normalized test series cached for plot_predictions (ref :160-163)
        nt = pred.normalized_test_data
        assert nt is not None and len(nt) == 13
        assert nt.min() >= 0.0 and nt.max() <= 1.0
    finally:
        shutil.rmtree(d, ignore_errors=True)
