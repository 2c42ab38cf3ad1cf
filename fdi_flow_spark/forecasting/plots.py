"""Driver-side forecasting plot helpers (reference
``fdi_flow/forecasting/time_series_model.py:277-426`` — plot normalized
series, plot training history, plot actual-vs-predicted test segment).

Plotting is inherently a driver-side act: each helper consumes either
small NumPy arrays already on the driver or a DataFrame it bounds with
``toPandas()`` on an already-windowed/normalized result. Matplotlib is
optional in this environment, so the data-shaping halves are separate
pure functions (unit-testable without a display or matplotlib) and the
figure-producing halves raise :class:`NotImplementedError` when
matplotlib is absent — the same contract as
``models.utils.plot_simulation_results``.
"""

from __future__ import annotations

import numpy as np


def _require_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)  # headless: never require a display
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:
        raise NotImplementedError("plotting requires matplotlib") from e


# ---------------------------------------------------------------- data halves


def normalized_segments(series_dfs, value_col: str = "value"):
    """Collect a list of (already normalized) series DataFrames into the
    list-of-1-D-arrays shape the reference's ``plot_normalized_data``
    consumes (reference ``:277-303``). Each input is ordered by ``ts``
    before collection; these are plot-bound series (post-stride
    downsampling), so the pull is bounded by what a figure can show."""
    out = []
    for df in series_dfs:
        if isinstance(df, np.ndarray):
            out.append(np.asarray(df, dtype=float).ravel())
            continue
        pdf = df.orderBy("ts").select(value_col).toPandas()
        out.append(pdf[value_col].to_numpy(dtype=float))
    return out


def history_curves(history, metrics: list[str] | None = None) -> dict:
    """Normalize a training history — the NumPy trainer's plain dict or a
    Keras ``History`` object — into ``{name: [floats per epoch]}``
    (reference ``:305-345`` reads ``history.history`` directly; we accept
    both shapes so the TF-free trainer plots identically)."""
    if history is None:
        raise ValueError("no training history — train the model first")
    hist = getattr(history, "history", history)
    if not isinstance(hist, dict) or not hist:
        raise ValueError("history must be a non-empty dict of metric curves")
    curves = {k: [float(v) for v in vs] for k, vs in hist.items()}
    if metrics:
        # reference plots loss/val_loss plus the FIRST compiled metric
        keep = {"loss", "val_loss", metrics[0], f"val_{metrics[0]}"}
        curves = {k: v for k, v in curves.items() if k in keep} or curves
    return curves


def prediction_segment(
    actual: np.ndarray,
    predictions: np.ndarray,
    time_steps: int,
    output_step: int = 1,
    num_points_to_plot: int = 200,
) -> dict:
    """Shape the actual-vs-predicted overlay of the reference's
    ``plot_predictions`` (``:347-426``): the actual normalized series for
    the first ``time_steps + k`` points, and the first-step predictions
    aligned at ``time_steps + i`` (multi-step output plots step 0 only,
    matching the reference's documented simplification)."""
    actual = np.asarray(actual, dtype=float).ravel()
    predictions = np.asarray(predictions, dtype=float)
    if predictions.ndim == 1:
        predictions = predictions.reshape(-1, 1)
    k = min(int(num_points_to_plot), len(predictions))
    pred_first = predictions[:k, 0].ravel() if output_step > 1 else predictions[:k].ravel()
    return {
        "actual": actual[: time_steps + k],
        "pred_x": np.arange(time_steps, time_steps + k),
        "pred_y": pred_first,
    }


# -------------------------------------------------------------- figure halves


def plot_normalized_data(normalized_arrays, num_train_files: int):
    """Reference ``:277-303``: train segments in blue, test segments in
    red, concatenated along one x axis. Accepts arrays or DataFrames."""
    plt = _require_matplotlib()
    arrays = normalized_segments(normalized_arrays)
    fig = plt.figure(figsize=(15, 6))
    ax = fig.gca()
    offset = 0
    for i, arr in enumerate(arrays):
        color = "b" if i < num_train_files else "r"
        label = (
            "training data"
            if i == 0
            else ("test data" if i == num_train_files else "_nolegend_")
        )
        ax.plot(range(offset, offset + len(arr)), arr, color=color, label=label)
        offset += len(arr)
    ax.set_title("Normalized time-series data")
    ax.set_xlabel("sample index (after downsampling)")
    ax.set_ylabel("normalized value")
    ax.legend()
    ax.grid(True)
    return fig


def plot_training_history(history, metrics: list[str] | None = None):
    """Reference ``:305-345``: loss subplot + first-metric subplot, with
    validation twins when present. Returns the figure."""
    plt = _require_matplotlib()
    curves = history_curves(history, metrics)
    metric = None
    if metrics:
        metric = metrics[0] if metrics[0] in curves else None
    if metric is None:
        metric = next((k for k in curves if k not in ("loss", "val_loss")), None)
    fig, axes = plt.subplots(1, 2 if metric else 1, figsize=(12, 5), squeeze=False)
    ax = axes[0][0]
    if "loss" in curves:
        ax.plot(curves["loss"], label="training loss")
    if "val_loss" in curves:
        ax.plot(curves["val_loss"], label="validation loss")
    ax.set_title("model loss")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    if metric:
        ax2 = axes[0][1]
        title = metric.replace("_", " ").title()
        ax2.plot(curves[metric], label=f"training {title}")
        if f"val_{metric}" in curves:
            ax2.plot(curves[f"val_{metric}"], label=f"validation {title}")
        ax2.set_title(f"model {title}")
        ax2.set_xlabel("epoch")
        ax2.set_ylabel(title)
        ax2.legend()
    fig.tight_layout()
    return fig


def plot_predictions(
    predictor,
    X_test_raw: np.ndarray,
    y_test_raw: np.ndarray,
    normalized_test_data: np.ndarray,
    num_points_to_plot: int = 200,
):
    """Reference ``:347-426``: run the trained model on the raw test
    windows and overlay first-step predictions (dashed red) on the actual
    normalized series (blue), predictions shifted by ``time_steps``.
    ``normalized_test_data`` is the full normalized test series (the
    reference caches it on the instance; here it is an explicit argument
    so the distributed prep path stays stateless)."""
    plt = _require_matplotlib()
    predictions = predictor.predict(np.asarray(X_test_raw, dtype=np.float32))
    seg = prediction_segment(
        normalized_test_data,
        predictions,
        predictor.time_steps,
        predictor.output_step,
        num_points_to_plot,
    )
    fig = plt.figure(figsize=(15, 6))
    ax = fig.gca()
    ax.plot(seg["actual"], label="actual (normalized)", color="blue")
    ax.plot(
        seg["pred_x"],
        seg["pred_y"],
        label="predicted (normalized)"
        if predictor.output_step == 1
        else "predicted (first step, normalized)",
        color="red",
        linestyle="--",
    )
    ax.set_title("Actual vs. predicted test data (normalized)")
    ax.set_xlabel("time step")
    ax.set_ylabel("normalized value")
    ax.legend()
    ax.grid(True)
    return fig
