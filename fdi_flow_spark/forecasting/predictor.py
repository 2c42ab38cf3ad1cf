"""Forecasting: distributed data prep + (optional) Keras trainer.

Reference: ``TimeSeriesPredictor``
(``/root/reference/fdi_flow/forecasting/time_series_model.py:10-426``).

The data path is fully distributed and reproduces the reference semantics
exactly (``load_and_preprocess_data``, ``:88-166``):

1. read CSVs with a ``y`` column (one series per file),
2. downsample ``[::200]`` (row_number stride filter),
3. global min/max over train AND test jointly (leaky by design in the
   reference — reproduced for parity),
4. min-max normalize with those global stats,
5. supervised windowing ``X[i]=d[i:i+T]``, ``Y[i]=d[i+T:i+T+H]`` (``:67-86``)
   — the same machinery as ``operators.segmenters.supervised_windows``,
6. concat train windows across files (``unionByName``).

Training (``build_model``/``train_model``, ``:168-235``) uses TensorFlow/
Keras when installed; without TF it runs the NumPy twin trainer
(``forecasting.training``): the same architectures — ``lstm`` =
LSTM(100)+Dropout(.2)+Dense(H); ``convlstm`` =
Conv1D(64,3,relu)+MaxPool(2)+LSTM(100)+Dropout(.2)+Dense(H) — under
Adam+MSE with full BPTT, gradient-checked against central finite
differences. Documented deviation: NumPy-trained weights are not
bit-identical to a TF run (different RNG streams/kernels); the parity is
architectural and mathematical.

Inference never needs TF: ``forecasting.inference`` reimplements the
LSTM/Conv1D/MaxPool/Dense forward math in NumPy against the Keras weight
layouts, so a model trained either way runs distributed Arrow-batched
inference from its weight list (``use_numpy_model``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from fdi_flow_spark.operators.segmenters import supervised_windows
from fdi_flow_spark.sources.tables import read_csv_series


def prepare_supervised_data(
    series: DataFrame,
    time_steps: int,
    output_steps: int = 1,
    stride: int = 1,
    global_minmax: tuple[float, float] | None = None,
    exploded: bool = False,
) -> tuple[DataFrame, tuple[float, float]]:
    """Downsample -> global min-max normalize -> supervised windows.

    Returns (windows_df ``(series_id, window_start, x, y)``, (min, max)).
    Stats are computed over the WHOLE input (train+test jointly) unless
    given — same protocol as the reference (``time_series_model.py:121-122``).
    Note the reference normalizes float32 arrays while this path computes
    stats and values in float64; normalized values can differ from the
    reference at ~1e-7 relative (documented deviation, not bit parity).
    """
    if stride > 1:
        series = series.where(F.col("ts") % stride == 0).withColumn(
            "ts", (F.col("ts") / stride).cast("long")
        )
    if global_minmax is None:
        row = series.agg(F.min("value"), F.max("value")).first()
        global_minmax = (float(row[0]), float(row[1]))
    lo, hi = global_minmax
    rng = hi - lo if hi > lo else 1.0
    normalized = series.withColumn("value", (F.col("value") - F.lit(lo)) / F.lit(rng))
    wins = supervised_windows(normalized, time_steps, output_steps, exploded=exploded)
    return wins, global_minmax


class TimeSeriesPredictor:
    def __init__(
        self,
        time_steps: int = 50,
        output_step: int = 1,
        model_type: str = "convlstm",
        epochs: int = 50,
        batch_size: int = 32,
        optimizer: str = "adam",
        loss: str = "mse",
        metrics: list | None = None,
        verbose: int = 1,
    ):
        self.time_steps = time_steps
        self.output_step = output_step
        self.model_type = model_type.lower()
        self.epochs = epochs
        self.batch_size = batch_size
        self.optimizer = optimizer
        self.loss = loss
        self.metrics = metrics or ["accuracy", "mean_squared_error", "mean_absolute_error"]
        self.verbose = verbose
        self.model = None
        self.min_value = None
        self.max_value = None
        self.history = None
        self.normalized_test_data = None

    # ---- distributed data path ---------------------------------------
    def load_and_preprocess_data(
        self,
        spark: SparkSession,
        train_filenames: list[str],
        test_filename: str,
        max_collect_rows: int = 2_000_000,
    ):
        """Reference ``:88-166`` distributed. Returns numpy (X_train, y_train,
        X_test, y_test) shaped for Keras ((n, T, 1) float32).

        Single-node training is reference parity, so the supervised windows
        ARE collected to the driver — but bounded: each side's collect is
        capped at ``max_collect_rows`` windows (LIMIT pushed into the scan,
        no separate count pass), and the error points at the stride /
        ``time_steps`` knobs that shrink the window count, mirroring the
        ``cosine_near_dup_pairs`` guard."""
        train = None
        for fn in train_filenames:
            s = read_csv_series(spark, fn, value_col="y", stride=200)
            train = s if train is None else train.unionByName(s)
        test = read_csv_series(spark, test_filename, value_col="y", stride=200)
        both = train.unionByName(test)
        row = both.agg(F.min("value"), F.max("value")).first()
        self.min_value, self.max_value = float(row[0]), float(row[1])
        mm = (self.min_value, self.max_value)
        train_w, _ = prepare_supervised_data(train, self.time_steps, self.output_step, 1, mm)
        test_w, _ = prepare_supervised_data(test, self.time_steps, self.output_step, 1, mm)

        def collect_xy(wdf):
            pdf = (
                wdf.orderBy("series_id", "window_start")
                .limit(max_collect_rows + 1)
                .toPandas()
            )
            if len(pdf) > max_collect_rows:
                raise ValueError(
                    f"load_and_preprocess_data collects supervised windows "
                    f"to the driver for single-node training (> "
                    f"max_collect_rows={max_collect_rows}); raise the "
                    f"read stride / time_steps to thin the windows, or "
                    f"train on a subset and score distributed via "
                    f"predict_distributed"
                )
            X = np.array(pdf["x"].tolist(), dtype=np.float32)
            Y = np.array(pdf["y"].tolist(), dtype=np.float32)
            return X.reshape((X.shape[0], X.shape[1], 1)), Y

        X_train, y_train = collect_xy(train_w)
        X_test, y_test = collect_xy(test_w)
        # cache the full normalized test series for plot_predictions
        # (reference :160-163 caches self.normalized_test_data); bounded by
        # the same guard — the series is shorter than its window count + T
        lo, hi = mm
        span = (hi - lo) or 1.0
        tp = (
            test.orderBy("ts")
            .limit(max_collect_rows + self.time_steps + self.output_step)
            .toPandas()
        )
        self.normalized_test_data = (
            (tp["value"].to_numpy(dtype=float) - lo) / span
        )
        return X_train, y_train, X_test, y_test

    # ---- plots (reference :277-426; driver-side, matplotlib optional) --
    def plot_normalized_data(self, normalized_arrays, num_train_files: int):
        from fdi_flow_spark.forecasting.plots import plot_normalized_data

        return plot_normalized_data(normalized_arrays, num_train_files)

    def plot_training_history(self):
        # reference :305-311 prints-and-returns when there is no history
        if self.history is None:
            print("no training history available — train the model first")
            return None
        from fdi_flow_spark.forecasting.plots import plot_training_history

        return plot_training_history(self.history, self.metrics)

    def plot_predictions(self, X_test_raw, y_test_raw, num_points_to_plot: int = 200):
        if self.model is None:
            print("model not trained — cannot predict")
            return None
        if getattr(self, "normalized_test_data", None) is None:
            print("normalized test data unavailable — run load_and_preprocess_data")
            return None
        from fdi_flow_spark.forecasting.plots import plot_predictions

        return plot_predictions(
            self, X_test_raw, y_test_raw, self.normalized_test_data, num_points_to_plot
        )

    # ---- model layer (TF optional; NumPy twin otherwise) --------------
    def _tf_layers(self):
        """Keras imports, or None when TF is absent (-> NumPy training)."""
        try:
            from tensorflow.keras.layers import (  # noqa: F401
                LSTM,
                Conv1D,
                Dense,
                Dropout,
                MaxPooling1D,
            )
            from tensorflow.keras.models import Sequential  # noqa: F401

            return Sequential, LSTM, Dense, Dropout, Conv1D, MaxPooling1D
        except ImportError:
            return None

    def build_model(self):
        """Build the Keras model when TF is installed. Without TF this is a
        no-op marker: ``train_model`` then runs the NumPy twin trainer
        (``forecasting.training`` — same architecture, Adam + MSE + BPTT,
        gradient-checked; documented deviation: not bit-identical to TF)."""
        tf = self._tf_layers()
        if tf is None:
            if self.model_type not in ("lstm", "convlstm"):
                raise ValueError(f"unknown model_type {self.model_type!r}")
            self.model = None  # NumPy trainer builds weights at fit time
            return None
        Sequential, LSTM, Dense, Dropout, Conv1D, MaxPooling1D = tf
        model = Sequential()
        if self.model_type == "lstm":
            model.add(LSTM(100, input_shape=(self.time_steps, 1)))
            model.add(Dropout(0.2))
            model.add(Dense(self.output_step))
        elif self.model_type == "convlstm":
            model.add(
                Conv1D(64, kernel_size=3, activation="relu", input_shape=(self.time_steps, 1))
            )
            model.add(MaxPooling1D(pool_size=2))
            model.add(LSTM(100))
            model.add(Dropout(0.2))
            model.add(Dense(self.output_step))
        else:
            raise ValueError(f"unknown model_type {self.model_type!r}")
        model.compile(optimizer=self.optimizer, loss=self.loss, metrics=self.metrics)
        self.model = model
        return model

    def train_model(self, X_train, y_train, validation_split=0.1):
        if self.model is None and self._tf_layers() is not None:
            self.build_model()
        if self.model is None:  # TF absent: NumPy twin trainer
            from fdi_flow_spark.forecasting.training import train_numpy_model

            X = np.asarray(X_train, dtype=np.float64).reshape(len(X_train), -1)
            Y = np.asarray(y_train, dtype=np.float64).reshape(len(y_train), -1)
            val = None
            if validation_split and 0.0 < validation_split < 1.0:
                n_val = max(1, int(len(X) * validation_split))
                X, Xv = X[:-n_val], X[-n_val:]
                Y, Yv = Y[:-n_val], Y[-n_val:]
                val = (Xv, Yv)
            model, history = train_numpy_model(
                self.model_type,
                X,
                Y,
                epochs=self.epochs,
                batch_size=self.batch_size,
                validation_data=val,
                verbose=bool(self.verbose),
            )
            self.model = model
            self.history = history
            return history
        self.history = self.model.fit(
            X_train,
            y_train,
            epochs=self.epochs,
            batch_size=self.batch_size,
            validation_split=validation_split,
            verbose=self.verbose,
        )
        return self.history

    def evaluate_model(self, X_test, y_test):
        if self.model is None:
            raise RuntimeError("model not trained")
        from fdi_flow_spark.forecasting.inference import NumpyForecastModel

        if isinstance(self.model, NumpyForecastModel):
            pred = self.model.predict(np.asarray(X_test, dtype=np.float32))
            Y = np.asarray(y_test, dtype=np.float64).reshape(pred.shape)
            return float(((pred - Y) ** 2).mean())  # loss='mse', as compiled
        return self.model.evaluate(X_test, y_test, verbose=self.verbose)

    def use_numpy_model(self, model) -> None:
        """Install a ``NumpyForecastModel`` (e.g. built from Keras
        ``get_weights()`` trained elsewhere) as the inference engine — the
        TF-free path for ``predict``/``predict_distributed``."""
        from fdi_flow_spark.forecasting.inference import NumpyForecastModel

        if not isinstance(model, NumpyForecastModel):
            raise TypeError("use_numpy_model expects a NumpyForecastModel")
        self.model = model

    def predict(self, X):
        if self.model is None:
            raise RuntimeError("model not trained")
        from fdi_flow_spark.forecasting.inference import NumpyForecastModel

        if isinstance(self.model, NumpyForecastModel):
            return self.model.predict(X)
        return self.model.predict(X, verbose=self.verbose)

    def predict_distributed(self, windows_df: DataFrame) -> DataFrame:
        """Distributed inference: apply trained weights over packed window
        rows with an Arrow-batched Pandas UDF (predict_batch pattern).
        Works with either a Keras model (TF path) or a NumpyForecastModel
        (TF-free path, ``forecasting.inference``)."""
        if self.model is None:
            raise RuntimeError("model not trained")
        from fdi_flow_spark.forecasting.inference import (
            NumpyForecastModel,
            predict_distributed,
        )

        if isinstance(self.model, NumpyForecastModel):
            return predict_distributed(windows_df, self.model)
        weights = self.model.get_weights()
        cfg = self.model.to_json()
        T = self.time_steps

        from pyspark.sql.types import ArrayType, DoubleType

        @F.pandas_udf(ArrayType(DoubleType()))
        def infer(xs: pd.Series) -> pd.Series:
            from tensorflow.keras.models import model_from_json

            local = model_from_json(cfg)
            local.set_weights(weights)
            X = np.array(xs.tolist(), dtype=np.float32).reshape((-1, T, 1))
            out = local.predict(X, verbose=0)
            return pd.Series([row.tolist() for row in out])

        return windows_df.withColumn("y_pred", infer(F.col("x")))
