"""Pure-NumPy forward passes for the reference's forecasting architectures,
plus Arrow-batched distributed inference.

The reference trains Keras models (``time_series_model.py:168-235``):
``lstm`` = LSTM(100) -> Dropout -> Dense(H) and ``convlstm`` =
Conv1D(64,3,relu) -> MaxPool1D(2) -> LSTM(100) -> Dropout -> Dense(H), then
predicts with ``model.predict`` (``:237-275``). TensorFlow is optional in
this environment, so this module implements the exact inference math of
those layers in NumPy (Keras weight layouts: LSTM kernel ``(C, 4u)`` /
recurrent ``(u, 4u)`` / bias ``(4u,)`` in i,f,c,o gate order; Conv1D kernel
``(k, C_in, C_out)``; Dense ``(in, out)``). A model trained elsewhere with
Keras ships its ``get_weights()`` list here verbatim; Dropout is identity at
inference and MaxPool/Dropout carry no weights, so the orders line up.

``predict_distributed`` broadcasts the (small) weight list into an
Arrow-batched Pandas UDF — the ``predict_batch_udf`` pattern — so inference
scales with the windows table, JVM->Arrow->NumPy per batch, no per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # clip-then-exp: one contiguous exp pass (the masked two-sided form costs
    # 5-10x in gather/scatter over the gate tensors); the clip bound keeps
    # exp finite in float32 and is exact for |z| < 60 in float64
    z = np.clip(z, -60.0, 60.0)
    return 1.0 / (1.0 + np.exp(-z))


def dense_forward(x: np.ndarray, W: np.ndarray, b: np.ndarray) -> np.ndarray:
    return x @ W + b


def conv1d_forward(x: np.ndarray, W: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Valid-padding Conv1D. x: (n, T, C_in), W: (k, C_in, C_out) -> (n, T-k+1, C_out)."""
    k, c_in, c_out = W.shape
    n, T, _ = x.shape
    m = T - k + 1
    # flat gemm per tap (see lstm_forward: batched matmul is a slow path)
    out = (x[:, :m, :].reshape(n * m, c_in) @ W[0]).reshape(n, m, c_out)
    for i in range(1, k):
        out += (
            np.ascontiguousarray(x[:, i : m + i, :]).reshape(n * m, c_in) @ W[i]
        ).reshape(n, m, c_out)
    return out + b


def maxpool1d(x: np.ndarray, pool: int) -> np.ndarray:
    """Keras MaxPooling1D: stride == pool_size, valid padding (tail dropped)."""
    n, T, c = x.shape
    m = T // pool
    return x[:, : m * pool, :].reshape(n, m, pool, c).max(axis=2)


def lstm_forward(
    x: np.ndarray, kernel: np.ndarray, recurrent: np.ndarray, bias: np.ndarray
) -> np.ndarray:
    """Keras LSTM (return_sequences=False): returns the last hidden state.

    x: (n, T, C); kernel (C, 4u), recurrent (u, 4u), bias (4u,) with gates
    ordered i, f, c, o; sigmoid recurrent activation, tanh activation.
    """
    u = recurrent.shape[0]
    n, T, C = x.shape
    h = np.zeros((n, u), dtype=x.dtype)
    c = np.zeros((n, u), dtype=x.dtype)
    # one flat gemm for every step's input projection — a (n,T,C)@(C,4u)
    # batched matmul degenerates into n*T tiny GEMM dispatches in NumPy
    xz = (x.reshape(n * T, C) @ kernel).reshape(n, T, 4 * u) + bias
    for t in range(T):
        z = xz[:, t, :] + h @ recurrent
        i = _sigmoid(z[:, :u])
        f = _sigmoid(z[:, u : 2 * u])
        g = np.tanh(z[:, 2 * u : 3 * u])
        o = _sigmoid(z[:, 3 * u :])
        c = f * c + i * g
        h = o * np.tanh(c)
    return h


class NumpyForecastModel:
    """Inference twin of the reference's two Keras architectures.

    ``weights`` is exactly ``keras_model.get_weights()`` for that
    architecture (Dropout/MaxPool contribute nothing). ``model_type`` is
    ``'lstm'`` or ``'convlstm'`` as in the reference (``:34``).
    """

    def __init__(self, model_type: str, weights: list, dtype=np.float32):
        # float32 by default — the dtype Keras itself runs inference in;
        # halves memory traffic over the (large) windows axis
        self.model_type = model_type.lower()
        self.dtype = np.dtype(dtype)
        self.weights = [np.asarray(w, dtype=self.dtype) for w in weights]
        expected = {"lstm": 5, "convlstm": 7}.get(self.model_type)
        if expected is None:
            raise ValueError(f"unknown model_type {model_type!r}")
        if len(self.weights) != expected:
            raise ValueError(
                f"{self.model_type} expects {expected} weight arrays "
                f"(got {len(self.weights)}); pass keras model.get_weights() verbatim"
            )

    @classmethod
    def from_keras(cls, model, model_type: str) -> "NumpyForecastModel":
        return cls(model_type, model.get_weights())

    @classmethod
    def init_random(
        cls,
        model_type: str,
        time_steps: int,
        output_steps: int = 1,
        seed: int = 0,
        units: int = 100,
        conv_filters: int = 64,
    ) -> "NumpyForecastModel":
        """Deterministic Glorot-uniform init — the starting point for
        ``forecasting.training.train_numpy_model`` (and a runnable stand-in
        when no trained weights exist). ``units``/``conv_filters`` default
        to the reference architecture (LSTM(100), Conv1D(64))."""
        rng = np.random.default_rng(seed)

        def glorot(*shape):
            fan_in, fan_out = shape[0] if len(shape) == 2 else shape[0] * shape[1], shape[-1]
            lim = np.sqrt(6.0 / (fan_in + fan_out))
            return rng.uniform(-lim, lim, shape)

        u, cf = units, conv_filters
        if model_type == "lstm":
            ws = [glorot(1, 4 * u), glorot(u, 4 * u), np.zeros(4 * u)]
        elif model_type == "convlstm":
            ws = [glorot(3, 1, cf), np.zeros(cf), glorot(cf, 4 * u), glorot(u, 4 * u), np.zeros(4 * u)]
        else:
            raise ValueError(f"unknown model_type {model_type!r}")
        ws += [glorot(u, output_steps), np.zeros(output_steps)]
        return cls(model_type, ws)

    def predict(self, X: np.ndarray) -> np.ndarray:
        """X: (n, T) or (n, T, 1) -> (n, output_steps)."""
        X = np.asarray(X, dtype=self.dtype)
        if X.ndim == 2:
            X = X[:, :, None]
        w = self.weights
        if self.model_type == "lstm":
            h = lstm_forward(X, w[0], w[1], w[2])
            return dense_forward(h, w[3], w[4])
        z = np.maximum(conv1d_forward(X, w[0], w[1]), 0.0)  # relu
        z = maxpool1d(z, 2)
        h = lstm_forward(z, w[2], w[3], w[4])
        return dense_forward(h, w[5], w[6])


def predict_distributed(
    windows_df: DataFrame, model: NumpyForecastModel, x_col: str = "x"
) -> DataFrame:
    """Apply the model over packed window rows; adds ``y_pred ARRAY<DOUBLE>``.

    Weight arrays travel once per executor in the UDF closure (LSTM(100) +
    Dense is <1 MB — broadcast-sized by construction); each Arrow batch is
    one vectorized NumPy forward pass.
    """
    from pyspark.sql.types import ArrayType, DoubleType

    model_type, weights, dtype = model.model_type, model.weights, model.dtype.str

    @F.pandas_udf(ArrayType(DoubleType()))
    def infer(xs: pd.Series) -> pd.Series:
        local = NumpyForecastModel(model_type, weights, dtype=dtype)
        X = np.array(xs.tolist(), dtype=local.dtype)
        out = local.predict(X)
        return pd.Series(list(out))

    return windows_df.withColumn("y_pred", infer(F.col(x_col)))
