"""TF-free training for the reference's two forecasting architectures.

The reference compiles Keras models with Adam + MSE and calls ``fit``
(``/root/reference/fdi_flow/forecasting/time_series_model.py:168-235``).
TensorFlow is optional in this environment, so this module implements the
same training mathematics in NumPy against the weight layouts already used
by the inference twins (``forecasting/inference.py``): full
backpropagation-through-time for the LSTM (loss on the last hidden state,
matching ``return_sequences=False``), valid-padding Conv1D / MaxPool1D /
ReLU backward passes for the convlstm stack, inverted Dropout(0.2) on the
LSTM output, MSE loss, and Adam with Keras defaults (lr 1e-3, beta1 0.9,
beta2 0.999, eps 1e-7).

Documented deviation: the resulting weights are not bit-identical to a TF
run (different RNG streams and kernel implementations) — the parity claim
is architectural and mathematical, enforced by central-finite-difference
gradient checks in ``tests/test_forecasting.py``, not byte equality.

Training is driver-side over collected windows, exactly like the
reference's single-node ``model.fit`` (the distributed part of the
forecasting story is data prep and inference); the window count is bounded
by the same collect the reference performs.
"""

from __future__ import annotations

import numpy as np

from fdi_flow_spark.forecasting.inference import (
    NumpyForecastModel,
    _sigmoid,
    conv1d_forward,
    maxpool1d,
)


def _lstm_forward_cached(x, kernel, recurrent, bias):
    """LSTM forward keeping per-step gate/state tensors for BPTT.

    Returns (h_last, cache); cache arrays are (T, n, u)."""
    u = recurrent.shape[0]
    n, T, C = x.shape
    h = np.zeros((n, u), dtype=x.dtype)
    c = np.zeros((n, u), dtype=x.dtype)
    xz = (x.reshape(n * T, C) @ kernel).reshape(n, T, 4 * u) + bias
    I = np.empty((T, n, u), dtype=x.dtype)
    Fg = np.empty_like(I)
    G = np.empty_like(I)
    O = np.empty_like(I)
    Cs = np.empty_like(I)  # c_t
    Hs = np.empty_like(I)  # h_t
    for t in range(T):
        z = xz[:, t, :] + h @ recurrent
        i = _sigmoid(z[:, :u])
        f = _sigmoid(z[:, u : 2 * u])
        g = np.tanh(z[:, 2 * u : 3 * u])
        o = _sigmoid(z[:, 3 * u :])
        c = f * c + i * g
        h = o * np.tanh(c)
        I[t], Fg[t], G[t], O[t], Cs[t], Hs[t] = i, f, g, o, c, h
    return h, (x, I, Fg, G, O, Cs, Hs)


def _lstm_backward(d_h_last, cache, kernel, recurrent):
    """Gradients of a loss seen only through the final hidden state.

    Returns (dKernel, dRecurrent, dBias, dX)."""
    x, I, Fg, G, O, Cs, Hs = cache
    n, T, C = x.shape
    u = recurrent.shape[0]
    dK = np.zeros_like(kernel)
    dR = np.zeros_like(recurrent)
    db = np.zeros(4 * u, dtype=x.dtype)
    dX = np.zeros_like(x)
    dh = d_h_last.astype(x.dtype)
    dc = np.zeros((n, u), dtype=x.dtype)
    for t in range(T - 1, -1, -1):
        i, f, g, o, c = I[t], Fg[t], G[t], O[t], Cs[t]
        c_prev = Cs[t - 1] if t > 0 else np.zeros_like(c)
        h_prev = Hs[t - 1] if t > 0 else np.zeros((n, u), dtype=x.dtype)
        tc = np.tanh(c)
        do = dh * tc
        dc = dc + dh * o * (1.0 - tc * tc)
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dK += x[:, t, :].T @ dz
        dR += h_prev.T @ dz
        db += dz.sum(axis=0)
        dX[:, t, :] = dz @ kernel.T
        dh = dz @ recurrent.T
        dc = dc * f
    return dK, dR, db, dX


def _conv1d_backward(x, W, dy):
    """Valid-padding Conv1D gradients. x: (n,T,C_in), W: (k,C_in,C_out),
    dy: (n, T-k+1, C_out) -> (dW, db, dX)."""
    k, c_in, c_out = W.shape
    n, T, _ = x.shape
    m = T - k + 1
    dyf = dy.reshape(n * m, c_out)
    dW = np.empty_like(W)
    dX = np.zeros_like(x)
    for i in range(k):
        xs = np.ascontiguousarray(x[:, i : m + i, :]).reshape(n * m, c_in)
        dW[i] = xs.T @ dyf
        dX[:, i : m + i, :] += (dyf @ W[i].T).reshape(n, m, c_in)
    db = dyf.sum(axis=0)
    return dW, db, dX


def _maxpool1d_backward(x, pool, dy):
    """Scatter pooled gradients back to the argmax positions."""
    n, T, c = x.shape
    m = T // pool
    xw = np.ascontiguousarray(x[:, : m * pool, :]).reshape(n, m, pool, c)
    arg = xw.argmax(axis=2)  # (n, m, c)
    # build the scatter in a fresh contiguous buffer: reshaping a slice of
    # dX can silently COPY (when T % pool != 0), dropping the writes
    dxw = np.zeros((n, m, pool, c), dtype=x.dtype)
    np.put_along_axis(dxw, arg[:, :, None, :], dy[:, :, None, :], axis=2)
    dX = np.zeros_like(x)
    dX[:, : m * pool, :] = dxw.reshape(n, m * pool, c)
    return dX


class _Adam:
    """Adam with Keras defaults (lr 1e-3, 0.9/0.999, eps 1e-7)."""

    def __init__(self, shapes, lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-7):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.m = [np.zeros(s, dtype=np.float64) for s in shapes]
        self.v = [np.zeros(s, dtype=np.float64) for s in shapes]
        self.t = 0

    def step(self, weights, grads):
        self.t += 1
        lr_t = self.lr * np.sqrt(1.0 - self.b2**self.t) / (1.0 - self.b1**self.t)
        for w, g, m, v in zip(weights, grads, self.m, self.v):
            m *= self.b1
            m += (1.0 - self.b1) * g
            v *= self.b2
            v += (1.0 - self.b2) * g * g
            w -= lr_t * m / (np.sqrt(v) + self.eps)


def _forward_backward(model_type, weights, X, Y, dropout_mask=None):
    """One batch: MSE loss and gradients for every weight array.

    ``dropout_mask`` (n, u) is the pre-scaled inverted-dropout mask applied
    to the LSTM output (identity when None, i.e. at evaluation)."""
    if model_type == "lstm":
        Wk, Wr, bl, Wd, bd = weights
        h, cache = _lstm_forward_cached(X, Wk, Wr, bl)
        hd = h * dropout_mask if dropout_mask is not None else h
        pred = hd @ Wd + bd
        err = pred - Y
        loss = float((err * err).mean())
        dpred = 2.0 * err / err.size
        dWd = hd.T @ dpred
        dbd = dpred.sum(axis=0)
        dh = dpred @ Wd.T
        if dropout_mask is not None:
            dh = dh * dropout_mask
        dWk, dWr, dbl, _ = _lstm_backward(dh, cache, Wk, Wr)
        return loss, [dWk, dWr, dbl, dWd, dbd]
    # convlstm: Conv1D(relu) -> MaxPool(2) -> LSTM -> Dropout -> Dense
    Wc, bc, Wk, Wr, bl, Wd, bd = weights
    zc = conv1d_forward(X, Wc, bc)
    za = np.maximum(zc, 0.0)
    zp = maxpool1d(za, 2)
    h, cache = _lstm_forward_cached(zp, Wk, Wr, bl)
    hd = h * dropout_mask if dropout_mask is not None else h
    pred = hd @ Wd + bd
    err = pred - Y
    loss = float((err * err).mean())
    dpred = 2.0 * err / err.size
    dWd = hd.T @ dpred
    dbd = dpred.sum(axis=0)
    dh = dpred @ Wd.T
    if dropout_mask is not None:
        dh = dh * dropout_mask
    dWk, dWr, dbl, dzp = _lstm_backward(dh, cache, Wk, Wr)
    dza = _maxpool1d_backward(za, 2, dzp)
    dzc = dza * (zc > 0.0)
    dWc, dbc, _ = _conv1d_backward(X, Wc, dzc)
    return loss, [dWc, dbc, dWk, dWr, dbl, dWd, dbd]


def train_numpy_model(
    model_type: str,
    X: np.ndarray,
    Y: np.ndarray,
    epochs: int = 10,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    dropout: float = 0.2,
    units: int = 100,
    seed: int = 0,
    validation_data: tuple | None = None,
    verbose: bool = False,
) -> tuple[NumpyForecastModel, dict]:
    """Train an LSTM / ConvLSTM forecaster in NumPy (Adam + MSE + BPTT).

    X: (n, T) or (n, T, 1); Y: (n, H). Returns the trained
    :class:`NumpyForecastModel` and a Keras-style history dict
    (``{"loss": [...], "val_loss": [...]}``); weights are float64 during
    optimization and ship as float32 (Keras inference dtype)."""
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 2:
        X = X[:, :, None]
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    n, T, _ = X.shape
    out_steps = Y.shape[1]
    init = NumpyForecastModel.init_random(
        model_type, time_steps=T, output_steps=out_steps, seed=seed, units=units
    )
    weights = [np.asarray(w, dtype=np.float64) for w in init.weights]
    u = weights[-2].shape[0]
    opt = _Adam([w.shape for w in weights], lr=learning_rate)
    rng = np.random.default_rng(seed + 1)
    history: dict = {"loss": []}
    if validation_data is not None:
        history["val_loss"] = []
    keep = 1.0 - dropout
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            mask = None
            if dropout > 0.0:
                mask = (rng.random((len(idx), u)) < keep) / keep
            loss, grads = _forward_backward(
                model_type, weights, X[idx], Y[idx], dropout_mask=mask
            )
            opt.step(weights, grads)
            losses.append(loss)
        history["loss"].append(float(np.mean(losses)))
        if validation_data is not None:
            Xv, Yv = validation_data
            vloss, _ = _forward_backward(
                model_type,
                weights,
                np.asarray(Xv, dtype=np.float64).reshape(len(Xv), T, 1),
                np.asarray(Yv, dtype=np.float64).reshape(len(Yv), out_steps),
            )
            history["val_loss"].append(vloss)
        if verbose:
            print(f"epoch {epoch + 1}/{epochs} loss={history['loss'][-1]:.6f}")
    return NumpyForecastModel(model_type, weights), history
