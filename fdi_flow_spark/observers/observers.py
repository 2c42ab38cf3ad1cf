"""State observers: step-API classes (reference parity) + distributed batch
replay over ``(series_id, step, u, y)`` rows.

Reference semantics (``/root/reference/fdi_flow/state_observers/``):

- ``LuenbergerObserver`` (``luenberger.py:4-102``): ``dx̂ = Ax̂ + Bu −
  L(Cx̂ − y)``, Euler-integrated with dt; L given or placed at
  ``poles = eig(A) − 1`` by default.
- ``KalmanFilterMatrix`` (``kalman.py:3-91``): predict ``x=Fx+Bu``,
  ``P=FPFᵀ+Q``; update ``K=PHᵀ(HPHᵀ+R)⁻¹``, ``x+=Ky``, ``P=(I−KH)P``.
- ``SlidingModeObserver`` (``sliding_mode.py:4-100``): ``dx̂ = Ax̂ + Bu + LS +
  K·tanh(S/ε)``, ``S = y − Cx̂``; K from the spectral-norm bound heuristic
  (M=1.5, margin 1.5, initial error 1.0). NOTE the reference's ``K @ sign(S)``
  product is only shape-consistent for single-output systems — we keep that
  constraint and assert it.

Replay is ``groupBy(series_id).applyInPandas``: each series replays
sequentially (irreducible recurrence), all series in parallel. The carried
state is O(n²) floats, so the same kernel backs the streaming variant
(``fdi_flow_spark.streaming``) via ``applyInPandasWithState``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fdi_flow_spark.observers.linalg import place_observer_gain


class LuenbergerObserver:
    def __init__(self, A, B, C, dt, x_hat=None, L=None, desired_poles=None):
        self.A = np.array(A, dtype=float)
        self.B = np.array(B, dtype=float)
        self.C = np.atleast_2d(np.array(C, dtype=float))
        self.dt = dt
        n = self.A.shape[0]
        if L is not None:
            self.L = np.array(L, dtype=float)
        else:
            if desired_poles is None:
                desired_poles = np.linalg.eigvals(self.A) - 1
            self.L = place_observer_gain(self.A, self.C, desired_poles)
        self.x_hat = np.zeros((n, 1)) if x_hat is None else np.array(x_hat, dtype=float)

    def update(self, u, y):
        u = np.array(u, dtype=float).reshape(-1, 1)
        y = np.array(y, dtype=float).reshape(-1, 1)
        dx = self.A @ self.x_hat + self.B @ u - self.L @ (self.C @ self.x_hat - y)
        self.x_hat = self.x_hat + dx * self.dt
        return self.x_hat.copy()

    def reset(self, x_hat=None):
        n = self.A.shape[0]
        self.x_hat = np.zeros((n, 1)) if x_hat is None else np.array(x_hat, dtype=float)


class KalmanFilterMatrix:
    def __init__(self, F, B, H, Q, R, x0, P0):
        self.F = np.array(F, dtype=float)
        self.B = np.array(B, dtype=float)
        self.H = np.atleast_2d(np.array(H, dtype=float))
        self.Q = np.array(Q, dtype=float)
        self.R = np.atleast_2d(np.array(R, dtype=float))
        self.x = np.array(x0, dtype=float)
        self.P = np.array(P0, dtype=float)
        self._x0, self._P0 = self.x.copy(), self.P.copy()

    def predict(self, u=None):
        if u is not None:
            self.x = self.F @ self.x + self.B @ np.asarray(u, dtype=float)
        else:
            self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q
        return self.x.copy(), self.P.copy()

    def update(self, z):
        z = np.asarray(z, dtype=float)
        y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(self.P.shape[0]) - K @ self.H) @ self.P
        return self.x.copy(), self.P.copy()

    def step(self, z, u=None):
        self.predict(u)
        return self.update(z)

    def reset(self):
        self.x, self.P = self._x0.copy(), self._P0.copy()


class SlidingModeObserver:
    def __init__(self, A, B, C, desired_poles=None, eta=1.0, eps=0.1):
        self.A = np.array(A, dtype=float)
        self.B = np.array(B, dtype=float)
        self.C = np.atleast_2d(np.array(C, dtype=float))
        self.eta = eta
        self.eps = eps
        self.n = self.A.shape[0]
        self.p = self.C.shape[0]
        if self.p != 1:
            raise ValueError(
                "SlidingModeObserver supports single-output systems only "
                "(the reference's K @ tanh(S/eps) product requires p == 1)"
            )
        if desired_poles is None:
            desired_poles = np.linalg.eigvals(self.A) - 1
        self.desired_poles = desired_poles
        self._compute_gains()

    def _compute_gains(self):
        self.L = place_observer_gain(self.A, self.C, self.desired_poles)
        A_LC = self.A - self.L @ self.C
        alpha = -max(np.linalg.eigvals(A_LC).real)
        M = 1.5
        steady = (M / alpha) * 1.0
        self.e_max = max(1.0, steady) * 1.5
        C_norm = np.linalg.norm(self.C, 2)
        A_LC_norm = np.linalg.norm(A_LC, 2)
        self.K = (C_norm * A_LC_norm * self.e_max + self.eta) * np.ones((self.n, 1))

    def compute_derivative(self, x_hat, y, u):
        u = np.array(u, dtype=float).reshape(-1, 1)
        y = np.array(y, dtype=float).reshape(-1, 1)
        S = y - self.C @ x_hat
        return self.A @ x_hat + self.B @ u + self.L @ S + self.K @ np.tanh(S / self.eps)

    def step(self, x_hat, y, dt, u):
        return x_hat + self.compute_derivative(x_hat, y, u) * dt


REPLAY_SCHEMA = StructType(
    [
        StructField("series_id", StringType()),
        StructField("step", LongType()),
        StructField("x_hat", ArrayType(DoubleType())),
    ]
)


def observer_replay(df: DataFrame, observer_factory, dt: float | None = None) -> DataFrame:
    """Replay an observer over ``(series_id, step, u ARRAY, y ARRAY)`` rows.

    ``observer_factory()`` builds a fresh observer per series on the executor
    (gain computation runs once per series, driver-side matrices ride the
    closure). Supports the three observer classes above; emits
    ``(series_id, step, x_hat ARRAY)`` per input row.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("step")
        obs = observer_factory()
        xs = []
        for _, row in pdf.iterrows():
            u = np.array(row["u"], dtype=float)
            y = np.array(row["y"], dtype=float)
            if isinstance(obs, LuenbergerObserver):
                x = obs.update(u, y).ravel()
            elif isinstance(obs, KalmanFilterMatrix):
                x, _ = obs.step(z=y, u=u if u.size else None)
                x = np.asarray(x).ravel()
            elif isinstance(obs, SlidingModeObserver):
                if not hasattr(obs, "_x_hat_state"):
                    obs._x_hat_state = np.zeros((obs.n, 1))
                obs._x_hat_state = obs.step(obs._x_hat_state, y, dt, u)
                x = obs._x_hat_state.ravel()
            else:
                raise TypeError(f"unsupported observer type {type(obs)}")
            xs.append(x)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].to_numpy(),
                "step": pdf["step"].to_numpy(),
                "x_hat": xs,
            }
        )

    return df.groupBy("series_id").applyInPandas(fn, schema=REPLAY_SCHEMA)


# Drop-in alias: the reference names its matrix observer ``KalmanFilter``
# (``state_observers/kalman.py:3``); ours carries the Matrix suffix to avoid
# clashing with the 1-D preprocessing filter of the same name, but reference
# user code importing ``KalmanFilter`` from the observers module must work.
KalmanFilter = KalmanFilterMatrix
