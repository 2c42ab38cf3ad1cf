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

Non-Euler path: the reference calls scipy ``solve_ivp`` (adaptive RK45,
rtol=1e-3, atol=1e-6, dense output at ``t_eval``; ``linear_models.py:72``,
``nonlinear_models.py:52``). scipy is absent here, so ``_rk45_path`` below is
a from-scratch adaptive Dormand-Prince RK5(4) with the same defaults and
PI-free step control, filling the output grid from cubic-Hermite dense
output inside each accepted step. ``method='rk4'`` keeps the fixed-grid
classic RK4 as a cheap deterministic alternative. Stiff-solver names
(``'Radau'``/``'BDF'``/``'LSODA'``) on the LINEAR model return the exact
ZOH-discretized solution via matrix exponential (Van Loan block form) —
stiff-safe at machine precision; on the NONLINEAR continuous model they run
``_trbdf2_path``, an L-stable implicit TR-BDF2 with finite-difference
Jacobian and shared-matrix Newton stages (documented deviation: a different
implicit family than scipy's Radau/BDF, same stability class and
tolerance-controlled accuracy).

Each model is a plain picklable object whose ``simulate`` returns the
reference's dict; ``simulate_rows`` yields the Spark row layout
``(step, t, states, outputs, inputs)`` used by ``models.generators``.
"""

from __future__ import annotations

import numpy as np


# Dormand-Prince RK5(4) tableau (public: Dormand & Prince 1980; same pair
# scipy's RK45 uses). _DP_B is the 5th-order solution weights; _DP_E is the
# embedded 4th-minus-5th error estimator including the FSAL stage.
_DP_C = np.array([1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DP_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_E = np.array(
    [71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40]
)


def _initial_step(rhs, t0, x0, f0, t_span, rtol, atol):
    """Hairer/Wanner starting-step heuristic (the one scipy implements)."""
    scale = atol + rtol * np.abs(x0)
    d0 = np.sqrt(np.mean((x0 / scale) ** 2))
    d1 = np.sqrt(np.mean((f0 / scale) ** 2))
    h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
    f1 = rhs(t0 + h0, x0 + h0 * f0)
    d2 = np.sqrt(np.mean(((f1 - f0) / scale) ** 2)) / h0
    if max(d1, d2) <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1, d2)) ** 0.2
    return min(100 * h0, h1, t_span)


def _rk45_path(rhs, x0: np.ndarray, time: np.ndarray, rtol=1e-3, atol=1e-6) -> np.ndarray:
    """Adaptive Dormand-Prince RK5(4) over ``[time[0], time[-1]]``, sampled at
    ``time`` (uniform ascending grid) via cubic-Hermite dense output.

    Step acceptance: RMS error norm against ``atol + rtol*max(|y0|,|y1|)``
    per component; safety 0.9, growth clamp [0.2, 10], FSAL reuse — the same
    controller scipy's RK45 runs. Dense output is the Hermite cubic on
    ``(y0, f0, y1, f1)`` (O(h^4), one order below scipy's quartic
    interpolant; both are inside the controlled step error at these
    tolerances).
    """
    x = np.asarray(x0, dtype=float)
    n = len(time)
    out = np.zeros((n, len(x)))
    if n == 0:
        return out
    out[0] = x
    if n == 1:
        return out
    t, t_end = float(time[0]), float(time[-1])
    f = rhs(t, x)
    h = _initial_step(rhs, t, x, f, t_end - t, rtol, atol)
    K = np.empty((7, len(x)))
    gi = 1  # next output-grid index to fill
    max_steps = 100 * n + 10_000  # runaway guard far above any sane path
    for _ in range(max_steps):
        if gi >= n:
            return out
        h = min(h, t_end - t)
        K[0] = f
        for s in range(5):
            K[s + 1] = rhs(t + _DP_C[s] * h, x + h * (_DP_A[s] @ K[: s + 1]))
        x_new = x + h * (_DP_A[5] @ K[:6])
        t_new = t + h
        K[6] = rhs(t_new, x_new)  # FSAL: also f at the new point
        scale = atol + rtol * np.maximum(np.abs(x), np.abs(x_new))
        err = np.sqrt(np.mean((h * (_DP_E @ K) / scale) ** 2))
        if err <= 1.0:
            # fill grid points inside (t, t_new] from the Hermite cubic
            while gi < n and time[gi] <= t_new + 1e-12 * max(abs(t_new), 1.0):
                th = (time[gi] - t) / h
                h00 = (1 + 2 * th) * (1 - th) ** 2
                h10 = th * (1 - th) ** 2
                h01 = th * th * (3 - 2 * th)
                h11 = th * th * (th - 1)
                out[gi] = h00 * x + h10 * h * K[0] + h01 * x_new + h11 * h * K[6]
                gi += 1
            t, x, f = t_new, x_new, K[6]
            if t >= t_end - 1e-12 * max(abs(t_end), 1.0):
                while gi < n:  # numerical tail: clamp to the final state
                    out[gi] = x
                    gi += 1
                return out
            h *= min(10.0, max(0.2, 0.9 * err ** -0.2)) if err > 0 else 10.0
        else:
            h *= max(0.2, 0.9 * err ** -0.2)
    raise RuntimeError("RK45 failed to converge: step count exceeded")


def _trbdf2_path(rhs, x0: np.ndarray, time: np.ndarray, rtol=1e-3, atol=1e-6) -> np.ndarray:
    """L-stable one-step implicit TR-BDF2 (Bank et al. 1985; the
    Hosea-Shampine 1996 formulation) for STIFF nonlinear systems, sampled
    at ``time`` via cubic-Hermite dense output — the implicit twin the
    reference reaches through scipy ``solve_ivp(method='Radau'/'BDF')``
    (``nonlinear_models.py:30-35``); scipy is absent here.

    Each step: trapezoidal half-stage to ``t + gamma*h`` then BDF2 stage
    to ``t + h`` with ``gamma = 2 - sqrt(2)``, so BOTH Newton systems
    share one matrix ``M = I - d*h*J`` (``d = gamma/2``) — one
    finite-difference Jacobian + one factorization per step attempt.
    Embedded 3rd-order error estimate from the quadratic collocation of
    ``f`` at the three stage nodes, stiffly filtered through ``M^-1``
    (Hosea-Shampine), controlling ``h`` at order 3. Newton failures
    halve ``h`` — the L-stable step never destabilizes, it just retries
    shorter.
    """
    g = 2.0 - np.sqrt(2.0)  # gamma
    d = g / 2.0
    # BDF2-stage combination coefficients on nodes (t, t+g*h, t+h)
    a_g = 1.0 / (g * (2.0 - g))
    a_n = -((1.0 - g) ** 2) / (g * (2.0 - g))
    # quadratic-collocation quadrature weights over [0, 1] at nodes 0, g, 1
    w0 = 0.5 - 1.0 / (6.0 * g)
    wg = 1.0 / (6.0 * g * (1.0 - g))
    w1 = (1.0 / 3.0 - g / 2.0) / (1.0 - g)

    x = np.asarray(x0, dtype=float)
    nx = len(x)
    n = len(time)
    out = np.zeros((n, nx))
    if n == 0:
        return out
    out[0] = x
    if n == 1:
        return out
    t, t_end = float(time[0]), float(time[-1])
    f = rhs(t, x)

    def jac(t0, y0, f0):
        J = np.empty((nx, nx))
        for j in range(nx):
            eps = np.sqrt(np.finfo(float).eps) * max(abs(y0[j]), 1.0)
            yp = y0.copy()
            yp[j] += eps
            J[:, j] = (rhs(t0, yp) - f0) / eps
        return J

    def newton(M, t_s, guess, const, hd):
        """Solve y = const + hd * f(t_s, y) with the frozen-Jacobian matrix
        M = I - hd*J. Returns (y, f(t_s, y), converged)."""
        y = guess.copy()
        for _ in range(8):
            fy = rhs(t_s, y)
            res = y - const - hd * fy
            try:
                dy = np.linalg.solve(M, res)
            except np.linalg.LinAlgError:
                # Singular iteration matrix (e.g. a pathological FD
                # Jacobian): report a Newton failure so the caller's
                # halve-h retry refreshes J instead of crashing the sim.
                return y, fy, False
            y = y - dy
            scale = atol + rtol * np.abs(y)
            if np.sqrt(np.mean((dy / scale) ** 2)) < 0.1:
                return y, rhs(t_s, y), True
        return y, fy, False

    h = _initial_step(rhs, t, x, f, t_end - t, rtol, atol)
    gi = 1
    max_steps = 100 * n + 10_000
    for _ in range(max_steps):
        if gi >= n:
            return out
        h = min(h, t_end - t)
        J = jac(t, x, f)
        M = np.eye(nx) - d * h * J
        # TR stage to t + g*h
        ok2 = False
        xg, fg, ok1 = newton(M, t + g * h, x + g * h * f, x + d * h * f, d * h)
        if ok1:
            # BDF2 stage to t + h
            x1, f1, ok2 = newton(
                M, t + h, xg, a_g * xg + a_n * x, (1.0 - g) / (2.0 - g) * h
            )
        if not (ok1 and ok2):
            h *= 0.5  # Newton stalled: shorter step, fresher Jacobian
            if h <= 1e-14 * max(abs(t), 1.0):
                raise RuntimeError("TR-BDF2 failed: step underflow in Newton retry")
            continue
        t_new = t + h
        # embedded 3rd-order comparison, stiffly filtered through M^-1
        y3_inc = h * (w0 * f + wg * fg + w1 * f1)
        est = np.linalg.solve(M, y3_inc - (x1 - x))
        scale = atol + rtol * np.maximum(np.abs(x), np.abs(x1))
        err = np.sqrt(np.mean((est / scale) ** 2))
        if err <= 1.0:
            while gi < n and time[gi] <= t_new + 1e-12 * max(abs(t_new), 1.0):
                th = (time[gi] - t) / h
                h00 = (1 + 2 * th) * (1 - th) ** 2
                h10 = th * (1 - th) ** 2
                h01 = th * th * (3 - 2 * th)
                h11 = th * th * (th - 1)
                out[gi] = h00 * x + h10 * h * f + h01 * x1 + h11 * h * f1
                gi += 1
            t, x, f = t_new, x1, f1
            if t >= t_end - 1e-12 * max(abs(t_end), 1.0):
                while gi < n:
                    out[gi] = x
                    gi += 1
                return out
            h *= min(10.0, max(0.2, 0.9 * err ** (-1.0 / 3.0))) if err > 0 else 10.0
        else:
            h *= max(0.2, 0.9 * err ** (-1.0 / 3.0))
    raise RuntimeError("TR-BDF2 failed to converge: step count exceeded")


def _expm(M: np.ndarray) -> np.ndarray:
    """Matrix exponential via Pade(13) scaling-and-squaring (Higham 2005,
    the algorithm scipy.linalg.expm implements), NumPy-only. System matrices
    here are tiny (n <= ~10), so cost is irrelevant; correctness is not."""
    M = np.asarray(M, dtype=float)
    b = (
        64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
        1187353796428800.0, 129060195264000.0, 10559470521600.0,
        670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
        960960.0, 16380.0, 182.0, 1.0,
    )
    nrm = np.linalg.norm(M, 1)
    s = max(0, int(np.ceil(np.log2(nrm / 5.371920351148152))) if nrm > 0 else 0)
    A = M / (2.0**s)
    I = np.eye(A.shape[0])
    A2 = A @ A
    A4 = A2 @ A2
    A6 = A4 @ A2
    U = A @ (
        A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2)
        + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * I
    )
    V = (
        A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2)
        + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * I
    )
    E = np.linalg.solve(V - U, V + U)
    for _ in range(s):
        E = E @ E
    return E


def _zoh_step(A: np.ndarray, tau: float):
    """(E, S) with E = expm(A*tau) and S = integral_0^tau expm(A s) ds, via
    the Van Loan block trick expm([[A, I], [0, 0]] * tau) = [[E, S], [0, I]]."""
    n = A.shape[0]
    blk = np.zeros((2 * n, 2 * n))
    blk[:n, :n] = A * tau
    blk[:n, n:] = np.eye(n) * tau
    big = _expm(blk)
    return big[:n, :n], big[:n, n:]


def _exact_linear_path(A, B, x0, time, u, dt) -> np.ndarray:
    """EXACT solution of dx = Ax + Bu with the reference's zero-order-hold
    input (u constant on [k*dt, (k+1)*dt)), sampled on ``time``. Per grid
    interval the integral splits at ZOH switch points; each segment applies
    the closed form x <- E x + S B u. Stiff-safe at machine precision —
    strictly tighter than any tolerance-bounded ODE solver on this model
    class.
    """
    out = np.zeros((len(time), len(x0)))
    x = np.asarray(x0, dtype=float)
    if len(time):
        out[0] = x
    cache: dict[float, tuple] = {}

    def step(tau):
        key = round(tau, 15)
        if key not in cache:
            cache[key] = _zoh_step(A, tau)
        return cache[key]

    for i in range(1, len(time)):
        t0, t1 = float(time[i - 1]), float(time[i])
        # segment boundaries: ZOH switches strictly inside (t0, t1)
        k0 = int(np.floor(t0 / dt + 1e-12)) + 1
        cuts = [t0] + [k * dt for k in range(k0, int(np.ceil(t1 / dt - 1e-12))) if t0 < k * dt < t1] + [t1]
        for a, bnd in zip(cuts[:-1], cuts[1:]):
            tau = bnd - a
            if tau <= 0:
                continue
            E, S = step(tau)
            uk = u[min(int(a / dt + 1e-12), len(u) - 1)]
            x = E @ x + S @ (B @ uk)
        out[i] = x
    return out


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

    def simulate(self, u, x0, t_final, dt, method="euler", rtol=1e-3, atol=1e-6):
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
            if method == "rk4":
                states = _rk4_path(rhs, x0, time)
            elif method in ("Radau", "BDF", "LSODA", "exact", "zoh"):
                # stiff-solver names: the model is linear, so instead of an
                # implicit iterator we return the EXACT ZOH-discretized
                # solution (matrix exponential) — stiff-safe at machine
                # precision, strictly tighter than scipy's tolerance-bounded
                # Radau on this model class
                states = _exact_linear_path(self.A, self.B, x0, time, u, dt)
            else:  # 'RK45', ... -> adaptive DP5(4), solve_ivp parity
                states = _rk45_path(rhs, x0, time, rtol=rtol, atol=atol)
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

    def simulate(self, u, x0, t_final, dt, method="RK45", rtol=1e-3, atol=1e-6):
        u = np.atleast_2d(np.array(u, dtype=float))
        x0 = np.array(x0, dtype=float)
        n_steps = int(t_final / dt)
        time = np.linspace(0, t_final, n_steps)

        def u_at(t):
            return u[min(int(t / dt), len(u) - 1)]

        rhs = lambda t, x: np.asarray(self.f(x, u_at(t), t), dtype=float)  # noqa: E731
        if method == "rk4":
            states = _rk4_path(rhs, x0, time)
        elif method in ("Radau", "BDF", "LSODA", "trbdf2"):
            # stiff-solver names (reference routes them to scipy solve_ivp,
            # nonlinear_models.py:30-35): L-stable implicit TR-BDF2 — an
            # explicit fallback here would silently diverge or stall on a
            # genuinely stiff plant
            states = _trbdf2_path(rhs, x0, time, rtol=rtol, atol=atol)
        else:
            states = _rk45_path(rhs, x0, time, rtol=rtol, atol=atol)
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
