"""Pole placement without scipy.

The reference computes observer gains with ``scipy.signal.place_poles(A.T,
C.T, poles)`` (``/root/reference/fdi_flow/state_observers/luenberger.py:73``).
scipy is absent here, so single-output systems use Ackermann's formula (the
textbook method; exact for controllable SISO pairs). Multi-output placement
falls back to scipy when available and raises otherwise — a documented gap,
since every reference example is single-output.
"""

from __future__ import annotations

import numpy as np


def ackermann_gain(A: np.ndarray, b: np.ndarray, poles) -> np.ndarray:
    """Ackermann's formula: state-feedback gain k so eig(A - b k) = poles.

    A: (n,n), b: (n,1) controllable pair; returns k (1,n).
    """
    A = np.asarray(A, dtype=float)
    b = np.asarray(b, dtype=float).reshape(-1, 1)
    n = A.shape[0]
    # controllability matrix
    Cm = np.hstack([np.linalg.matrix_power(A, i) @ b for i in range(n)])
    if np.linalg.matrix_rank(Cm) < n:
        raise np.linalg.LinAlgError("pair (A, b) is not controllable")
    # desired characteristic polynomial phi(A)
    coeffs = np.poly(np.asarray(poles, dtype=complex))  # leading 1
    phi = np.zeros_like(A)
    for c, p in zip(coeffs, range(n, -1, -1)):
        phi = phi + np.real(c) * np.linalg.matrix_power(A, p)
    e_n = np.zeros((1, n))
    e_n[0, -1] = 1.0
    # k = e_n · Cm⁻¹ · φ(A)
    return np.linalg.solve(Cm.T, e_n.T).T @ phi


def place_observer_gain(A: np.ndarray, C: np.ndarray, poles) -> np.ndarray:
    """Observer gain L so eig(A - L C) = poles (dual of state feedback:
    place poles of (A.T, C.T)). Exact via Ackermann for p == 1."""
    A = np.asarray(A, dtype=float)
    C = np.atleast_2d(np.asarray(C, dtype=float))
    p = C.shape[0]
    if p == 1:
        k = ackermann_gain(A.T, C.T, poles)  # (1, n)
        return k.T  # L = k.T -> (n, 1)
    try:
        from scipy.signal import place_poles  # type: ignore

        return place_poles(A.T, C.T, np.asarray(poles)).gain_matrix.T
    except ImportError as e:
        raise NotImplementedError(
            "multi-output pole placement requires scipy.signal.place_poles; "
            "pass an explicit gain matrix L instead"
        ) from e
