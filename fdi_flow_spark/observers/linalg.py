"""Pole placement without scipy.

The reference computes observer gains with ``scipy.signal.place_poles(A.T,
C.T, poles)`` (``/root/reference/fdi_flow/state_observers/luenberger.py:73``).
scipy is absent here, so single-output systems use Ackermann's formula (the
textbook method; exact for controllable SISO pairs) and multi-output systems
use dyadic (rank-one) reduction to the SISO case: pick ``q`` so the pair
``(A, B q)`` is controllable — true for almost every ``q`` when ``(A, B)``
is controllable and ``A`` is cyclic — and place with the scalar formula; a
small random preliminary feedback makes ``A`` cyclic when it isn't
(Wonham's lemma). Every candidate gain is verified against the requested
spectrum before being returned, so the deterministic retry loop cannot
hand back a wrong answer silently.
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


def feedback_gain(A: np.ndarray, B: np.ndarray, poles) -> np.ndarray:
    """State-feedback gain K (m, n) so eig(A - B K) = poles, scipy-free.

    m == 1 is Ackermann directly. m > 1 uses dyadic reduction: K = F0 + q k
    with A - B K = (A - B F0) - (B q) k, so a SISO placement on the deflated
    pair finishes the job. q and (when needed) the cyclicity-restoring F0
    come from a seeded generator — the search is deterministic — and the
    returned gain is accepted only after its closed-loop spectrum matches
    the request, which turns "controllable for almost every q" into a
    checked property rather than an assumption.
    """
    A = np.asarray(A, dtype=float)
    B = np.asarray(B, dtype=float)
    if B.ndim == 1:
        B = B[:, None]
    n, m = B.shape
    if m == 1:
        return ackermann_gain(A, B, poles)
    ctrb = np.hstack([np.linalg.matrix_power(A, i) @ B for i in range(n)])
    if np.linalg.matrix_rank(ctrb) < n:
        raise np.linalg.LinAlgError("pair (A, B) is not controllable")
    want = np.sort_complex(np.asarray(poles, dtype=complex))
    scale = max(1.0, float(np.linalg.norm(A, ord="fro")))
    tol = 1e-8 * scale
    rng = np.random.default_rng(0xFD1)
    for attempt in range(64):
        if attempt == 0:
            q = np.ones((m, 1))
            F0 = np.zeros((m, n))
        else:
            q = rng.standard_normal((m, 1))
            # once plain q-search has had a fair run, also perturb A with a
            # preliminary feedback to break non-cyclic (repeated-eigenvalue) A
            F0 = (
                rng.standard_normal((m, n)) * (0.1 * scale)
                if attempt >= 8
                else np.zeros((m, n))
            )
        try:
            k = ackermann_gain(A - B @ F0, B @ q, poles)
        except np.linalg.LinAlgError:
            continue
        K = F0 + q @ k
        got = np.sort_complex(np.linalg.eigvals(A - B @ K))
        if np.allclose(got, want, rtol=1e-8, atol=tol):
            return K
    raise np.linalg.LinAlgError(
        "dyadic pole placement did not converge; the pair may be "
        "near-uncontrollable or the requested spectrum ill-conditioned"
    )


def place_observer_gain(A: np.ndarray, C: np.ndarray, poles) -> np.ndarray:
    """Observer gain L (n, p) so eig(A - L C) = poles (dual of state
    feedback: place poles of (A.T, C.T)). Scipy-free for any p."""
    A = np.asarray(A, dtype=float)
    C = np.atleast_2d(np.asarray(C, dtype=float))
    return feedback_gain(A.T, C.T, poles).T
