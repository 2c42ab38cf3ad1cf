import numpy as np
import pytest

from fdi_flow_spark.models import LinearContinuousStateSpaceModel
from fdi_flow_spark.observers import (
    KalmanFilterMatrix,
    LuenbergerObserver,
    SlidingModeObserver,
    observer_replay,
    place_observer_gain,
)

# FIXTURES.md §6 system (from reference examples/state_observers.ipynb)
A = np.array([[-2.0, 1.0], [1.0, -1.0]])
B = np.array([[-1.0], [1.0]])
C = np.array([[1.0, 0.0]])
DT = 0.1
N_STEPS = 200


def _simulate_truth():
    m = LinearContinuousStateSpaceModel(A, B, C, [[0.0]])
    u = np.zeros((N_STEPS, 1))
    for i in range(N_STEPS):
        u[i] = 10 * np.sin(2 * np.pi * i * DT) * DT
    res = m.simulate(u, [2.0, 3.0], N_STEPS * DT, DT, method="euler")
    return u, res


def test_pole_placement_exact():
    poles = np.array([-3.0, -4.0])
    L = place_observer_gain(A, C, poles)
    got = np.sort(np.linalg.eigvals(A - L @ C).real)
    np.testing.assert_allclose(got, np.sort(poles), rtol=1e-9)


def test_pole_placement_mimo_two_outputs():
    """Dyadic-reduction placement on a 2-output, 4-state system (scipy-free
    MIMO path): eig(A - L C) must match the requested spectrum to 1e-9,
    including a complex-conjugate pair."""
    rng = np.random.default_rng(42)
    A4 = rng.standard_normal((4, 4))
    C2 = rng.standard_normal((2, 4))
    poles = np.array([-1.0, -2.0, -3.0 + 1.0j, -3.0 - 1.0j])
    L = place_observer_gain(A4, C2, poles)
    assert L.shape == (4, 2)
    got = np.sort_complex(np.linalg.eigvals(A4 - L @ C2))
    np.testing.assert_allclose(got, np.sort_complex(poles), rtol=1e-9, atol=1e-9)


def test_pole_placement_mimo_noncyclic_A():
    """A with a repeated eigenvalue in two Jordan blocks is not cyclic, so
    no single q makes (A.T, C.T q) controllable — the preliminary-feedback
    branch (Wonham's lemma) must kick in."""
    A3 = np.diag([0.0, 0.0, 1.0])
    C2 = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    poles = np.array([-1.0, -2.0, -4.0])
    L = place_observer_gain(A3, C2, poles)
    got = np.sort(np.linalg.eigvals(A3 - L @ C2).real)
    np.testing.assert_allclose(got, np.sort(poles), rtol=1e-8, atol=1e-9)


def test_pole_placement_unobservable_raises():
    A2 = np.zeros((3, 3))
    C2 = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # third state invisible
    with pytest.raises(np.linalg.LinAlgError):
        place_observer_gain(A2, C2, [-1.0, -2.0, -3.0])


def test_luenberger_converges():
    u, truth = _simulate_truth()
    obs = LuenbergerObserver(A, B, C, DT, desired_poles=[-3.0, -4.0])
    errs = []
    for i in range(N_STEPS):
        y = truth["outputs"][i]
        x_hat = obs.update(u[i], y)
        errs.append(np.linalg.norm(x_hat.ravel() - truth["states"][i]))
    assert np.mean(errs[-50:]) < 0.2 * np.mean(errs[:10]) + 1e-9


def test_kalman_matrix_converges_noiseless():
    F = np.array([[1.0, DT], [0.0, 1.0]])
    Bm = np.zeros((2, 1))
    H = np.array([[1.0, 0.0]])
    Q = 1e-5 * np.eye(2)
    R = np.array([[1e-2]])
    kf = KalmanFilterMatrix(F, Bm, H, Q, R, x0=np.zeros(2), P0=np.eye(2))
    x_true = np.array([0.0, 1.0])
    for _ in range(100):
        x_true = F @ x_true
        kf.step(z=H @ x_true)
    assert np.linalg.norm(kf.x - x_true) < 0.2
    np.testing.assert_allclose(kf.P, kf.P.T, rtol=1e-8)  # covariance symmetric


def test_sliding_mode_requires_single_output():
    with pytest.raises(ValueError):
        SlidingModeObserver(np.eye(2), np.ones((2, 1)), np.eye(2))


def test_sliding_mode_tracks():
    # finer dt than the Luenberger fixture: the reference's K heuristic is
    # large, so Euler integration at dt=0.1 chatters with amplitude ~K*dt
    dt, n_steps = 0.005, 2000
    m = LinearContinuousStateSpaceModel(A, B, C, [[0.0]])
    u = np.zeros((n_steps, 1))
    for i in range(n_steps):
        u[i] = 10 * np.sin(2 * np.pi * i * dt) * dt
    truth = m.simulate(u, [2.0, 3.0], n_steps * dt, dt, method="euler")
    smo = SlidingModeObserver(A, B, C, desired_poles=[-3.0, -4.0], eta=1.0, eps=0.1)
    x_hat = np.zeros((2, 1))
    errs = []
    for i in range(n_steps):
        y = truth["outputs"][i]
        x_hat = smo.step(x_hat, y, dt, u[i])
        errs.append(abs(x_hat[0, 0] - truth["states"][i, 0]))
    assert np.mean(errs[-200:]) < 0.2


def _replay_df(spark, u, truth):
    rows = [
        ("sys1", i, [float(u[i, 0])], [float(truth["outputs"][i, 0])])
        for i in range(N_STEPS)
    ]
    return spark.createDataFrame(
        rows, schema="series_id string, step long, u array<double>, y array<double>"
    )


def test_observer_replay_matches_local_luenberger(spark):
    u, truth = _simulate_truth()
    df = _replay_df(spark, u, truth)
    factory = lambda: LuenbergerObserver(A, B, C, DT, desired_poles=[-3.0, -4.0])  # noqa: E731
    got = observer_replay(df, factory).toPandas().sort_values("step")
    obs = factory()
    for i, row in enumerate(got.itertuples()):
        expected = obs.update(u[i], truth["outputs"][i]).ravel()
        np.testing.assert_allclose(np.array(row.x_hat), expected, rtol=1e-12)


def test_observer_replay_matches_local_kalman(spark):
    u, truth = _simulate_truth()
    df = _replay_df(spark, u, truth)
    F = np.eye(2) + A * DT
    factory = lambda: KalmanFilterMatrix(  # noqa: E731
        F, B * DT, C, 1e-4 * np.eye(2), np.array([[1e-2]]), x0=np.zeros(2), P0=np.eye(2)
    )
    got = observer_replay(df, factory).toPandas().sort_values("step")
    kf = factory()
    for i, row in enumerate(got.itertuples()):
        expected, _ = kf.step(z=truth["outputs"][i], u=u[i])
        np.testing.assert_allclose(np.array(row.x_hat), expected.ravel(), rtol=1e-12)
