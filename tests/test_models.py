import numpy as np
import pytest

from fdi_flow_spark.models import (
    DynamicSystemDataGenerator,
    LinearContinuousStateSpaceModel,
    LinearDiscreteStateSpaceModel,
    NonlinearDiscreteStateSpaceModel,
    simulate_batch,
)

A = [[0, 1, 0], [0, 0, 1], [-1, -2, -3]]
B = [[0, 0], [1, 0], [0, 1]]
C = [[1, 0, 0], [0, 0, 1]]
D = np.zeros((2, 2))


def test_euler_scalar_closed_form():
    # dx = a x + b u, euler: x_{k+1} = x_k (1 + a dt) + b u dt — closed form
    a, b, u0, x0, dt, tf = -0.5, 2.0, 0.3, 1.0, 0.01, 1.0
    m = LinearContinuousStateSpaceModel([[a]], [[b]], [[1.0]], [[0.0]])
    n_steps = int(tf / dt)
    u = np.full((n_steps, 1), u0)
    res = m.simulate(u, [x0], tf, dt, method="euler")
    r = 1 + a * dt
    ks = np.arange(1, n_steps + 1)
    expected = x0 * r**ks + b * u0 * dt * (r**ks - 1) / (r - 1)
    np.testing.assert_allclose(res["states"][:, 0], expected, rtol=1e-10)
    # euler computes y from the post-update state (reference linear_models.py:63-68)
    np.testing.assert_allclose(res["outputs"][:, 0], expected, rtol=1e-10)


def _exact_states(An, x0, times):
    # exact solution x(t) = expm(A t) x0 via eigendecomposition
    w, V = np.linalg.eig(An)
    Vi = np.linalg.inv(V)
    return np.array([np.real(V @ np.diag(np.exp(w * t)) @ Vi @ x0) for t in times])


def test_rk4_fixed_grid_matches_matrix_exponential():
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 2.0, 0.01
    u = np.zeros((int(tf / dt), 2))
    x0 = np.array([1.0, -0.5, 0.25])
    res = m.simulate(u, x0, tf, dt, method="rk4")
    np.testing.assert_allclose(
        res["states"], _exact_states(np.array(A), x0, res["time"]), atol=1e-7
    )


def test_rk45_default_tolerance_matches_matrix_exponential():
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 2.0, 0.01
    u = np.zeros((int(tf / dt), 2))
    x0 = np.array([1.0, -0.5, 0.25])
    res = m.simulate(u, x0, tf, dt, method="RK45")  # rtol=1e-3/atol=1e-6 defaults
    np.testing.assert_allclose(
        res["states"], _exact_states(np.array(A), x0, res["time"]), atol=5e-4
    )


def test_rk45_tight_tolerance_tracks_exact():
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 2.0, 0.01
    u = np.zeros((int(tf / dt), 2))
    x0 = np.array([1.0, -0.5, 0.25])
    res = m.simulate(u, x0, tf, dt, method="RK45", rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        res["states"], _exact_states(np.array(A), x0, res["time"]), atol=1e-8
    )


def test_rk45_is_adaptive_fewer_rhs_evals_than_fixed_grid():
    # Smooth autonomous decay on a dense output grid: the adaptive integrator
    # must take far fewer rhs evaluations than fixed-grid RK4 (4 per step).
    from fdi_flow_spark.models.systems import _rk45_path

    calls = {"n": 0}

    def rhs(t, x):
        calls["n"] += 1
        return -0.8 * x

    time = np.linspace(0, 5.0, 2001)
    out = _rk45_path(rhs, np.array([3.0]), time)
    np.testing.assert_allclose(out[:, 0], 3.0 * np.exp(-0.8 * time), atol=5e-3)
    assert calls["n"] < 0.25 * (4 * 2000), f"not adaptive: {calls['n']} rhs evals"


def test_rk45_degenerate_grids():
    from fdi_flow_spark.models.systems import _rk45_path

    rhs = lambda t, x: -x  # noqa: E731
    assert _rk45_path(rhs, np.array([1.0]), np.array([])).shape == (0, 1)
    one = _rk45_path(rhs, np.array([1.0]), np.array([0.0]))
    np.testing.assert_allclose(one, [[1.0]])


def test_discrete_closed_form():
    Ad = np.array([[0.9, 0.1], [0.0, 0.8]])
    Bd = np.array([[0.0], [1.0]])
    Cd = np.array([[1.0, 0.0]])
    m = LinearDiscreteStateSpaceModel(Ad, Bd, Cd, [[0.0]])
    n_steps = 25
    rng = np.random.default_rng(1)
    u = rng.normal(0, 1, (n_steps, 1))
    x0 = np.array([1.0, 2.0])
    res = m.simulate(u, x0)
    # independent closed form: x_k(recorded, post-update) = A^{k+1} x0 + sum_{j=0..k} A^{k-j} B u_j
    for k in range(n_steps):
        exact = np.linalg.matrix_power(Ad, k + 1) @ x0
        for j in range(k + 1):
            exact = exact + np.linalg.matrix_power(Ad, k - j) @ Bd @ u[j]
        np.testing.assert_allclose(res["states"][k], exact, rtol=1e-9)
        # y_k from pre-update state
        pre = np.linalg.matrix_power(Ad, k) @ x0
        for j in range(k):
            pre = pre + np.linalg.matrix_power(Ad, k - 1 - j) @ Bd @ u[j]
        np.testing.assert_allclose(res["outputs"][k], Cd @ pre, rtol=1e-9)


def test_nonlinear_discrete_records_pre_update_state():
    f = lambda x, u, k: 0.5 * x + u  # noqa: E731
    g = lambda x, u, k: np.array([x[0] ** 2])  # noqa: E731
    m = NonlinearDiscreteStateSpaceModel(f, g)
    u = np.ones((5, 1))
    res = m.simulate(u, np.array([2.0]))
    np.testing.assert_allclose(res["states"][0], [2.0])  # pre-update recorded
    np.testing.assert_allclose(res["outputs"][0], [4.0])


def test_simulate_batch_matches_local(spark):
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 1.0, 0.01
    n_steps = int(tf / dt)
    rng = np.random.default_rng(3)
    x0s = [rng.normal(0, 1, 3) for _ in range(4)]
    us = [rng.normal(0, 1, (n_steps, 2)) for _ in range(4)]
    sdf = simulate_batch(spark, m, x0s, us, tf, dt).toPandas()
    for i in range(4):
        local = m.simulate(us[i], x0s[i], tf, dt)
        got = sdf[sdf.sim_id == i].sort_values("step")
        np.testing.assert_allclose(np.vstack(got["states"]), local["states"], rtol=1e-12)
        np.testing.assert_allclose(np.vstack(got["outputs"]), local["outputs"], rtol=1e-12)


@pytest.mark.parametrize("signal_type", ["constant", "sine"])
def test_generator_distributed_equals_local(spark, signal_type):
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    gen = DynamicSystemDataGenerator(m, ([-1, -1, -1], [1, 1, 1]), seed=7)
    params = {"frequency": 0.5} if signal_type == "sine" else {"min_val": -2, "max_val": 2}
    local = gen.generate_local(3, signal_type, params, t_final=0.5, dt=0.01)
    dist = gen.generate(spark, 3, signal_type, params, t_final=0.5, dt=0.01).toPandas()
    for i in range(3):
        got = dist[dist.sim_id == i].sort_values("step")
        np.testing.assert_allclose(np.vstack(got["states"]), local[i]["states"], rtol=1e-12)


def test_generator_seeded_determinism():
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    g1 = DynamicSystemDataGenerator(m, ([-1] * 3, [1] * 3), seed=5)
    g2 = DynamicSystemDataGenerator(m, ([-1] * 3, [1] * 3), seed=5)
    r1 = g1.generate_local(2, "sine", {"frequency": 1.0}, t_final=0.2, dt=0.01)
    r2 = g2.generate_local(2, "sine", {"frequency": 1.0}, t_final=0.2, dt=0.01)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a["states"], b["states"])


def test_simulate_discrete_replay_matches_local(spark):
    from fdi_flow_spark.models import (
        LinearDiscreteStateSpaceModel,
        simulate_discrete_replay,
    )

    rng = np.random.default_rng(3)
    m = LinearDiscreteStateSpaceModel(
        [[0.9, 0.1], [-0.05, 0.85]], [[0.1], [0.05]], [[1.0, 0.0]], [[0.3]]
    )
    u = rng.normal(0, 1, size=(50, 1))
    rows = [("s", i, [float(u[i, 0])]) for i in range(50)]
    df = spark.createDataFrame(rows, schema="series_id string, step long, u array<double>")
    got = (
        simulate_discrete_replay(df, m, x0=[0.0, 0.0])
        .orderBy("step")
        .collect()
    )
    exp = m.simulate(u, [0.0, 0.0])
    np.testing.assert_allclose(
        np.array([r.x for r in got]), exp["states"], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.array([r.y for r in got]), exp["outputs"], rtol=0, atol=0
    )


def test_expm_matches_eigendecomposition():
    from fdi_flow_spark.models.systems import _expm

    rng = np.random.default_rng(21)
    for _ in range(5):
        M = rng.normal(0, 1, (4, 4))
        w, V = np.linalg.eig(M)
        expected = np.real(V @ np.diag(np.exp(w)) @ np.linalg.inv(V))
        np.testing.assert_allclose(_expm(M), expected, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(_expm(np.zeros((3, 3))), np.eye(3), atol=1e-14)


def test_radau_linear_exact_constant_input():
    # constant input: independent closed form x(t) = e^{At}x0 + A^{-1}(e^{At}-I)Bu
    # via eigendecomposition — checks E, S, and multi-interval accumulation
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 2.0, 0.01
    n_steps = int(tf / dt)
    u0 = np.array([0.7, -1.3])
    u = np.tile(u0, (n_steps, 1))
    x0 = np.array([1.0, -0.5, 0.25])
    res = m.simulate(u, x0, tf, dt, method="Radau")
    An = np.array(A, dtype=float)
    Bn = np.array(B, dtype=float)
    w, V = np.linalg.eig(An)
    Vi = np.linalg.inv(V)
    Ai = np.linalg.inv(An)
    for i, t in enumerate(res["time"]):
        E = np.real(V @ np.diag(np.exp(w * t)) @ Vi)
        exact = E @ x0 + Ai @ (E - np.eye(3)) @ Bn @ u0
        np.testing.assert_allclose(res["states"][i], exact, atol=1e-10)


def test_radau_switching_input_tracks_rk45():
    # switching ZOH input: the exact path handles the jumps analytically;
    # RK45's stages straddle them, so agreement is at RK45's realistic
    # discontinuity-crossing accuracy (~1e-5), not its smooth-problem one
    m = LinearContinuousStateSpaceModel(A, B, C, D)
    tf, dt = 2.0, 0.01
    n_steps = int(tf / dt)
    rng = np.random.default_rng(3)
    u = rng.normal(0, 1, (n_steps, 2))
    x0 = np.array([1.0, -0.5, 0.25])
    exact = m.simulate(u, x0, tf, dt, method="Radau")
    tight = m.simulate(u, x0, tf, dt, method="RK45", rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(exact["states"], tight["states"], atol=5e-5)


def test_radau_stiff_system_machine_precision():
    # lambda = -1e5 with coarse output grid: explicit methods need ~1e5 rhs
    # evals; the ZOH-exact path is closed-form per step
    lam = -1e5
    m = LinearContinuousStateSpaceModel([[lam]], [[0.0]], [[1.0]], [[0.0]])
    tf, dt = 1.0, 0.01
    u = np.zeros((int(tf / dt), 1))
    res = m.simulate(u, [1.0], tf, dt, method="Radau")
    expected = np.exp(lam * res["time"])
    np.testing.assert_allclose(res["states"][:, 0], expected, atol=1e-12)


# ------------------------------------------------- stiff nonlinear (TR-BDF2)

def _vdp(mu):
    def f(x, u, t):
        return np.array([x[1], mu * (1.0 - x[0] ** 2) * x[1] - x[0]])

    def g(x, u, t):
        return np.array([x[0]])

    return f, g


def test_trbdf2_matches_tight_rk45_on_van_der_pol_stiff():
    """Stiff van der Pol (mu=1000): the implicit TR-BDF2 path behind the
    reference's Radau/BDF names must track a tight-tolerance explicit
    reference solution — and do it with far fewer RHS evaluations than
    the stability-limited explicit method needs."""
    from fdi_flow_spark.models import NonlinearStateSpaceModel

    mu = 1000.0
    calls = {"n": 0}
    f_raw, g_raw = _vdp(mu)

    def f(x, u, t):
        calls["n"] += 1
        return f_raw(x, u, t)

    m = NonlinearStateSpaceModel(f, g_raw)
    tf, dt = 3.0, 0.01
    u = np.zeros((int(tf / dt), 1))
    x0 = [2.0, 0.0]

    calls["n"] = 0
    imp = m.simulate(u, x0, tf, dt, method="Radau", rtol=1e-6, atol=1e-9)
    implicit_evals = calls["n"]

    calls["n"] = 0
    ref = m.simulate(u, x0, tf, dt, method="RK45", rtol=1e-8, atol=1e-11)
    explicit_evals = calls["n"]

    # quasi-static relaxation phase: x1 decays slowly from 2 along the
    # slow manifold; both solvers must agree pointwise
    np.testing.assert_allclose(imp["states"][:, 0], ref["states"][:, 0], atol=2e-4)
    assert 1.9 < imp["states"][-1, 0] < 2.0  # physically sane end state
    # the stability limit (|h*lambda| ~ 3, lambda ~ -3*mu) forces the
    # explicit method to ~6 evals per h<=1e-3 step; implicit steps are
    # error-limited instead
    assert explicit_evals > 5 * implicit_evals, (explicit_evals, implicit_evals)


def test_trbdf2_singular_iteration_matrix_retries_not_crashes():
    """r7-ADVICE pin: a singular Newton iteration matrix (pathological FD
    Jacobian) must surface as a Newton failure -> halve-h retry with a
    fresh Jacobian, NOT a LinAlgError crash. Forced deterministically by
    making the first np.linalg.solve calls raise; the completed run must
    match the unpatched golden."""
    from unittest import mock

    from fdi_flow_spark.models import NonlinearStateSpaceModel

    f_raw, g_raw = _vdp(5.0)
    m = NonlinearStateSpaceModel(f_raw, g_raw)
    tf, dt = 1.0, 0.01
    u = np.zeros((int(tf / dt), 1))
    x0 = [2.0, 0.0]
    golden = m.simulate(u, x0, tf, dt, method="Radau", rtol=1e-6, atol=1e-9)

    real_solve = np.linalg.solve
    state = {"left": 3}

    def flaky_solve(a, b):
        if state["left"] > 0:
            state["left"] -= 1
            raise np.linalg.LinAlgError("Singular matrix")
        return real_solve(a, b)

    with mock.patch.object(np.linalg, "solve", flaky_solve):
        res = m.simulate(u, x0, tf, dt, method="Radau", rtol=1e-6, atol=1e-9)
    assert state["left"] == 0  # the failure path genuinely exercised
    np.testing.assert_allclose(res["states"], golden["states"], atol=1e-5)


def test_trbdf2_accuracy_on_stiff_linear_plant():
    """Parity vs machine-precision ZOH on a stiff linear plant wrapped as a
    user f/g: TR-BDF2 at default tolerances stays within ~rtol of exact."""
    from fdi_flow_spark.models import (
        LinearContinuousStateSpaceModel,
        NonlinearStateSpaceModel,
    )

    Ast = np.array([[-1000.0, 0.0], [1.0, -1.0]])
    m_lin = LinearContinuousStateSpaceModel(Ast, [[0.0], [0.0]], [[0.0, 1.0]], [[0.0]])
    m_non = NonlinearStateSpaceModel(
        lambda x, u, t: Ast @ x, lambda x, u, t: np.array([x[1]])
    )
    tf, dt = 2.0, 0.01
    u = np.zeros((int(tf / dt), 1))
    x0 = [1.0, 1.0]
    exact = m_lin.simulate(u, x0, tf, dt, method="Radau")
    imp = m_non.simulate(u, x0, tf, dt, method="BDF", rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(imp["states"], exact["states"], atol=1e-4)
