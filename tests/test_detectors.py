import numpy as np
import pytest

from fdi_flow_spark.ml import (
    CatBoostFaultDetector,
    GradientBoostingFaultDetector,
    KNNFaultDetector,
    LGBMFaultDetector,
    RandomForestFaultDetector,
    SVMFaultDetector,
)


def _blobs(n_per_class=60, n_features=5, n_classes=3, seed=42, spread=1.0):
    """Seeded gaussian blobs — the engine-side analog of the reference's
    make_classification demo data (examples/detectors.ipynb)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, (n_classes, n_features))
    X = np.vstack(
        [centers[c] + rng.normal(0, spread, (n_per_class, n_features)) for c in range(n_classes)]
    )
    y = np.repeat(np.arange(n_classes), n_per_class)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


@pytest.fixture(scope="module")
def data(spark):
    X, y = _blobs()
    n_train = int(len(y) * 0.8)
    return (X[:n_train], y[:n_train], X[n_train:], y[n_train:])


def test_knn_detector(spark, data):
    Xtr, ytr, Xte, yte = data
    det = KNNFaultDetector(n_neighbors=5).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.9
    assert det.get_params()["n_neighbors"] == 5


def test_knn_distance_weights(spark, data):
    Xtr, ytr, Xte, yte = data
    det = KNNFaultDetector(n_neighbors=5, weights="distance").fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.9


@pytest.mark.parametrize("weights", ["uniform", "distance"])
def test_knn_predict_proba_vote_shares(spark, data, weights):
    """Reference KNN exposes predict_proba (sklearn_detectors.py:206-219):
    here it is the normalized vote shares already computed for predict —
    rows sum to 1, classes in sorted order, argmax equals predict (ties
    break toward the lower class in both)."""
    Xtr, ytr, Xte, yte = data
    det = KNNFaultDetector(n_neighbors=5, weights=weights).fit(Xtr, ytr)
    proba = det.predict_proba(Xte)
    assert proba.shape == (len(Xte), 3)
    assert det.classes_ == [0.0, 1.0, 2.0]
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-9)
    assert (proba >= 0).all()
    pred = det.predict(Xte)
    np.testing.assert_array_equal(np.array(det.classes_)[proba.argmax(axis=1)], pred)
    if weights == "uniform":  # shares are multiples of 1/k
        np.testing.assert_allclose(proba * 5, np.round(proba * 5), atol=1e-9)


def test_random_forest_detector(spark, data):
    Xtr, ytr, Xte, yte = data
    det = RandomForestFaultDetector(n_estimators=20, random_state=42).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.9
    imps = det.get_feature_importances()
    assert set(imps) == {f"f{i}" for i in range(5)}
    assert abs(sum(imps.values()) - 1.0) < 1e-6


def test_gbt_multiclass_ovr(spark, data):
    Xtr, ytr, Xte, yte = data
    det = GradientBoostingFaultDetector(n_estimators=10, random_state=42).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.85
    imps = det.get_feature_importances()  # averaged over OVR models
    assert len(imps) == 5


def test_svm_linear(spark, data):
    Xtr, ytr, Xte, yte = data
    det = SVMFaultDetector(C=1.0, kernel="linear", max_iter=50).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.85
    with pytest.raises(RuntimeError):
        det.predict_proba(Xte)


def test_svm_default_kernel_is_rbf(spark, data):
    """A reference user calling SVMFaultDetector() gets kernel='rbf'
    (sklearn_detectors.py:525) — served by the RFF path — and with
    scale_features=True, gamma='scale' follows sklearn's order of
    operations: derived from the SCALED matrix (variance 1), so
    gamma = 1/n_features."""
    Xtr, ytr, Xte, yte = data
    det = SVMFaultDetector(max_iter=50, random_state=42)
    assert det.kernel == "rbf"
    det.fit(Xtr, ytr)
    assert det._gamma_value == pytest.approx(1.0 / Xtr.shape[1])
    assert det.score(Xte, yte) > 0.85


def test_svm_rbf_random_fourier(spark, data):
    """kernel='rbf' (the reference's default) runs via the seeded random-
    Fourier-feature map and must classify the blobs about as well as the
    linear kernel does (same 0.85 floor)."""
    Xtr, ytr, Xte, yte = data
    det = SVMFaultDetector(kernel="rbf", max_iter=50, random_state=42).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.85
    assert det._gamma_value is not None and det._gamma_value > 0


def test_svm_rejects_unsupported_kernels():
    with pytest.raises(NotImplementedError):
        SVMFaultDetector(kernel="poly")


def test_lgbm_and_catboost_aliases(spark, data):
    Xtr, ytr, Xte, yte = data
    det = LGBMFaultDetector(num_leaves=15, n_estimators=10, random_state=42).fit(Xtr, ytr)
    assert det.score(Xte, yte) > 0.85
    det2 = CatBoostFaultDetector(iterations=10, depth=3, random_state=42).fit(Xtr, ytr)
    assert det2.score(Xte, yte) > 0.85


def test_random_search_returns_params_in_space(spark, data):
    Xtr, ytr, Xte, yte = data
    space = {"n_neighbors": [3, 10], "weights": ["uniform", "distance"]}
    det = KNNFaultDetector(
        param_search_space=space, n_iter=3, cv=2, random_state=42
    ).fit(Xtr, ytr, optimize=True)
    assert 3 <= det.best_params_["n_neighbors"] < 10
    assert det.best_params_["weights"] in space["weights"]
    assert det.score(Xte, yte) > 0.85


def test_rf_random_search(spark, data):
    Xtr, ytr, Xte, yte = data
    space = {"n_estimators": [5, 15], "max_depth": [2, 6]}
    det = RandomForestFaultDetector(
        param_search_space=space, n_iter=2, cv=2, random_state=1
    ).fit(Xtr, ytr, optimize=True)
    assert 5 <= det.best_params_["n_estimators"] < 15
    assert det.score(Xte, yte) > 0.85


def test_binary_gbt_probability(spark):
    X, y = _blobs(n_classes=2, n_per_class=50)
    det = GradientBoostingFaultDetector(n_estimators=10).fit(X[:80], y[:80])
    proba = det.predict_proba(X[80:])
    assert proba.shape == (20, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-6)


def test_xgb_backend_evidence(spark, data):
    """Records WHICH backend the XGB detector actually ran — the exact
    xgboost.spark algorithm or the documented MLlib-GBT fallback — and
    asserts it matches the environment. The backend name prints into the
    test output so a round's evidence is explicit about what it proves."""
    from fdi_flow_spark.ml import XGBFaultDetector, xgboost_spark_available

    Xtr, ytr, Xte, yte = data
    det = XGBFaultDetector(n_estimators=5, max_depth=3, random_state=42)
    det.fit(Xtr, ytr)
    expected = "xgboost.spark" if xgboost_spark_available() else "mllib-gbt"
    print(f"\nXGBFaultDetector backend_: {det.backend_}")
    assert det.backend_ == expected
    assert det.score(Xte, yte) > 0.85


def test_tpe_sampler_beats_random_and_respects_space():
    """The built-in TPE (ml/tpe.py) on a known objective: stays inside the
    space grammar (int range / float range / categorical), is deterministic
    under seed, and reaches a better optimum than seeded random sampling
    with the same 40-trial budget."""
    from fdi_flow_spark.ml.tpe import _sample_random, tpe_maximize

    space = {"n": (1, 40), "c": (0.01, 10.0), "kind": ["a", "b", "c"]}

    def objective(p):
        assert isinstance(p["n"], int) and 1 <= p["n"] <= 40
        assert isinstance(p["c"], float) and 0.01 <= p["c"] <= 10.0
        assert p["kind"] in ("a", "b", "c")
        return (
            -((p["n"] - 17) ** 2) / 100.0
            - (np.log10(p["c"]) - 0.5) ** 2
            + (0.5 if p["kind"] == "b" else 0.0)
        )

    best, score = tpe_maximize(objective, space, n_iter=40, seed=11)
    best2, score2 = tpe_maximize(objective, space, n_iter=40, seed=11)
    assert best == best2 and score == score2  # deterministic
    # aggregate comparison over seeds (single-seed wins are luck-sensitive
    # in a 40-trial budget): TPE must win the majority and the mean
    wins, tpe_scores, rand_scores = 0, [], []
    for seed in range(8):
        _, s = tpe_maximize(objective, space, n_iter=40, seed=seed)
        rng = np.random.default_rng(seed)
        r = max(objective(_sample_random(space, rng)) for _ in range(40))
        wins += s >= r
        tpe_scores.append(s)
        rand_scores.append(r)
    assert wins >= 5, (wins, tpe_scores, rand_scores)
    assert np.mean(tpe_scores) > np.mean(rand_scores)
    assert abs(best["n"] - 17) <= 4 and best["kind"] == "b"


def test_detector_optuna_search_without_optuna(spark, data):
    """search_method='optuna' works in this optuna-free environment via the
    built-in TPE fallback and returns params inside the declared space."""
    try:
        import optuna  # noqa: F401

        pytest.skip("optuna installed; fallback not exercised")
    except ImportError:
        pass
    Xtr, ytr, Xte, yte = data
    space = {"n_neighbors": (3, 9), "weights": ["uniform", "distance"]}
    det = KNNFaultDetector(
        param_search_space=space, n_iter=4, cv=2, search_method="optuna", random_state=5
    ).fit(Xtr, ytr, optimize=True)
    assert 3 <= det.best_params_["n_neighbors"] <= 9
    assert det.best_params_["weights"] in space["weights"]
    assert det.score(Xte, yte) > 0.85


def test_svm_platt_predict_proba_binary(spark):
    """probability=True serves Platt-calibrated probabilities: valid
    simplex rows, argmax == predict, and monotone in the decision margin
    (reference SVC probability semantics, sklearn_detectors.py:772-773)."""
    import numpy as np

    from fdi_flow_spark.ml.detectors import SVMFaultDetector

    rng = np.random.default_rng(19)
    X = np.vstack([rng.normal(-2, 1, (60, 4)), rng.normal(2, 1, (60, 4))])
    y = np.array([0] * 60 + [1] * 60)
    det = SVMFaultDetector(probability=True, random_state=0).fit(X, y)
    proba = det.predict_proba(X)
    assert proba.shape == (120, 2)
    assert np.all(proba >= 0) and np.all(proba <= 1)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-9)
    pred = det.predict(X)
    agree = (proba.argmax(axis=1) == pred).mean()
    assert agree >= 0.99
    # calibration is informative: confident on class means
    assert proba[:5, 0].mean() > 0.8 and proba[-5:, 1].mean() > 0.8


def test_svm_platt_predict_proba_multiclass_and_gate(spark):
    import numpy as np
    import pytest as _pytest

    from fdi_flow_spark.ml.detectors import SVMFaultDetector

    rng = np.random.default_rng(29)
    centers = [(-3, 0), (3, 0), (0, 4)]
    X = np.vstack([rng.normal(c, 0.7, (40, 2)) for c in centers])
    y = np.repeat([0, 1, 2], 40)
    det = SVMFaultDetector(probability=True, random_state=1).fit(X, y)
    proba = det.predict_proba(X)
    assert proba.shape == (120, 3)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-9)
    agree = (proba.argmax(axis=1) == det.predict(X)).mean()
    assert agree >= 0.95  # OVR normalization can disagree on boundary points
    # the gate is reference-parity: probability=False raises
    det2 = SVMFaultDetector(probability=False).fit(X, y)
    with _pytest.raises(RuntimeError):
        det2.predict_proba(X)
