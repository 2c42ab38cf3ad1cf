"""Fault-detector classifiers as MLlib Pipelines, mirroring the reference's
seven-detector API (``/root/reference/fdi_flow/detectors/``): constructor
hyperparameters + ``param_search_space``/``n_iter``/``search_method``/``cv``/
``random_state``, then ``fit(X, y, test_size=0.2, optimize=False)``,
``predict``, ``predict_proba``, ``score`` (accuracy), ``get_params``, and
``get_feature_importances`` for tree models
(``sklearn_detectors.py:19-253`` KNN API shape, repeated for each backend).

Backend mapping (documented deviations where MLlib lacks an exact analog):

| reference backend | here |
|---|---|
| sklearn KNeighborsClassifier   | exact relational KNN (crossJoin+rank+vote; LSH route at scale) |
| sklearn RandomForestClassifier | MLlib RandomForestClassifier |
| sklearn GradientBoosting       | MLlib GBTClassifier (+OneVsRest for multiclass) |
| sklearn SVC (rbf)              | MLlib LinearSVC + OneVsRest; rbf via random Fourier features |
| XGBClassifier                  | xgboost.spark if installed, else GBT+OVR |
| LGBMClassifier                 | GBT+OVR (31-leaf analog via maxDepth~5) |
| CatBoostClassifier             | GBT+OVR (iterations->maxIter, depth->maxDepth, lr->stepSize) |

Search: ``search_method='random'`` draws ``n_iter`` seeded parameter dicts
from ``param_search_space`` (int range -> randint, float range -> uniform,
list -> choice — the reference's distribution rules,
``sklearn_detectors.py:114-122``) and scores each by k-fold CV with a
deterministic ``pmod(hash(id), cv)`` fold column. ``'optuna'`` keeps the
reference's TPE driver loop when optuna is installed, and otherwise runs
the built-in seeded TPE sampler (``ml/tpe.py``, same algorithm family) —
the search mode works in any environment.

Data ingress: ``fit``/``predict`` accept numpy/pandas/list (reference parity;
rows get a stable ``_row_id`` so predictions return in input order) or a
Spark DataFrame with feature columns + label column (the distributed path).
The reference's double-scaling ``score()`` bug in the SVM detector
(``sklearn_detectors.py:796-800``) is intentionally NOT reproduced.
"""

from __future__ import annotations

import random as _random

import numpy as np
import pandas as pd
from pyspark.ml import Pipeline, Transformer
from pyspark.ml.classification import (
    GBTClassifier,
    LinearSVC,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StandardScaler as MLStandardScaler
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession, functions as F


def _active_spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is None:
        from fdi_flow_spark.core.session import get_spark

        s = get_spark()
    return s


class BaseFaultDetector:
    """Shared fit/predict/score/search machinery over an MLlib Pipeline."""

    def __init__(
        self,
        param_search_space=None,
        n_iter=10,
        search_method="random",
        cv=5,
        random_state=None,
    ):
        self.param_search_space = param_search_space
        self.n_iter = n_iter
        self.search_method = search_method
        self.cv = cv
        self.random_state = random_state
        self.best_params_ = None
        self.model_ = None
        self.is_fitted = False
        self._feature_cols: list[str] | None = None

    # ---- data ingress -------------------------------------------------
    def _to_train_df(self, X, y) -> DataFrame:
        if isinstance(X, DataFrame):
            if isinstance(y, str):
                df = X.withColumnRenamed(y, "label")
            else:
                df = X
            self._feature_cols = [c for c in df.columns if c not in ("label", "_row_id")]
            return df.withColumn("label", F.col("label").cast("double"))
        X = np.asarray(X, dtype=float)
        y = np.asarray(y).ravel()
        spark = _active_spark()
        self._feature_cols = [f"f{i}" for i in range(X.shape[1])]
        rows = [
            (int(i), *[float(v) for v in X[i]], float(y[i])) for i in range(len(X))
        ]
        schema = (
            "_row_id long, "
            + ", ".join(f"{c} double" for c in self._feature_cols)
            + ", label double"
        )
        return spark.createDataFrame(rows, schema=schema)

    def _to_pred_df(self, X) -> DataFrame:
        if isinstance(X, DataFrame):
            return X
        X = np.asarray(X, dtype=float)
        spark = _active_spark()
        rows = [(int(i), *[float(v) for v in X[i]]) for i in range(len(X))]
        schema = "_row_id long, " + ", ".join(f"{c} double" for c in self._feature_cols)
        return spark.createDataFrame(rows, schema=schema)

    # ---- to be provided by subclasses ---------------------------------
    def _default_params(self) -> dict:
        raise NotImplementedError

    def _build_pipeline(self, params: dict, n_classes: int) -> Pipeline:
        raise NotImplementedError

    # ---- search -------------------------------------------------------
    def _sample_params(self, rng: "_random.Random") -> dict:
        out = {}
        for param, values in self.param_search_space.items():
            v0 = values[0]
            if isinstance(v0, bool) or isinstance(v0, str):
                out[param] = rng.choice(list(values))
            elif isinstance(v0, int) and len(values) == 2 and isinstance(values[1], int):
                out[param] = rng.randrange(values[0], values[1])  # randint [lo, hi)
            elif isinstance(v0, float):
                out[param] = rng.uniform(values[0], values[1])
            else:
                out[param] = rng.choice(list(values))
        return out

    def _cv_accuracy(self, df: DataFrame, params: dict, n_classes: int) -> float:
        folds = df.withColumn(
            "_fold",
            F.pmod(F.xxhash64(*[F.col(c) for c in self._feature_cols]), F.lit(self.cv)),
        ).cache()
        evaluator = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        )
        scores = []
        for k in range(self.cv):
            train = folds.where(F.col("_fold") != k)
            val = folds.where(F.col("_fold") == k)
            model = self._build_pipeline(params, n_classes).fit(train)
            scores.append(evaluator.evaluate(model.transform(val)))
        folds.unpersist()
        return float(np.mean(scores))

    def _optimize_random(self, df: DataFrame, n_classes: int):
        rng = _random.Random(self.random_state)
        best_score, best_params = -1.0, None
        for _ in range(self.n_iter):
            params = self._sample_params(rng)
            score = self._cv_accuracy(df, params, n_classes)
            if score > best_score:
                best_score, best_params = score, params
        return best_params

    def _optimize_optuna(self, df: DataFrame, n_classes: int):
        """TPE search. Uses optuna's ``TPESampler`` when optuna is
        installed (exact reference parity); otherwise runs the built-in
        seeded TPE implementation (``ml/tpe.py`` — same algorithm family,
        Bergstra et al. 2011 factorized Parzen estimators)."""
        try:
            import optuna
            from optuna.samplers import TPESampler
        except ImportError:
            from fdi_flow_spark.ml.tpe import tpe_maximize

            best_params, _ = tpe_maximize(
                lambda params: self._cv_accuracy(df, params, n_classes),
                self.param_search_space,
                n_iter=self.n_iter,
                seed=self.random_state,
            )
            return best_params

        def objective(trial):
            params = {}
            for param, values in self.param_search_space.items():
                v0 = values[0]
                if isinstance(v0, str) or isinstance(v0, bool):
                    params[param] = trial.suggest_categorical(param, list(values))
                elif isinstance(v0, int):
                    params[param] = trial.suggest_int(param, values[0], values[1])
                else:
                    params[param] = trial.suggest_float(param, values[0], values[1])
            return self._cv_accuracy(df, params, n_classes)

        study = optuna.create_study(
            direction="maximize", sampler=TPESampler(seed=self.random_state)
        )
        study.optimize(objective, n_trials=self.n_iter)
        return study.best_params

    # ---- public API ---------------------------------------------------
    def fit(self, X, y=None, test_size: float = 0.2, optimize: bool = False):
        df = self._to_train_df(X, y).cache()
        n_classes = df.agg(F.countDistinct("label")).first()[0]
        self._n_classes = int(n_classes)
        params = self._default_params()
        if optimize and self.param_search_space is not None:
            if self.search_method == "random":
                found = self._optimize_random(df, self._n_classes)
            elif self.search_method == "optuna":
                found = self._optimize_optuna(df, self._n_classes)
            else:
                raise ValueError("search_method must be either 'random' or 'optuna'")
            self.best_params_ = found
            params = {**params, **found}
        self.model_ = self._build_pipeline(params, self._n_classes).fit(df)
        df.unpersist()
        self.is_fitted = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.is_fitted:
            raise RuntimeError("Model must be fitted before prediction")
        return self.model_.transform(df)

    def predict(self, X):
        pred = self.transform(self._to_pred_df(X))
        if "_row_id" in pred.columns:
            rows = pred.select("_row_id", "prediction").orderBy("_row_id").collect()
            return np.array([r.prediction for r in rows])
        return pred.select("prediction")

    def predict_proba(self, X):
        pred = self.transform(self._to_pred_df(X))
        if "probability" not in pred.columns:
            raise RuntimeError("this backend does not expose class probabilities")
        rows = pred.select("_row_id", "probability").orderBy("_row_id").collect()
        return np.array([r.probability.toArray() for r in rows])

    def score(self, X, y) -> float:
        if isinstance(X, DataFrame):
            pred = self.transform(X)
            label = y if isinstance(y, str) else "label"
            return (
                pred.select(
                    F.avg((F.col("prediction") == F.col(label).cast("double")).cast("double"))
                ).first()[0]
            )
        yhat = self.predict(X)
        y = np.asarray(y).ravel().astype(float)
        return float(np.mean(yhat == y))

    def get_params(self) -> dict:
        if self.best_params_ is not None:
            return self.best_params_
        return self._default_params()

    def get_feature_importances(self) -> dict:
        if not self.is_fitted:
            raise RuntimeError("Model must be fitted first")
        stages = self.model_.stages
        last = stages[-1]
        if hasattr(last, "featureImportances"):
            imp = last.featureImportances.toArray()
            return {c: float(v) for c, v in zip(self._feature_cols, imp)}
        raise RuntimeError("this backend does not expose feature importances")


class _AssembledPipelineDetector(BaseFaultDetector):
    """Detectors built as VectorAssembler (+scaler) -> classifier."""

    scale_features = False

    def _classifier(self, params: dict, n_classes: int):
        raise NotImplementedError

    def _build_pipeline(self, params: dict, n_classes: int) -> Pipeline:
        stages = [
            VectorAssembler(inputCols=self._feature_cols, outputCol="_features_raw")
        ]
        feat_col = "_features_raw"
        if self.scale_features:
            stages.append(
                MLStandardScaler(
                    inputCol=feat_col, outputCol="_features", withMean=True, withStd=True
                )
            )
            feat_col = "_features"
        clf = self._classifier(params, n_classes)
        clf.setFeaturesCol(feat_col)
        stages.append(clf)
        return Pipeline(stages=stages)


class RandomForestFaultDetector(_AssembledPipelineDetector):
    """Reference D2 (``sklearn_detectors.py:256-518``): 100 trees, gini,
    sqrt feature subset; exposes feature importances."""

    def __init__(
        self,
        n_estimators=100,
        criterion="gini",
        max_depth=None,
        min_samples_split=2,
        min_samples_leaf=1,
        max_features="sqrt",
        param_search_space=None,
        n_iter=10,
        search_method="random",
        cv=5,
        random_state=None,
    ):
        super().__init__(param_search_space, n_iter, search_method, cv, random_state)
        self.n_estimators = n_estimators
        self.criterion = criterion
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.min_samples_leaf = min_samples_leaf
        self.max_features = max_features

    def _default_params(self):
        return {
            "n_estimators": self.n_estimators,
            "criterion": self.criterion,
            "max_depth": self.max_depth,
            "min_samples_leaf": self.min_samples_leaf,
            "max_features": self.max_features,
        }

    def _classifier(self, params, n_classes):
        subset = {"sqrt": "sqrt", "log2": "log2", None: "all", "auto": "auto"}.get(
            params.get("max_features", "sqrt"), "sqrt"
        )
        return RandomForestClassifier(
            labelCol="label",
            numTrees=int(params.get("n_estimators", 100)),
            impurity={"gini": "gini", "entropy": "entropy"}.get(
                params.get("criterion", "gini"), "gini"
            ),
            maxDepth=int(params["max_depth"]) if params.get("max_depth") else 10,
            minInstancesPerNode=int(params.get("min_samples_leaf", 1)),
            featureSubsetStrategy=subset,
            seed=self.random_state or 42,
        )


class GradientBoostingFaultDetector(_AssembledPipelineDetector):
    """Reference D4 (``sklearn_detectors.py:818-1163``): lr 0.1, depth 3.
    GBTClassifier is binary-only; multiclass wraps in OneVsRest."""

    def __init__(
        self,
        n_estimators=100,
        learning_rate=0.1,
        max_depth=3,
        subsample=1.0,
        param_search_space=None,
        n_iter=10,
        search_method="random",
        cv=5,
        random_state=None,
    ):
        super().__init__(param_search_space, n_iter, search_method, cv, random_state)
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.subsample = subsample

    def _default_params(self):
        return {
            "n_estimators": self.n_estimators,
            "learning_rate": self.learning_rate,
            "max_depth": self.max_depth,
            "subsample": self.subsample,
        }

    def _classifier(self, params, n_classes):
        gbt = GBTClassifier(
            labelCol="label",
            maxIter=int(params.get("n_estimators", 100)),
            stepSize=float(params.get("learning_rate", 0.1)),
            maxDepth=int(params.get("max_depth", 3)),
            subsamplingRate=float(params.get("subsample", 1.0)),
            seed=self.random_state or 42,
        )
        if n_classes > 2:
            return OneVsRest(classifier=gbt, labelCol="label")
        return gbt

    def get_feature_importances(self):
        last = self.model_.stages[-1]
        if hasattr(last, "featureImportances"):
            imp = last.featureImportances.toArray()
            return {c: float(v) for c, v in zip(self._feature_cols, imp)}
        # OneVsRest: average importances across the per-class models
        if hasattr(last, "models"):
            imps = [m.featureImportances.toArray() for m in last.models]
            mean = np.mean(imps, axis=0)
            return {c: float(v) for c, v in zip(self._feature_cols, mean)}
        raise RuntimeError("no feature importances available")


class _RandomFourierFeatures(Transformer):
    """Rahimi & Recht (2007) random-feature map: z(x) = sqrt(2/D) *
    cos(W x + b) with W ~ N(0, 2*gamma*I), b ~ U[0, 2pi), so
    E[z(x).z(y)] = exp(-gamma*||x-y||^2) — the RBF kernel. A linear model on
    z approximates the kernel machine.

    The map runs as ONE Arrow-batched pandas_udf GEMM per batch (seeded W/b
    ride the closure): expanding it as d*D nested column expressions blows
    up Catalyst analysis and generated-method size at realistic widths
    (d=50, D=100 -> ~5000 Add nodes) long before executor compute would."""

    def __init__(self, input_col: str, W: np.ndarray, b: np.ndarray, output_col: str):
        super().__init__()
        self._input_col = input_col
        self._W = np.asarray(W, dtype=float)
        self._b = np.asarray(b, dtype=float)
        self._output_col = output_col

    def _transform(self, dataset):
        from pyspark.ml.functions import array_to_vector, vector_to_array

        W, b = self._W, self._b
        scale = float(np.sqrt(2.0 / len(b)))

        @F.pandas_udf("array<double>")
        def rff(col: pd.Series) -> pd.Series:
            X = np.vstack(col.to_numpy())  # (batch, d) — one flat GEMM
            Z = np.cos(X @ W.T + b) * scale
            return pd.Series(list(Z))

        return dataset.withColumn(
            self._output_col,
            array_to_vector(rff(vector_to_array(F.col(self._input_col)))),
        )


class SVMFaultDetector(_AssembledPipelineDetector):
    """Reference D3 (``sklearn_detectors.py:521-815``): SVC, default
    ``kernel='rbf'`` (``:546``). MLlib has no kernel SVM, so:

    - ``kernel='linear'``: LinearSVC (+OneVsRest for multiclass), exact.
    - ``kernel='rbf'``: random-Fourier-feature approximation — a seeded
      ``_RandomFourierFeatures`` map (``n_components`` cosine features,
      default 100) followed by LinearSVC. This approximates the RBF kernel
      machine (error ~ O(1/sqrt(n_components))); it is a documented
      approximation, not exact SVC, but serves the reference's *default*
      kernel instead of rejecting it — and since r4 ``'rbf'`` IS the
      default here too. ``gamma='scale'`` replays sklearn's
      1/(n_features * X.var()) **in sklearn's order of operations**: the
      reference scales first, then SVC derives gamma from the scaled X —
      post-StandardScaler the flattened variance is 1, so with
      ``scale_features=True`` gamma = 1/n_features; the training-set
      variance aggregate is only needed for raw (unscaled) input.
    - other kernels (poly/sigmoid) raise.

    ``scale_features`` adds an MLlib StandardScaler stage (before the RFF
    map, matching the reference's scale-then-SVC order). The reference
    ``score()`` double-scaling bug (``:796-800``) is not reproduced.

    ``probability=True`` serves ``predict_proba`` the same way sklearn's SVC
    does (``sklearn_detectors.py:772-773``): Platt scaling — a per-class
    sigmoid ``p = 1/(1+exp(A f + B))`` fitted on the decision margins with
    Lin/Lidén target smoothing, OVR probabilities normalized across
    classes. The Newton fit runs on SUFFICIENT STATISTICS (one small
    aggregate over the cached margin frame per iteration), so calibration
    is fully distributed — no margins ever reach the driver. With
    ``probability=False`` it raises, like the reference."""

    def __init__(
        self,
        C=1.0,
        kernel="rbf",  # reference default (sklearn_detectors.py:525)
        gamma="scale",
        probability=False,
        scale_features=True,
        max_iter=100,
        n_components=100,
        param_search_space=None,
        n_iter=10,
        search_method="random",
        cv=5,
        random_state=None,
    ):
        super().__init__(param_search_space, n_iter, search_method, cv, random_state)
        if kernel not in ("linear", "rbf"):
            raise NotImplementedError(
                f"kernel={kernel!r}: MLlib provides no kernel SVM; supported "
                "here: 'linear' (exact LinearSVC) and 'rbf' (random Fourier "
                "feature approximation)"
            )
        self.C = C
        self.kernel = kernel
        self.gamma = gamma
        self.probability = probability
        self.scale_features = scale_features
        self.max_iter = max_iter
        self.n_components = n_components
        self._gamma_value: float | None = None

    def _default_params(self):
        return {"C": self.C, "kernel": self.kernel, "max_iter": self.max_iter}

    def fit(self, X, y=None, test_size: float = 0.2, optimize: bool = False):
        if self.kernel == "rbf":
            if isinstance(self.gamma, (int, float)):
                self._gamma_value = float(self.gamma)
            elif self.scale_features:
                # sklearn order of operations: scale X first, THEN derive
                # gamma='scale' from the scaled matrix — whose flattened
                # variance is 1 (each standardized column has mean 0, var 1),
                # so gamma = 1/(n_features * 1). Computing the variance on the
                # raw X here would widen/narrow the kernel whenever raw
                # feature variance != 1. (_to_train_df sets _feature_cols.)
                self._to_train_df(X, y)
                self._gamma_value = 1.0 / len(self._feature_cols)
            else:  # raw input: 1 / (n_features * Var(flattened X))
                df = self._to_train_df(X, y)
                d = len(self._feature_cols)
                agg = df.select(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.col(c)).alias(f"s{i}") for i, c in enumerate(self._feature_cols)],
                    *[
                        F.sum(F.col(c) * F.col(c)).alias(f"q{i}")
                        for i, c in enumerate(self._feature_cols)
                    ],
                ).first()
                n_vals = float(agg["n"]) * d
                s = sum(float(agg[f"s{i}"]) for i in range(d))
                q = sum(float(agg[f"q{i}"]) for i in range(d))
                var = q / n_vals - (s / n_vals) ** 2
                self._gamma_value = 1.0 / (d * var) if var > 1e-24 else 1.0
        super().fit(X, y, test_size=test_size, optimize=optimize)
        if self.probability:
            self._fit_platt(X, y)
        return self

    def _build_pipeline(self, params, n_classes):
        if self.kernel != "rbf":
            return super()._build_pipeline(params, n_classes)
        stages = [
            VectorAssembler(inputCols=self._feature_cols, outputCol="_features_raw")
        ]
        feat_col = "_features_raw"
        if self.scale_features:
            stages.append(
                MLStandardScaler(
                    inputCol=feat_col, outputCol="_features", withMean=True, withStd=True
                )
            )
            feat_col = "_features"
        rng = np.random.default_rng(self.random_state if self.random_state is not None else 0)
        d = len(self._feature_cols)
        D = int(self.n_components)
        W = rng.standard_normal((D, d)) * np.sqrt(2.0 * self._gamma_value)
        b = rng.uniform(0.0, 2.0 * np.pi, size=D)
        stages.append(_RandomFourierFeatures(feat_col, W, b, "_rff_features"))
        clf = self._classifier(params, n_classes)
        clf.setFeaturesCol("_rff_features")
        stages.append(clf)
        return Pipeline(stages=stages)

    def _classifier(self, params, n_classes):
        svc = LinearSVC(
            labelCol="label",
            regParam=1.0 / max(float(params.get("C", 1.0)), 1e-12),
            maxIter=int(params.get("max_iter", 100)),
        )
        if n_classes > 2:
            return OneVsRest(classifier=svc, labelCol="label")
        return svc

    # ---- Platt scaling ------------------------------------------------
    def _margin_cols(self, df: DataFrame) -> tuple[DataFrame, list[str]]:
        """Apply the fitted pipeline's feature stages, then emit one margin
        column per class: the binary LinearSVC decision value, or each OVR
        submodel's decision value."""
        from pyspark.ml.functions import vector_to_array

        feats = df
        for stage in self.model_.stages[:-1]:
            feats = stage.transform(feats)
        clf = self.model_.stages[-1]
        if hasattr(clf, "models"):  # OneVsRestModel
            cols = []
            for i, sub in enumerate(clf.models):
                sub = sub.copy()
                sub.set(sub.predictionCol, f"_p{i}")
                sub.set(sub.rawPredictionCol, f"_raw{i}")
                feats = sub.transform(feats)
                feats = feats.withColumn(
                    f"_m{i}", vector_to_array(F.col(f"_raw{i}"))[1]
                ).drop(f"_p{i}", f"_raw{i}")
                cols.append(f"_m{i}")
            return feats, cols
        scored = clf.transform(feats)
        return (
            scored.withColumn("_m0", vector_to_array(F.col(clf.getRawPredictionCol()))[1]),
            ["_m0"],
        )

    @staticmethod
    def _platt_newton(df: DataFrame, margin_col: str, target_col: str) -> tuple[float, float]:
        """Platt (1999) sigmoid fit with Lin et al. (2007) smoothed targets,
        by Newton's method over distributed sufficient statistics."""
        counts = df.agg(
            F.sum(F.col(target_col)).alias("np"),
            F.sum(1 - F.col(target_col)).alias("nn"),
        ).first()
        n_pos, n_neg = float(counts["np"]), float(counts["nn"])
        t_pos = (n_pos + 1.0) / (n_pos + 2.0)
        t_neg = 1.0 / (n_neg + 2.0)
        t = F.when(F.col(target_col) > 0, F.lit(t_pos)).otherwise(F.lit(t_neg))
        a, b = 0.0, float(np.log((n_neg + 1.0) / (n_pos + 1.0)))
        f = F.col(margin_col)
        for _ in range(25):
            z = F.lit(a) * f + F.lit(b)
            # p = P(y=1) = 1/(1+exp(z)) in Platt's parameterization
            p = 1.0 / (1.0 + F.exp(F.greatest(F.least(z, F.lit(35.0)), F.lit(-35.0))))
            d = p - t  # dLoss/dz has sign -(t - p) under this parameterization
            w = p * (1.0 - p)
            g = df.agg(
                F.sum(-d * f).alias("ga"),
                F.sum(-d).alias("gb"),
                F.sum(w * f * f).alias("haa"),
                F.sum(w * f).alias("hab"),
                F.sum(w).alias("hbb"),
            ).first()
            ga, gb = float(g["ga"]), float(g["gb"])
            haa, hab, hbb = float(g["haa"]) + 1e-12, float(g["hab"]), float(g["hbb"]) + 1e-12
            det = haa * hbb - hab * hab
            if abs(det) < 1e-24:
                break
            da = (hbb * ga - hab * gb) / det
            db = (haa * gb - hab * ga) / det
            a -= da
            b -= db
            if abs(da) < 1e-10 and abs(db) < 1e-10:
                break
        return a, b

    def _fit_platt(self, X, y) -> None:
        df = self._to_train_df(X, y)
        scored, cols = self._margin_cols(df)
        scored = scored.cache()
        self._platt_ = []
        for i, c in enumerate(cols):
            tgt = (
                (F.col("label") == float(i)).cast("double")
                if len(cols) > 1
                else F.col("label")
            )
            self._platt_.append(
                self._platt_newton(scored.withColumn("_t", tgt), c, "_t")
            )
        scored.unpersist()

    def predict_proba(self, X):
        if not self.probability:
            raise RuntimeError(
                "predict_proba requires probability=True (reference "
                "sklearn_detectors.py:772-773); refit with probability=True"
            )
        scored, cols = self._margin_cols(self._to_pred_df(X))
        probs = []
        for i, c in enumerate(cols):
            a, b = self._platt_[i]
            z = F.lit(a) * F.col(c) + F.lit(b)
            probs.append(
                (1.0 / (1.0 + F.exp(F.greatest(F.least(z, F.lit(35.0)), F.lit(-35.0)))))
                .alias(f"_pr{i}")
            )
        if "_row_id" not in scored.columns:
            # Spark-DataFrame ingress: stay lazy, but return the SAME
            # semantics as the numpy path — binary adds P(class 0),
            # multiclass normalizes the per-class sigmoids to a simplex.
            lazy = scored.select(*probs)
            if len(cols) == 1:
                return lazy.select(
                    (1.0 - F.col("_pr0")).alias("p0"), F.col("_pr0").alias("p1")
                )
            total = sum((F.col(f"_pr{i}") for i in range(1, len(cols))), F.col("_pr0"))
            return lazy.select(
                *[(F.col(f"_pr{i}") / total).alias(f"p{i}") for i in range(len(cols))]
            )
        out = scored.select("_row_id", *probs)
        rows = out.orderBy("_row_id").collect()
        if len(cols) == 1:  # binary: P(class1), P(class0) = 1 - p
            p1 = np.array([r["_pr0"] for r in rows])
            return np.column_stack([1.0 - p1, p1])
        mat = np.array([[r[f"_pr{i}"] for i in range(len(cols))] for r in rows])
        return mat / mat.sum(axis=1, keepdims=True)


def xgboost_spark_available() -> bool:
    """True when the distributed ``xgboost.spark`` estimator is importable —
    the backend :class:`XGBFaultDetector` actually uses is then the exact
    XGBoost algorithm rather than the MLlib GBT approximation."""
    try:
        import xgboost.spark  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


class XGBFaultDetector(GradientBoostingFaultDetector):
    """Reference D5 (``xgb_detectors.py:17-374``). Uses the distributed
    ``xgboost.spark.SparkXGBClassifier`` when xgboost is installed (keeps the
    exact algorithm); otherwise falls back to MLlib GBT (+OVR) with the same
    hyperparameter names — a documented approximation. After ``fit`` (or the
    first classifier construction), ``backend_`` records which one actually
    ran: ``"xgboost.spark"`` or ``"mllib-gbt"`` — tests and the registry
    query surface it so driver evidence is honest about what it proves."""

    backend_: str | None = None

    def _classifier(self, params, n_classes):
        try:
            from xgboost.spark import SparkXGBClassifier  # type: ignore

            self.backend_ = "xgboost.spark"
            return SparkXGBClassifier(
                label_col="label",
                n_estimators=int(params.get("n_estimators", 100)),
                learning_rate=float(params.get("learning_rate", 0.1)),
                max_depth=int(params.get("max_depth", 3)),
            )
        except ImportError:
            self.backend_ = "mllib-gbt"
            return super()._classifier(params, n_classes)


class LGBMFaultDetector(GradientBoostingFaultDetector):
    """Reference D6 (``lgbm_detectors.py:15-365``): LightGBM gbdt with 31
    leaves. Maps to MLlib GBT: num_leaves -> maxDepth≈ceil(log2(leaves)),
    n_estimators/learning_rate pass through. Documented approximation
    (SynapseML LightGBM would keep the exact algorithm but adds a non-Spark
    dependency)."""

    def __init__(self, num_leaves=31, **kw):
        super().__init__(**kw)
        self.num_leaves = num_leaves

    def _default_params(self):
        return {**super()._default_params(), "num_leaves": self.num_leaves}

    def _classifier(self, params, n_classes):
        leaves = int(params.get("num_leaves", 31))
        params = {**params, "max_depth": max(2, int(np.ceil(np.log2(leaves))))}
        return super()._classifier(params, n_classes)


class CatBoostFaultDetector(GradientBoostingFaultDetector):
    """Reference D7 (``catboost_detector.py:15-298``): 500 iterations, lr
    0.03, depth 6. Maps iterations->maxIter, depth->maxDepth, lr->stepSize;
    CatBoost-specific knobs (border_count, bagging_temperature) have no MLlib
    analog and are accepted but ignored (documented)."""

    def __init__(
        self,
        iterations=500,
        learning_rate=0.03,
        depth=6,
        border_count=None,
        bagging_temperature=None,
        **kw,
    ):
        super().__init__(
            n_estimators=iterations, learning_rate=learning_rate, max_depth=depth, **kw
        )
        self.iterations = iterations
        self.depth = depth
        self.border_count = border_count
        self.bagging_temperature = bagging_temperature


class KNNFaultDetector(BaseFaultDetector):
    """Reference D1 (``sklearn_detectors.py:19-253``) — exact distributed
    KNN: no training, prediction is distance -> rank -> vote over the stored
    train set (SQL, no Python in the loop). ``weights='distance'`` uses 1/d
    votes. ``algorithm``/``leaf_size`` are accepted for API parity and
    ignored (there is no kd-tree in a distributed scan; the LSH route in
    ``fdi_flow_spark.pipelines.similarity`` is the scale analog)."""

    def __init__(
        self,
        n_neighbors=5,
        weights="uniform",
        algorithm="auto",
        leaf_size=30,
        p=2,
        metric="minkowski",
        param_search_space=None,
        n_iter=10,
        search_method="random",
        cv=5,
        random_state=None,
    ):
        super().__init__(param_search_space, n_iter, search_method, cv, random_state)
        if metric not in ("minkowski", "euclidean"):
            raise NotImplementedError(f"metric {metric!r} not supported")
        self.n_neighbors = n_neighbors
        self.weights = weights
        self.algorithm = algorithm
        self.leaf_size = leaf_size
        self.p = p
        self.metric = metric

    def _default_params(self):
        return {
            "n_neighbors": self.n_neighbors,
            "weights": self.weights,
            "algorithm": self.algorithm,
            "leaf_size": self.leaf_size,
            "p": self.p,
            "metric": self.metric,
        }

    def fit(self, X, y=None, test_size: float = 0.2, optimize: bool = False):
        df = self._to_train_df(X, y)
        if optimize and self.param_search_space is not None:
            if self.search_method == "random":
                self.best_params_ = self._optimize_random(df, 0)
            elif self.search_method == "optuna":
                self.best_params_ = self._optimize_optuna(df, 0)
            else:
                raise ValueError("search_method must be either 'random' or 'optuna'")
        self._train_df = df.cache()
        self._train_df.count()
        self.classes_ = [
            float(r[0])
            for r in self._train_df.select("label").distinct().orderBy("label").collect()
        ]
        self.is_fitted = True
        return self

    def _vote_df(self, test_df: DataFrame, params: dict, train_df: DataFrame) -> DataFrame:
        """Per-(test row, class) vote mass: count of the k nearest train rows
        in that class (uniform) or their inverse-distance weight sum
        (weights='distance'). Shared by ``predict`` (argmax) and
        ``predict_proba`` (normalized shares, reference
        ``sklearn_detectors.py:206-219``)."""
        from pyspark.sql import Window

        k = int(params.get("n_neighbors", 5))
        p = int(params.get("p", 2))
        weights = params.get("weights", "uniform")
        tr = train_df.select(
            F.col("_row_id").alias("_tid"),
            F.array(*[F.col(c) for c in self._feature_cols]).alias("_tv"),
            F.col("label").alias("_tl"),
        )
        te = test_df.select(
            "_row_id", F.array(*[F.col(c) for c in self._feature_cols]).alias("_sv")
        )
        diff = F.zip_with(F.col("_sv"), F.col("_tv"), lambda a, b: F.abs(a - b))
        if p == 2:
            dist = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
        else:
            dist = F.aggregate(
                diff, F.lit(0.0), lambda acc, x: acc + F.pow(x, float(p))
            )
        pairs = tr.crossJoin(F.broadcast(te)).select(
            "_row_id", "_tid", "_tl", dist.alias("_d")
        )
        w = Window.partitionBy("_row_id").orderBy(F.col("_d").asc(), F.col("_tid").asc())
        knn = pairs.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
        if weights == "distance":
            vote = F.sum(1.0 / F.sqrt(F.greatest(F.col("_d"), F.lit(1e-24))))
        else:
            vote = F.count("*").cast("double")
        return knn.groupBy("_row_id", "_tl").agg(vote.alias("_vote"))

    def _predict_df(self, test_df: DataFrame, params: dict, train_df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        votes = self._vote_df(test_df, params, train_df)
        vw = Window.partitionBy("_row_id").orderBy(F.col("_vote").desc(), F.col("_tl").asc())
        return (
            votes.withColumn("_vr", F.row_number().over(vw))
            .where(F.col("_vr") == 1)
            .select("_row_id", F.col("_tl").alias("prediction"))
        )

    def _cv_accuracy(self, df: DataFrame, params: dict, n_classes: int) -> float:
        folds = df.withColumn(
            "_fold",
            F.pmod(F.xxhash64(*[F.col(c) for c in self._feature_cols]), F.lit(self.cv)),
        ).cache()
        scores = []
        for kf in range(self.cv):
            train = folds.where(F.col("_fold") != kf)
            val = folds.where(F.col("_fold") == kf)
            pred = self._predict_df(val, params, train)
            joined = val.join(pred, "_row_id")
            acc = joined.select(
                F.avg((F.col("prediction") == F.col("label")).cast("double"))
            ).first()[0]
            scores.append(acc or 0.0)
        folds.unpersist()
        return float(np.mean(scores))

    def predict(self, X):
        if not self.is_fitted:
            raise RuntimeError("Model must be fitted before prediction")
        te = self._to_pred_df(X)
        params = self.best_params_ or self._default_params()
        pred = self._predict_df(te, params, self._train_df)
        if isinstance(X, DataFrame):
            return pred
        rows = pred.orderBy("_row_id").collect()
        return np.array([r.prediction for r in rows])

    def score(self, X, y) -> float:
        yhat = self.predict(X)
        return float(np.mean(yhat == np.asarray(y).ravel().astype(float)))

    def predict_proba(self, X):
        """Normalized vote shares per class (reference KNN
        ``predict_proba``, ``sklearn_detectors.py:206-219``): fraction of
        the k nearest neighbors in each class (uniform) or their
        inverse-distance weight shares (``weights='distance'``) — exactly
        sklearn's semantics for this estimator, not a calibration.

        numpy/pandas input returns an ``(n, n_classes)`` array with classes
        in sorted order (``self.classes_``); Spark DataFrame input returns
        ``(_row_id, probability ARRAY<DOUBLE>)`` in the same class order.
        ``argmax`` ties break toward the lowest class, matching
        ``predict``'s (vote DESC, label ASC) ordering."""
        if not self.is_fitted:
            raise RuntimeError("Model must be fitted before prediction")
        from pyspark.sql import Window

        te = self._to_pred_df(X)
        params = self.best_params_ or self._default_params()
        votes = self._vote_df(te, params, self._train_df)
        share = F.col("_vote") / F.sum("_vote").over(Window.partitionBy("_row_id"))
        shares = votes.select("_row_id", "_tl", share.alias("_p"))
        m = shares.groupBy("_row_id").agg(
            F.map_from_entries(F.collect_list(F.struct("_tl", "_p"))).alias("_m")
        )
        arr = F.array(
            *[F.coalesce(F.col("_m")[float(c)], F.lit(0.0)) for c in self.classes_]
        )
        out = m.select("_row_id", arr.alias("probability"))
        if isinstance(X, DataFrame):
            return out
        rows = out.orderBy("_row_id").collect()
        return np.array([r.probability for r in rows])
