"""Seeded Tree-structured Parzen Estimator (TPE) — the optuna-free fallback
for ``search_method='optuna'``.

The reference drives hyperparameter search with optuna's ``TPESampler``
(``/root/reference/fdi_flow/detectors/sklearn_detectors.py:138-189``), an
optional dependency here. This module implements the same algorithm family
from the public description (Bergstra et al., "Algorithms for
Hyper-Parameter Optimization", NeurIPS 2011; optuna's default sampler is
the factorized variant of exactly this): split observed trials into the
top-``gamma`` "good" set and the rest, model each parameter with Parzen
(kernel-density) estimators ``l(x)`` over good and ``g(x)`` over bad
trials, draw candidates from ``l``, and keep the candidate maximizing
``log l(x) - log g(x)``. Numeric dimensions use Gaussian kernels with a
Scott-rule bandwidth floor; categorical dimensions use smoothed count
densities. Everything is driven by one seeded ``numpy`` Generator, so a
search is reproducible end to end.

Search-space grammar matches the detectors' existing random path
(``(lo, hi)`` int range, ``(lo, hi)`` float range, list -> categorical).
"""

from __future__ import annotations

import numpy as np

_N_CANDIDATES = 32
_GAMMA = 0.15
_N_STARTUP = 10  # optuna's default n_startup_trials


def _is_categorical(values) -> bool:
    # same grammar as the detectors' optuna objective: categorical only for
    # str/bool entries; int/float pairs are ranges
    return isinstance(values[0], (str, bool))


def _sample_random(space: dict, rng: np.random.Generator) -> dict:
    params = {}
    for param, values in space.items():
        if _is_categorical(values):
            params[param] = values[int(rng.integers(len(values)))]
        elif isinstance(values[0], int):
            params[param] = int(rng.integers(values[0], values[1] + 1))
        else:
            params[param] = float(rng.uniform(values[0], values[1]))
    return params


def _numeric_log_density(x: np.ndarray, obs: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Log of a Parzen mixture over ``obs`` PLUS a uniform prior component
    (weight 1/(n+1)) — optuna does the same; without the prior the
    estimator collapses onto early observations and stops exploring.
    Bandwidth is floored so a collapsed observation set still covers the
    range."""
    span = max(hi - lo, 1e-12)
    n = len(obs)
    bw = max(
        float(np.std(obs)) * n**-0.2 if n > 1 else 0.0,
        span / 20.0,
        1e-12,
    )
    z = (x[:, None] - obs[None, :]) / bw
    comp = -0.5 * z * z - np.log(bw * np.sqrt(2 * np.pi))
    m = comp.max(axis=1)
    kernels = np.exp(m) * np.exp(comp - m[:, None]).sum(axis=1)  # sum, not mean
    return np.log((kernels + 1.0 / span) / (n + 1.0))


def _categorical_log_density(values, obs: list) -> dict:
    counts = {v: 1.0 for v in values}  # +1 smoothing
    for o in obs:
        counts[o] = counts.get(o, 1.0) + 1.0
    total = sum(counts.values())
    return {v: np.log(c / total) for v, c in counts.items()}


def tpe_suggest(
    history: list,
    space: dict,
    rng: np.random.Generator,
    n_candidates: int = _N_CANDIDATES,
    gamma: float = _GAMMA,
) -> dict:
    """Propose the next trial given ``history`` = [(params, score)] with
    HIGHER scores better. Falls back to a pure random draw during the
    startup phase (fewer than ``_N_STARTUP`` observations)."""
    if len(history) < _N_STARTUP:
        return _sample_random(space, rng)
    ranked = sorted(history, key=lambda t: -t[1])
    n_good = max(1, int(np.ceil(gamma * len(ranked))))
    good = [p for p, _ in ranked[:n_good]]
    bad = [p for p, _ in ranked[n_good:]] or good

    cand_score = np.zeros(n_candidates)
    cand_params: list[dict] = [dict() for _ in range(n_candidates)]
    for param, values in space.items():
        if _is_categorical(values):
            logl = _categorical_log_density(values, [p[param] for p in good])
            logg = _categorical_log_density(values, [p[param] for p in bad])
            # draw candidates from l's category distribution
            probs = np.exp(np.array([logl[v] for v in values]))
            probs /= probs.sum()
            draws = rng.choice(len(values), size=n_candidates, p=probs)
            for i, d in enumerate(draws):
                v = values[int(d)]
                cand_params[i][param] = v
                cand_score[i] += logl[v] - logg[v]
        else:
            lo, hi = float(values[0]), float(values[1])
            is_int = isinstance(values[0], int)
            g_obs = np.array([float(p[param]) for p in good])
            b_obs = np.array([float(p[param]) for p in bad])
            # sample from l's mixture: a good-observation kernel, or (with
            # the prior's 1/(n+1) weight) a uniform draw over the range —
            # the exploration component that keeps boundaries escapable
            span = max(hi - lo, 1e-12)
            bw = max(
                float(np.std(g_obs)) * len(g_obs) ** -0.2 if len(g_obs) > 1 else 0.0,
                span / 20.0,
            )
            centers = g_obs[rng.integers(len(g_obs), size=n_candidates)]
            draws = np.clip(centers + rng.normal(0.0, bw, n_candidates), lo, hi)
            from_prior = rng.random(n_candidates) < 1.0 / (len(g_obs) + 1.0)
            draws = np.where(from_prior, rng.uniform(lo, hi, n_candidates), draws)
            if is_int:
                draws = np.clip(np.round(draws), lo, hi)
            cand_score += _numeric_log_density(draws, g_obs, lo, hi)
            cand_score -= _numeric_log_density(draws, b_obs, lo, hi)
            for i, d in enumerate(draws):
                cand_params[i][param] = int(d) if is_int else float(d)
    return cand_params[int(np.argmax(cand_score))]


def tpe_maximize(objective, space: dict, n_iter: int, seed: int | None = 0) -> tuple[dict, float]:
    """Run ``n_iter`` TPE trials of ``objective(params) -> score`` (higher
    better); returns (best_params, best_score). Deterministic under
    ``seed``."""
    rng = np.random.default_rng(seed)
    history: list = []
    best_params, best_score = None, -np.inf
    for _ in range(max(1, n_iter)):
        params = tpe_suggest(history, space, rng)
        score = float(objective(params))
        history.append((params, score))
        if score > best_score:
            best_params, best_score = params, score
    return best_params, best_score
