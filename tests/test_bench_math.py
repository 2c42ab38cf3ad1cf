"""Unit tests for bench.py's gate math (no Spark needed): the load
calibration and normalization feed the judge's 2x-gate ratios, so the
arithmetic is pinned here — r9, VERDICT r8 items 2+7 + ADVICE bias fix."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import load_factors, normalized_medians  # noqa: E402


def test_load_factors_quiet_run_is_all_ones():
    assert load_factors([0.2, 0.2, 0.2]) == [1.0, 1.0, 1.0]


def test_load_factors_discount_only_and_clamped():
    f = load_factors([0.4, 0.2, 1.0])
    assert f[1] == 1.0          # the quietest pass is the reference
    assert f[0] == 2.0          # 2x load recorded as-is
    assert f[2] == 3.0          # clamped: one absurd reading can't
    assert all(x >= 1.0 for x in f)  # never flatters a quiet pass


def test_load_factors_degenerate_inputs():
    assert load_factors([]) == []
    assert load_factors([0.0, 0.1]) == [1.0, 1.0]  # zero ref -> no-op


def test_normalized_medians_divides_per_pass():
    runs = {"q": [1.0, 2.0, 1.0]}
    # pass 2 carried 2x load: its timing halves, median over [1, 1, 1]
    assert normalized_medians(runs, [1.0, 2.0, 1.0]) == {"q": 1.0}


def test_normalized_medians_quiet_equals_raw():
    import statistics

    runs = {"a": [0.5, 0.7, 0.6], "b": [2.0, 2.2, 2.1]}
    out = normalized_medians(runs, [1.0, 1.0, 1.0])
    for k, ts in runs.items():
        assert out[k] == round(statistics.median(ts), 3)


def test_normalization_cannot_hide_a_real_regression():
    # a query that is slow on EVERY pass stays slow after normalization:
    # uniform load factors scale all passes alike, and factors are capped
    runs = {"slow": [4.0, 4.1, 4.2]}
    out = normalized_medians(runs, load_factors([0.2, 0.21, 0.2]))
    assert out["slow"] >= 3.9
