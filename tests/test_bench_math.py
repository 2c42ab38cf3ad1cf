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


def test_choose_gated_median_requires_load_corroboration():
    from bench import choose_gated_median

    # loaded suite (max lf > 1.10): the isolated re-measure stands in
    assert choose_gated_median(2.0, 1.2, max_suite_load_factor=1.5) == 1.2
    # quiet suite: the suite median stays in the gate even if isolation
    # looks better — the delta is the framework's own suite-context cost
    assert choose_gated_median(2.0, 1.2, max_suite_load_factor=1.0) == 2.0
    # ... and even if isolation looks WORSE (two-sided, not min())
    assert choose_gated_median(1.3, 1.8, max_suite_load_factor=1.05) == 1.3
    assert choose_gated_median(1.3, 1.8, max_suite_load_factor=1.2) == 1.8


def test_loaded_isolation_window_never_feeds_the_gate():
    """r14 rule (r13 VERDICT item 1), pinned to the r13 driver sidecar's
    exact numbers: dedup_components_grouped's three isolation windows all
    measured loaded (1.733/1.584/1.45 — retry budget exhausted) and the
    winning window's min (6.329 s, anchored 6.329) replaced the quieter
    suite-anchored median (4.139 s = 1.39x vs the 2.971 s baseline),
    recording a 2.13x gate breach on an unchanged plan. With the rule, the
    suite median stands."""
    from bench import choose_gated_median

    suite_norm, iso_norm = 4.139, 6.329
    max_suite_lf, winning_iso_lf = 1.217, 1.45
    gated = choose_gated_median(suite_norm, iso_norm, max_suite_lf, winning_iso_lf)
    assert gated == suite_norm
    base = 2.971
    assert round(gated / base, 2) == 1.39  # under the 2x gate

    # chunk_documents in the degraded-host close run: best of three loaded
    # windows read 1.207 (> 1.2) — suite stands there too
    assert choose_gated_median(0.434, 0.734, 1.5, 1.207) == 0.434

    # a QUIET window under a loaded suite still substitutes (the rule the
    # isolation re-measure exists for; containment_pairs' r13 window was
    # 1.074-quiet and correctly fed the gate)
    assert choose_gated_median(9.663, 7.217, 1.217, 1.074) == 7.217
    # boundary: exactly 1.2 is quiet
    assert choose_gated_median(2.0, 1.2, 1.5, 1.2) == 1.2
    # default iso_load_factor keeps the pre-r14 behavior for callers that
    # never had a window (non-brushing ALWAYS_ISOLATE entries)
    assert choose_gated_median(2.0, 1.2, 1.5) == 1.2


def test_ratio_summary_matches_hand_math():
    import math

    from bench import ratio_summary

    base = {"a": 1.0, "b": 2.0, "c": 4.0}
    worst_q, worst_r, geo = ratio_summary({"a": 2.0, "b": 1.0, "c": 4.0}, base)
    assert worst_q == "a" and worst_r == 2.0
    assert geo == round(math.exp((math.log(2) + math.log(0.5) + math.log(1)) / 3), 3)
    # unrated queries (no baseline) are excluded; empty -> Nones
    assert ratio_summary({"zzz": 9.0}, base) == (None, None, None)


def test_raw_and_normalized_summaries_coincide_on_quiet_run():
    # load factors all 1.0 => normalized medians equal raw medians, so the
    # two stdout gate figures must coincide — the property the r9 ADVICE
    # asked the summary to make checkable
    from bench import load_factors, normalized_medians, ratio_summary

    runs = {"a": [1.0, 1.1, 1.05], "b": [0.4, 0.45, 0.5]}
    factors = load_factors([0.3, 0.3, 0.3])
    norm = normalized_medians(runs, factors)
    import statistics

    raw = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    base = {"a": 1.0, "b": 0.5}
    assert ratio_summary(norm, base) == ratio_summary(raw, base)


def test_baseline_doc_selects_epoch_by_master(tmp_path):
    """r14 (r13 VERDICT item 6): local runs rate against bench_baseline.json;
    cluster-master runs rate against bench_baseline_cluster.json ONLY when
    the recorded master matches exactly — never against the local epoch
    (32 local cores vs 2xN executor cores are not comparable)."""
    import json

    from bench import baseline_doc

    local = {"sf": 0.1, "queries": {"q": 1.0}}
    cluster = {
        "sf": 0.1,
        "master": "local-cluster[2,8,4096]",
        "queries": {"q": 2.0},
    }
    (tmp_path / "bench_baseline.json").write_text(json.dumps(local))
    (tmp_path / "bench_baseline_cluster.json").write_text(json.dumps(cluster))
    repo = str(tmp_path)

    assert baseline_doc(None, "0.1", repo)["queries"] == {"q": 1.0}
    assert baseline_doc("local-cluster[2,8,4096]", "0.1", repo)["queries"] == {
        "q": 2.0
    }
    # a DIFFERENT cluster shape is unrated (ratio-only), not local-rated
    assert baseline_doc("local-cluster[2,4,8192]", "0.1", repo) == {}
    # sf mismatch -> unrated on both paths
    assert baseline_doc(None, "0.01", repo) == {}
    assert baseline_doc("local-cluster[2,8,4096]", "0.01", repo) == {}
    # missing cluster epoch -> unrated cluster run
    (tmp_path / "bench_baseline_cluster.json").unlink()
    assert baseline_doc("local-cluster[2,8,4096]", "0.1", repo) == {}
