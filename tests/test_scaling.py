"""CI form of the x10 scaling rehearsal (r9 VERDICT item 6): catch
input-super-linear regressions every round the way the star-branch test
catches storage regressions — without waiting for the one-shot
scripts/scaling_rehearsal.py run.

Opt-in via ``python -m pytest tests -m scaling`` (pytest.ini deselects the
marker by default so the ordinary suite stays fast). The sweep builds the
same re-keyed 10x union corpus as the rehearsal script, but from sf0.001
(build ~15 s, sweep ~1 min on local[4]); sf0.001->sf0.01 is NOT usable as
the axis because documents/embeddings are the same size at both driver
scale factors — only the relational tables grow.

Envelope: measured r10 time ratios on local[4] were 0.9-2.9x for every
family head (constant per-query overhead dominates at this scale, so a
healthy linear operator lands well under 10x). The cap of 6x per query is
2-5x above measured noise yet far below what any accidental quadratic
produces here (the pair space grows 100x; the r8 minhash regression that
motivated this test read ~+80% at CONSTANT input, i.e. >10x here).
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.scaling

SF1 = "/root/testdata/sf0.001"

# family heads: one per scale-relevant kernel family (projection, digest
# dedup, model scoring, relational agg, window, LSH banding + verify,
# broadcast top-k, JVM quantize, exact-dedup-first components, hashed-gram
# importance weights)
SWEEP = [
    "token_counts",
    "dedup_exact",
    "language_id",
    "q1_pricing_summary",
    "moving_average_valid",
    "minhash_dedup_pairs",
    "cosine_topk",
    "embedding_quantize",
    "dedup_components_grouped",
    "dsir_weights",
    # r10: hashed-shingle window-count family (doc-frequency over a full
    # partition window, then per-doc combine)
    "ngram_novelty",
    # r11: rarest-k sketch screen + static-index probe (constant per-doc
    # fan-out; the x10 twin corpus is its worst case — est rows explode
    # 1000x while time must stay near-flat)
    "containment_screened",
    "containment_probe",
]
TIME_RATIO_CAP = 6.0
# below this floor the x1 timing is all fixed overhead and the ratio is
# noise-dominated; compare against the floor instead
T1_FLOOR = 0.15


@pytest.fixture(scope="module")
def x10_dir(spark, tmp_path_factory):
    import scaling_rehearsal as sr

    out = str(tmp_path_factory.mktemp("scaling") / "x10")
    sr.build_x10(spark, base=SF1, out=out)
    return out


def test_x10_sweep_within_envelope(spark, x10_dir):
    from fdi_flow_spark.plans.registry import QUERIES as REG
    from fdi_flow_spark.sources.tables import TABLES, load_table

    # warm: scans on both corpora + one shuffle + the Python worker pool
    for d in (SF1, x10_dir):
        for t in TABLES:
            load_table(spark, d, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    failures = []
    report = {}
    for name in SWEEP:
        fn = REG[name]
        t = {}
        for label, d in (("1", SF1), ("10", x10_dir)):
            ts = []
            for _ in range(2):  # min-of-2: the quieter run is the signal
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            t[label] = min(ts)
        ratio = t["10"] / max(t["1"], T1_FLOOR)
        report[name] = round(ratio, 2)
        if ratio > TIME_RATIO_CAP:
            failures.append(f"{name}: t1={t['1']:.2f}s t10={t['10']:.2f}s ratio={ratio:.2f}")
        spark.catalog.clearCache()
    assert not failures, (
        f"x10 time ratios above the {TIME_RATIO_CAP}x envelope "
        f"(input-super-linear regression): {failures}; full sweep: {report}"
    )
