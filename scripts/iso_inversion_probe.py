"""Root-cause probe for the isolated-above-suite timing inversion (r14,
r13 VERDICT item 2).

Observation (r13 driver sidecar): ``dedup_components_grouped``'s isolated
min-of-5 sat 40-70% ABOVE its in-suite median on every run (isolated_all
6.33-7.79 raw vs suite 4.64), and ``containment_pairs`` showed the same
inversion on loaded windows. Two candidate mechanisms:

(a) the isolation protocol's ``clearCache()`` hygiene drops state the suite
    context amortizes (page-cache-warm parquet footers, the catalog's
    relation cache), so every isolated execution re-pays a cost the
    in-suite executions don't; or
(b) ambient host load — all three r13 windows measured loaded
    (iso_load_factor 1.45-1.73), and the isolated min is deliberately NOT
    load-factor-divided, so a loaded window's premium lands verbatim in
    the raw isolated figures.

This probe separates them by measuring the SAME query under four protocols
on one session, interleaved A/B/C/D x ROUNDS so slow host drift hits all
arms equally:

  A full      — the exact ``_iso_window`` protocol: clearCache + python GC
                + JVM GC, 1 untimed warm run, 5 timed runs.
  B no_clear  — same, but WITHOUT clearCache (both GCs kept).
  C gc_only   — JVM System.gc() only (no clearCache, no python GC).
  D none      — no hygiene at all: 5 timed back-to-back runs (the closest
                a standalone window can get to "suite-amortized" state).

Each arm records its own pinned-plan calibration (the bench's CPU probe)
immediately before the timed runs, so the per-arm load factor rides along
and a loaded host cannot masquerade as a protocol effect.

If (a) were true, A should sit consistently above B/C/D on a quiet host.
If (b), all four arms should agree (within noise) when their calibrations
read quiet — and the r13 premium is fully explained by window load, i.e.
the r14 loaded-window ineligibility rule in ``choose_gated_median`` is the
complete fix.

Writes one JSON doc to $SPARK_GRAFT_ISO_PROBE_OUT (default
``scripts/iso_inversion_probe.json``) and prints it.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUERY = os.environ.get("SPARK_GRAFT_ISO_PROBE_QUERY", "dedup_components_grouped")
ROUNDS = int(os.environ.get("SPARK_GRAFT_ISO_PROBE_ROUNDS", "3"))
RUNS = 5


def main() -> None:
    from pyspark.sql import functions as F

    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="iso-inversion-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from fdi_flow_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()

    _CALIB_N = 60_000_000

    def _calib_plan():
        d = spark.range(0, _CALIB_N, 1, spark.sparkContext.defaultParallelism)
        return d.groupBy((d.id % 251).alias("k")).agg(F.sum(d.id).alias("s"))

    def _calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            _calib_plan().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        return best

    _calib_plan().write.format("noop").mode("overwrite").save()
    calib_ref = _calibrate()

    fn = QUERIES[QUERY]

    def _run_once() -> float:
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    def arm(hygiene: str) -> dict:
        if hygiene == "full":
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        elif hygiene == "no_clear":
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        elif hygiene == "gc_only":
            spark.sparkContext._jvm.System.gc()
        cal = _calibrate()
        lf = min(3.0, max(1.0, cal / calib_ref)) if calib_ref > 0 else 1.0
        if hygiene != "none":
            _run_once()  # the protocol's untimed warm run
        ts = [_run_once() for _ in range(RUNS)]
        return {
            "load_factor": round(lf, 3),
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "all": [round(t, 3) for t in ts],
        }

    arms = ["full", "no_clear", "gc_only", "none"]
    results: dict[str, list] = {a: [] for a in arms}
    for r in range(ROUNDS):
        for a in arms:
            results[a].append(arm(a))
            print(f"round {r} arm {a}: {results[a][-1]}", file=sys.stderr)

    doc = {
        "query": QUERY,
        "sf_dir": sf_dir,
        "rounds": ROUNDS,
        "runs_per_window": RUNS,
        "calib_ref": round(calib_ref, 3),
        "arms": results,
        "summary": {
            a: {
                "min_of_mins": min(w["min"] for w in results[a]),
                "median_of_medians": round(
                    statistics.median([w["median"] for w in results[a]]), 3
                ),
                "max_load_factor": max(w["load_factor"] for w in results[a]),
            }
            for a in arms
        },
    }
    out = os.environ.get(
        "SPARK_GRAFT_ISO_PROBE_OUT",
        os.path.join(_REPO, "scripts", "iso_inversion_probe.json"),
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["summary"]))


if __name__ == "__main__":
    main()
