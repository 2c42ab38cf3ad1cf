#!/usr/bin/env python
"""Quiet-host in-session A/B re-confirmation of the r14 job-overlap wins
(r14 VERDICT item 7): concurrent vs serial artifact fits for the
curation builders (r14 change 2), lid_fit (change 4) and the IVF-PQ
trainers (change 7). The r14 evidence was recorded on a 2-3x degraded
host; this probe interleaves SERIAL (build_concurrently monkeypatched to
sequential execution) and CONCURRENT executions of the full registry
queries inside one session.

Usage: python scripts/overlap_ab_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TARGETS = [
    "curation_scored",
    "curation_deploy",
    "language_id_model",
    "dsir_weights",
    "cosine_topk_ivfpq",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from fdi_flow_spark.core import concurrency
    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES
    from fdi_flow_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="fdi_flow_spark-overlap-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    real = concurrency.build_concurrently

    def serial(*thunks):
        return tuple(t() for t in thunks)

    def run(name):
        spark.sparkContext.setJobDescription(f"overlap-ab {name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"sf_dir": sf_dir}
    for name in TARGETS:
        # warm both shapes once
        concurrency.build_concurrently = serial
        run(name)
        concurrency.build_concurrently = real
        run(name)
        times = {"serial": [], "concurrent": []}
        for _ in range(reps):
            concurrency.build_concurrently = serial
            times["serial"].append(run(name))
            concurrency.build_concurrently = real
            times["concurrent"].append(run(name))
        out[name] = {
            **times,
            "serial_min": min(times["serial"]),
            "concurrent_min": min(times["concurrent"]),
            "serial_median": statistics.median(times["serial"]),
            "concurrent_median": statistics.median(times["concurrent"]),
        }
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    concurrency.build_concurrently = real
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
