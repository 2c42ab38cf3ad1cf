#!/usr/bin/env python
"""Two-executor-JVM x100 probe for the queries blocked by the single-JVM
block-storage floor (round-11 VERDICT item 4).

`curation_deploy` and the containment family have no x100 rows in
SCALING.json's x100 block: their composed plans exceed ONE 8 GiB local-mode
JVM at the 1.4 GB x100 corpus (the serialized (id, h) checkpoint alone is
~2.3 GB, and local mode stores every block in the single driver-executor
heap). The claim recorded there is that the floor is local-mode BLOCK
STORAGE, not the plans — on a cluster the blocks partition across
executors. This script tests exactly that claim in the only way this
sandbox allows: `local-cluster[2,16,4096]` spawns TWO separate executor
JVMs (16 cores, 4 GiB heap each — LESS total executor heap than the 8 GiB
single JVM that OOM'd), so the block store partitions two ways and
checkpoint/shuffle blocks spill per-executor. If the plans complete here,
the floor was storage topology; if they OOM with the same total memory
split across two JVMs, the plans themselves are implicated.

Writes an `x100_cluster` block into SCALING.json (resumable per query, the
run_x100 idiom):
  {"master": ..., "queries": {name: {t1, rows1, t100, rows100,
   time_ratio, rows_ratio}}}
Run from the repo root (corpora must already exist — build via
scaling_rehearsal.py):
    python scripts/cluster_floor_probe.py [query ...]
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

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X100 = os.path.join(_REPO, ".scaling", "x100")
MASTER = os.environ.get("SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,16,4096]")

# The single-JVM-floor set: the two named by the r11 VERDICT, plus the
# in-flight containment probe (same (id, h) checkpoint axis).
PROBE_QUERIES = ["containment_screened", "curation_deploy", "containment_probe"]


def main() -> None:
    from fdi_flow_spark.core.session import get_spark

    if not os.path.exists(os.path.join(X100, "_BUILT")):
        raise SystemExit("x100 corpus missing — run scripts/scaling_rehearsal.py first")

    spark = get_spark(
        app_name="fdi_flow_spark-cluster-floor",
        master=MASTER,
        extra_conf={
            # executor memory must match the worker size in the master
            # string; everything else inherits the library defaults (AQE,
            # Arrow, serialized-checkpoint storage inside the operators)
            "spark.executor.memory": "4g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fdi_flow_spark.plans.registry import QUERIES as REG
    from fdi_flow_spark.sources.tables import TABLES, load_table

    # warm: scans both corpora + one shuffle + the Python worker pool
    for d in (BASE, X100):
        for t in TABLES:
            load_table(spark, d, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or PROBE_QUERIES
    n1 = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_N1", "2")))
    n100 = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_N100", "1")))
    sidecar = os.path.join(_REPO, "SCALING.json")

    def _load() -> dict:
        try:
            with open(sidecar) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _merge(key: str, value) -> None:
        out = _load()
        blk = out.setdefault(
            "x100_cluster",
            {
                "master": MASTER,
                "executor_memory": "4g",
                "n_runs": {"x1": n1, "x100": n100},
                "queries": {},
            },
        )
        if key == "queries":
            blk.setdefault("queries", {}).update(value)
        else:
            blk[key] = value
        with open(sidecar, "w") as f:
            json.dump(out, f, indent=1)

    done = set(_load().get("x100_cluster", {}).get("queries", {}))
    for name in names:
        if name in done:
            print(f"x100_cluster {name}: already recorded, skipping", file=sys.stderr)
            continue
        fn = REG[name]
        rec: dict = {}
        for label, d, n_runs in (("1", BASE, n1), ("100", X100, n100)):
            ts = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            rec[f"t{label}"] = round(statistics.median(ts), 3)
            rec[f"rows{label}"] = fn(spark, d).count()
        rec["time_ratio"] = round(rec["t100"] / rec["t1"], 2) if rec["t1"] > 0 else None
        rec["rows_ratio"] = (
            round(rec["rows100"] / rec["rows1"], 2) if rec["rows1"] else None
        )
        _merge("queries", {name: rec})
        print(f"x100_cluster {name}: {rec}", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"cluster_floor_probe_done": names}))


if __name__ == "__main__":
    main()
