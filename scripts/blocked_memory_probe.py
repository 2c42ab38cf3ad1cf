#!/usr/bin/env python
"""4 GiB block-grid spill probe (r8 VERDICT stretch item 8).

The row-level block-grid self-join (``cosine_near_dup_blocked``) promises
that per-task memory is independent of corpus size because the replicated
rows shuffle as compact spillable UnsafeRows — the shape that replaced the
packed-block draft which OOM'd an 8 GiB JVM. This probe puts that claim
under real memory pressure: it runs the registry's
``embedding_near_dup_blocked`` against the x100 corpus (200k embeddings,
~19.1M output pairs, a shuffle far larger than the heap) in a FRESH 4 GiB
single JVM and records whether it completes via spill with the exact row
count, merging the result into SCALING.json under
``x100.blocked_mem_4g``. Run it standalone (it must own the JVM to set
driver memory):

    python scripts/blocked_memory_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

X100 = os.path.join(_REPO, ".scaling", "x100")
DRIVER_MEM = os.environ.get("BLOCKED_PROBE_MEM", "4g")
EXPECTED_ROWS = 19_100_000  # recorded by the r8 x100 rehearsal


def main() -> None:
    from pyspark.sql import SparkSession

    if not os.path.exists(os.path.join(X100, "_BUILT")):
        print("x100 fixture missing; run scripts/scaling_rehearsal.py --x100 first")
        sys.exit(2)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("blocked-memory-probe")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jconf = spark.sparkContext._jsc.sc().conf()
    actual_mem = jconf.get("spark.driver.memory", "unset")
    if actual_mem != DRIVER_MEM:
        print(
            f"WARNING: driver memory is {actual_mem}, wanted {DRIVER_MEM} "
            "(a JVM was already running?) — probe result not at target heap",
            file=sys.stderr,
        )

    from fdi_flow_spark.plans.registry import QUERIES

    t0 = time.perf_counter()
    ok = True
    err = None
    n_rows = -1
    try:
        n_rows = QUERIES["embedding_near_dup_blocked"](spark, X100).count()
        ok = n_rows == EXPECTED_ROWS
    except Exception as exc:  # honest fail: record the floor, don't hide it
        ok = False
        err = f"{type(exc).__name__}: {exc}"[:300]
    elapsed = round(time.perf_counter() - t0, 1)
    rec = {
        "driver_memory": actual_mem,
        "corpus_rows": 200_000,
        "pairs_found": n_rows,
        "pairs_expected": EXPECTED_ROWS,
        "sec": elapsed,
        "ok": ok,
        "task_slots": int(cpus),
    }
    if err:
        rec["error"] = err
    sidecar = os.path.join(_REPO, "SCALING.json")
    try:
        with open(sidecar) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    # keyed by slot count: the finding is memory-per-task-slot, so runs at
    # different parallelism are siblings, not overwrites
    blk = doc.setdefault("x100", {}).setdefault("blocked_mem_4g", {})
    blk[f"slots{cpus}"] = rec
    with open(sidecar, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(rec))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
