#!/usr/bin/env python
"""In-session A/B probe for the r15 checkpoint-release fix (r14 VERDICT
item 1): does deterministically unpersisting each query's localCheckpoint
blocks at the next build remove the suite-context inflation?

One Spark session runs alternating OFF/ON cycles of the same
checkpoint-heavy query sequence (host variance makes cross-process
before/after numbers worthless — see OPTIMIZATION_r14.md): OFF cycles
monkeypatch ``checkpoints.release_stale`` to a no-op, so blocks accumulate
exactly as they did before r15; ON cycles restore the release. After each
query we record wall time and the block-manager storage footprint
(``getRDDStorageInfo``: live persistent RDDs, memory + disk bytes).

Usage: python scripts/checkpoint_release_probe.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_CYCLES
(default off,on,off,on). Prints one JSON document to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# the r14-measured suite-context victims + the checkpoint-heavy producers
# in bench order fragments (containment_pairs LAST, so it reads the
# accumulated state like a late-pass suite execution would)
SEQ = [
    "curation_scored",
    "minhash_dedup_pairs",
    "dedup_components",
    "span_dedup",
    "language_id_model",
    "dedup_components_grouped",
    "curation_deploy",
    "containment_screened",
    "containment_probe",
    "kn3_perplexity",
    "forecast_predict_lstm",
    "ngram_jaccard_pairs",
    "containment_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cycles = os.environ.get("PROBE_CYCLES", "off,on,off,on").split(",")

    from fdi_flow_spark.core import checkpoints
    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES

    spark = get_spark(app_name="fdi_flow_spark-ckpt-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from fdi_flow_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()
    # build the pinned prebuilt artifacts outside any timed region
    QUERIES["containment_probe_prebuilt"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    real_release = checkpoints.release_stale

    def storage() -> dict:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {
            "n_rdds": len(infos),
            "mem_mb": round(sum(i.memSize() for i in infos) / 1e6, 1),
            "disk_mb": round(sum(i.diskSize() for i in infos) / 1e6, 1),
        }

    out: list[dict] = []
    for ci, mode in enumerate(cycles):
        if mode == "off":
            checkpoints.release_stale = lambda _s: 0  # accumulate, pre-r15
        else:
            checkpoints.release_stale = real_release
        cyc = {"cycle": ci, "mode": mode, "queries": {}}
        for name in SEQ:
            spark.sparkContext.setJobDescription(f"ckpt-probe c{ci} {mode} {name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            cyc["queries"][name] = {"sec": dt, **storage()}
        out.append(cyc)
        print(json.dumps(cyc), file=sys.stderr, flush=True)
    checkpoints.release_stale = real_release

    summary = {}
    for name in SEQ:
        offs = [c["queries"][name]["sec"] for c in out if c["mode"] == "off"]
        ons = [c["queries"][name]["sec"] for c in out if c["mode"] == "on"]
        summary[name] = {
            "off_min": min(offs),
            "on_min": min(ons),
            "off": offs,
            "on": ons,
        }
    print(json.dumps({"sf_dir": sf_dir, "cycles": out, "summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
