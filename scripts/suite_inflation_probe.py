#!/usr/bin/env python
"""Bisect the residual suite-context inflation (r15): which part of a
128-query bench pass slows a later containment_pairs execution, now that
per-query checkpoint blocks are released deterministically?

One session; containment_pairs timed (noop, 2 reps, min) after each
context phase:

  p0_fresh          after table warmup only
  p1_relational     after the ~60 relational/series/window queries
  p2_arrow          after the Arrow-kernel queries (multimodal, lstm,
                    pq/ivfpq, kmeans, curation, text_normalize, bpe)
  p3_rest           after every remaining bench query (full pass done)
  p4_hygiene        after the bench's own hygiene (clearCache + 2x GC)
  p5_second_pass    after a second full pass (steady suite state)

Also records RDD storage (getRDDStorageInfo) and executor storage-memory
remaining (getExecutorMemoryStatus) at each checkpoint.

Usage: python scripts/suite_inflation_probe.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES
    from fdi_flow_spark.sources.tables import TABLES, load_table

    sys.path.insert(0, _REPO)
    from bench import BENCH_QUERIES

    spark = get_spark(app_name="fdi_flow_spark-suite-inflation")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, sc.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    ARROW = [
        "multimodal_image_features", "multimodal_audio_bands",
        "video_frame_sample", "video_frame_features", "forecast_predict_lstm",
        "embedding_kmeans", "semantic_dedup", "pq_encode", "cosine_topk_pq",
        "cosine_topk_ivfpq", "cosine_topk_ivfpq_probe", "text_normalize",
        "bpe_tokenize", "curation_scored", "curation_deploy",
        "embedding_quantize", "cosine_topk_q8", "embedding_outliers",
        "ewma_chunked", "holt_chunked", "kalman1d_chunked",
    ]
    arrow_set = set(ARROW)
    relational = [
        q for q in BENCH_QUERIES
        if q not in arrow_set and q != "containment_pairs"
    ][:60]
    rest = [
        q for q in BENCH_QUERIES
        if q not in arrow_set and q != "containment_pairs"
        and q not in set(relational)
    ]

    def noop(name):
        sc.setJobDescription(f"inflation-probe {name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def state():
        infos = sc._jsc.sc().getRDDStorageInfo()
        mem = sc._jsc.sc().getExecutorMemoryStatus()
        # java Map<BlockManagerId, (Long maxMem, Long remainingMem)>
        rem = []
        it = mem.iterator()
        while it.hasNext():
            kv = it.next()
            rem.append(int(kv._2()._2()) / 1e6)
        return {
            "n_rdds": len(infos),
            "rdd_mem_mb": round(sum(i.memSize() for i in infos) / 1e6, 1),
            "storage_remaining_mb": [round(x, 0) for x in rem],
        }

    def cp_min(label, out):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            noop("containment_pairs")
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = {"cp": ts, **state()}
        print(json.dumps({label: out[label]}), file=sys.stderr, flush=True)

    out: dict = {}
    cp_min("p0_fresh", out)
    for q in relational:
        noop(q)
    cp_min("p1_relational", out)
    for q in ARROW:
        noop(q)
    cp_min("p2_arrow", out)
    for q in rest:
        noop(q)
    cp_min("p3_rest", out)
    spark.catalog.clearCache()
    gc.collect()
    sc._jvm.System.gc()
    cp_min("p4_hygiene", out)
    for q in BENCH_QUERIES:
        if q != "containment_pairs":
            noop(q)
    cp_min("p5_second_pass", out)
    print(json.dumps({"sf_dir": sf_dir, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
