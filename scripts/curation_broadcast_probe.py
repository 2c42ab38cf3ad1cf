#!/usr/bin/env python
"""In-session A/B for the r15 model-broadcast fix in the composed curation
scoring plans (guide §3.1): the NB/DSIR model joins planned as
SortMergeJoin (two full gram-stream Exchange+Sort pairs) because the model
plans' crossJoins inflate the size estimate past the auto-broadcast
threshold; the models are <= buckets rows by construction.

Alternates legacy (broadcast_models=False) and fixed (True) executions of
the SCORING stage inside one Spark session, with the artifact fits done
once up front (both variants share the same fitted models, so the timed
delta is the scoring plan only).

Usage: python scripts/curation_broadcast_probe.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_REPS
(default 4 per variant, interleaved). Prints one JSON line.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "4"))

    from pyspark.sql import functions as F

    from fdi_flow_spark.core.concurrency import build_concurrently
    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.pipelines.curation import (
        curation_deploy_score,
        curation_stream_score,
    )
    from fdi_flow_spark.pipelines.lm import fit_bigram_counts, perplexity_cutoffs
    from fdi_flow_spark.pipelines.quality_model import nb_quality_fit
    from fdi_flow_spark.pipelines.selection import dsir_fit
    from fdi_flow_spark.pipelines.text import clean_docs
    from fdi_flow_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="fdi_flow_spark-curation-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    arriving = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id", "text", "lang"
    ).unionByName(
        corpus.where(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang"
        )
    )

    def _lm_artifacts():
        counts = fit_bigram_counts(corpus).localCheckpoint()
        cutoffs = perplexity_cutoffs(corpus, model_counts=counts).localCheckpoint()
        return counts, cutoffs

    nb_model, dsir_model, digests, (counts, cutoffs) = build_concurrently(
        lambda: nb_quality_fit(
            corpus.withColumn("is_en", F.col("lang") == "en"), "is_en"
        ),
        lambda: dsir_fit(corpus, corpus.where(F.col("source") == "src0")),
        lambda: (
            clean_docs(corpus.select("doc_id", "text"))
            .select(F.md5("text").alias("digest"))
            .distinct()
            .localCheckpoint()
        ),
        _lm_artifacts,
    )
    arriving2 = arriving.select("doc_id", "text")

    def deploy(bm: bool):
        return curation_deploy_score(
            arriving, digests, nb_model, dsir_model, None, cutoffs,
            lm_counts=counts, broadcast_models=bm,
        )

    def stream_score(bm: bool):
        return curation_stream_score(
            arriving2, digests, nb_model, dsir_model, broadcast_models=bm
        )

    out: dict = {"sf_dir": sf_dir}
    for label, fn in (("deploy_score", deploy), ("stream_score", stream_score)):
        # warm both variants once (codegen/JIT), then interleave timed reps
        for bm in (False, True):
            fn(bm).write.format("noop").mode("overwrite").save()
        times: dict = {"legacy": [], "broadcast": []}
        for _ in range(reps):
            for bm, key in ((False, "legacy"), (True, "broadcast")):
                spark.sparkContext.setJobDescription(f"ab {label} {key}")
                t0 = time.perf_counter()
                fn(bm).write.format("noop").mode("overwrite").save()
                times[key].append(round(time.perf_counter() - t0, 3))
        # parity: both variants must produce identical rows
        a = {tuple(r) for r in fn(False).collect()}
        b = {tuple(r) for r in fn(True).collect()}
        out[label] = {
            "legacy": times["legacy"],
            "broadcast": times["broadcast"],
            "legacy_min": min(times["legacy"]),
            "broadcast_min": min(times["broadcast"]),
            "legacy_median": statistics.median(times["legacy"]),
            "broadcast_median": statistics.median(times["broadcast"]),
            "rows_equal": a == b,
            "n_rows": len(a),
        }
        print(json.dumps({label: out[label]}), file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
