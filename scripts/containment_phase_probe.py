#!/usr/bin/env python
"""Stage-split timing of containment_pairs at sf0.1 (r14 VERDICT item 2,
guide §1: find where the residual cost lives before touching the plan).

Phases, all timed with the noop sink in one session over ONE shared
arrays checkpoint (so each phase measures its plan segment, not a
rebuild):

  members   exact_dup_members build (collapse state)
  arrays    _shingle_hash_arrays(work) localCheckpoint build
  dfreq     shingle-df aggregate
  prefix    df-attach join + per-doc rank window + filter
  cand      prefix x index join + pair dedup
  verify    cand + both array joins + threshold filter (pre-expansion)
  full      the registry query (incl. expansion + union)

Usage: python scripts/containment_phase_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark import StorageLevel
    from pyspark.sql import Window, functions as F

    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.pipelines.dedup import (
        _shingle_hash_arrays,
        exact_dup_members,
    )
    from fdi_flow_spark.plans.registry import QUERIES
    from fdi_flow_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="fdi_flow_spark-containment-phase")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()

    docs = load_table(spark, sf_dir, "documents")
    threshold = 0.6

    def timed(label, mk, out):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = mk()
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = ts
        print(f"{label}: {ts}", file=sys.stderr, flush=True)
        return r

    out: dict = {}
    # collapse state (fresh, not the registry cache)
    mem = timed(
        "members",
        lambda: exact_dup_members(docs),
        out,
    )
    work = docs.join(
        mem.where(F.col("_mid") != F.col("_rep")).select(
            F.col("_mid").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    arrays = timed(
        "arrays",
        lambda: _shingle_hash_arrays(work, "doc_id", "text", 2, "char", 12)
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK),
        out,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    shingles = arrays.select("id", "ns", F.explode("arr").alias("shingle"))
    dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("_df"))
    timed("dfreq", lambda: noop(dfreq), out)

    pref = (
        shingles.join(dfreq, "shingle")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.col("_df").asc(), F.col("shingle").asc()
                )
            ),
        )
        .where(
            F.col("_r")
            <= F.col("ns") - F.ceil(F.lit(threshold) * F.col("ns")) + 1
        )
        .select("id", "shingle")
    )
    timed("prefix", lambda: noop(pref), out)

    inv = shingles.select("id", "shingle")
    cand = (
        pref.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    timed("cand", lambda: noop(cand), out)

    aa = arrays.select(F.col("id").alias("id_a"), F.col("arr").alias("_arr_a"))
    ab = arrays.select(F.col("id").alias("id_b"), F.col("arr").alias("_arr_b"))
    cont = F.size(F.array_intersect("_arr_a", "_arr_b")) / F.size("_arr_a")
    pairs = (
        cand.join(aa.hint("shuffle_hash"), "id_a")
        .join(ab.hint("shuffle_hash"), "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )
    timed("verify", lambda: noop(pairs), out)

    fn = QUERIES["containment_pairs"]
    timed("full", lambda: noop(fn(spark, sf_dir)), out)

    # row counts for context
    out["rows"] = {
        "arrays": arrays.count(),
        "prefix": pref.count(),
        "cand": cand.count(),
        "pairs": pairs.count(),
    }
    print(json.dumps({"sf_dir": sf_dir, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
