#!/usr/bin/env python
"""In-session A/B for ngram_jaccard_pairs' candidate self-join shape
(r15, guide §2.4/§7.2 "duplicated subtrees").

At sf0.1 the planner BROADCASTS the b-side of the prefix self-join, so
the whole ranked pipeline (explode -> df attach -> id Exchange -> Sort ->
Window rank) is computed TWICE — once per join side (no exchange reuse
across a BroadcastExchange boundary). Hinting the self-join SHUFFLE_HASH
makes both sides identical shuffle subtrees (computed once + one
ReusedExchange — the at-scale shape), at the cost of the pair aggregate
losing the window's id partitioning (one extra candidate-pair Exchange).
This probe measures which wins at sf0.1, with parity.

Usage: python scripts/jaccard_selfjoin_probe.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    threshold = 0.5

    from pyspark import StorageLevel
    from pyspark.sql import Window, functions as F

    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.pipelines.dedup import _shingle_hash_arrays
    from fdi_flow_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="fdi_flow_spark-jaccard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()

    docs = load_table(spark, sf_dir, "documents")
    arrays = _shingle_hash_arrays(docs, "doc_id", "text", 2, "char", 12).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    shingles = arrays.select("id", "ns", F.explode("arr").alias("shingle"))
    beta = max(0.8, 1.0 - threshold + 0.05)
    dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("_df"))
    ranked = (
        shingles.join(dfreq, "shingle")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.col("_df").asc(), F.col("shingle").asc()
                )
            ),
        )
        .withColumn("_p", F.ceil(F.lit(beta) * F.col("ns")))
        .where(F.col("_r") <= F.col("_p"))
        .select("id", "shingle", "ns", "_p")
    )

    def cand_of(a, b):
        na, nb = F.col("a.ns"), F.col("b.ns")
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id"))
                & (F.lit(threshold) * F.greatest(na, nb) <= F.least(na, nb)),
            )
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                na.alias("_na"),
                nb.alias("_nb"),
                F.col("a._p").alias("_pa"),
                F.col("b._p").alias("_pb"),
            )
            .agg(F.count("*").alias("_c"))
            .where(
                F.col("_c")
                >= F.greatest(
                    F.lit(1),
                    F.ceil(
                        F.lit(threshold / (1.0 + threshold))
                        * (F.col("_na") + F.col("_nb"))
                    )
                    - (F.col("_na") - F.col("_pa"))
                    - (F.col("_nb") - F.col("_pb")),
                )
            )
            .select("id_a", "id_b")
        )

    legacy = cand_of(ranked.alias("a"), ranked.alias("b"))
    hinted = cand_of(
        ranked.hint("shuffle_hash").alias("a"),
        ranked.hint("shuffle_hash").alias("b"),
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(legacy)
    noop(hinted)
    times = {"legacy": [], "hinted": []}
    for _ in range(reps):
        for key, df in (("legacy", legacy), ("hinted", hinted)):
            spark.sparkContext.setJobDescription(f"jaccard-ab {key}")
            t0 = time.perf_counter()
            noop(df)
            times[key].append(round(time.perf_counter() - t0, 3))
    a = {tuple(r) for r in legacy.collect()}
    b = {tuple(r) for r in hinted.collect()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "legacy": times["legacy"],
                "hinted": times["hinted"],
                "legacy_min": min(times["legacy"]),
                "hinted_min": min(times["hinted"]),
                "legacy_median": statistics.median(times["legacy"]),
                "hinted_median": statistics.median(times["hinted"]),
                "rows_equal": a == b,
                "n_rows": len(a),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
