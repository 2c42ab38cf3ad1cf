#!/usr/bin/env python
"""Scaling rehearsal (round-5 VERDICT item 4): measure time(10x)/time(1x)
per query so super-linear blowups surface BEFORE a real cluster does.

Builds a 10x corpus under .scaling/x10/ as a re-keyed union of ten sf0.1
copies (keys shifted per copy so joins/groupings see 10x distinct
entities; `events.event_type` gets a per-copy suffix, so the series axis
scales 10x in SERIES COUNT at constant per-series length — the
"more sensors / more docs / more vectors" axis a growing deployment
actually experiences; nation/region stay single-copy like real dims).

Because documents/embeddings payloads repeat verbatim across copies,
every doc gains 9 exact twins: pair-EMITTING queries (near-dup, SemDeDup)
legitimately produce ~45x the output, so wall-clock alone would read as
super-linear. The sidecar therefore records BOTH the time ratio and the
output-row ratio — an output-bound algorithm is judged by time-vs-output,
not time-vs-input.

Writes SCALING.json: {query: {"t1": s, "t10": s, "time_ratio": r,
"rows1": n, "rows10": n, "rows_ratio": r}}. Run from the repo root:
    python scripts/scaling_rehearsal.py [--rebuild]
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
X10 = os.path.join(_REPO, ".scaling", "x10")
COPIES = 10

# per-copy key shifts, far above any real key range
_SHIFT = 1_000_000_000_000

# scale-relevant subset: every data-proportional kernel family + the
# headline relational queries; excluded: driver-side ML fits and plot paths
QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_volume",
    "q6_revenue_change", "asof_join_purchase",
    "moving_average_valid", "ewma_closed_form", "standard_scaler",
    "segment_windows", "forecast_prep", "cusum_drift", "seasonal_decompose",
    "time_bucket_rollup", "user_sessions", "gap_fill", "series_profile",
    "dedup_exact", "dedup_components", "ngram_jaccard_pairs",
    "minhash_dedup_pairs", "simhash_fingerprints", "span_dedup",
    "dedup_incremental", "line_dedup",
    "token_counts", "language_id", "lm_perplexity", "tfidf_vectors",
    "dsir_weights", "bm25_search",
    "embedding_kmeans", "semantic_dedup", "cosine_topk",
    "embedding_quantize", "pq_encode",
    "rolling_corr", "cross_corr",
    "unigram_tokenize", "kn_perplexity",
]


def build_x10(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(X10, exist_ok=True)
    done = os.path.join(X10, "_BUILT")
    if os.path.exists(done):
        return
    t0 = time.perf_counter()

    def shifted(table, copies_spec):
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        parts = []
        for i in range(COPIES):
            c = src
            for col, kind in copies_spec.items():
                if kind == "key":
                    c = c.withColumn(col, F.col(col) + F.lit(i * _SHIFT))
                elif kind == "suffix" and i > 0:
                    c = c.withColumn(col, F.concat(F.col(col), F.lit(f"_c{i}")))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{X10}/{table}.parquet")

    # true dimensions stay single-copy (a real deployment has 25 nations
    # at every fact-table scale)
    for t in ("region", "nation"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{X10}/{t}.parquet"
        )
    shifted("customer", {"c_custkey": "key"})
    shifted("supplier", {"s_suppkey": "key"})
    shifted("part", {"p_partkey": "key"})
    shifted("orders", {"o_orderkey": "key", "o_custkey": "key"})
    shifted(
        "lineitem",
        {"l_orderkey": "key", "l_partkey": "key", "l_suppkey": "key"},
    )
    shifted(
        "events",
        {"event_id": "key", "user_id": "key", "event_type": "suffix"},
    )
    shifted("documents", {"doc_id": "key"})
    shifted("embeddings", {"vec_id": "key"})
    with open(done, "w") as f:
        f.write("ok\n")
    print(f"built {X10} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


def main() -> None:
    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES as REG

    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(X10, ignore_errors=True)

    spark = get_spark(app_name="fdi_flow_spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    build_x10(spark)

    # warm: scans + one shuffle + python workers
    from fdi_flow_spark.sources.tables import TABLES, load_table

    for d in (BASE, X10):
        for t in TABLES:
            load_table(spark, d, t).count()
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    wide.groupBy((wide.id % 97).alias("k")).count().count()
    wide.mapInPandas(lambda it: it, schema="id long").count()

    n1 = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_N1", "3")))
    n10 = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_N10", "2")))
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = REG[name]
        rec: dict = {}
        for label, d, n_runs in (("1", BASE, n1), ("10", X10, n10)):
            ts = []
            rows = None
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            rows = fn(spark, d).count()
            rec[f"t{label}"] = round(statistics.median(ts), 3)
            rec[f"rows{label}"] = rows
        rec["time_ratio"] = (
            round(rec["t10"] / rec["t1"], 2) if rec["t1"] > 0 else None
        )
        rec["rows_ratio"] = (
            round(rec["rows10"] / rec["rows1"], 2) if rec["rows1"] else None
        )
        results[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
        spark.catalog.clearCache()

    out = {
        "base": BASE,
        "copies": COPIES,
        "n_runs": {"x1": n1, "x10": n10},
        "queries": results,
    }
    sidecar = os.path.join(_REPO, "SCALING.json")
    try:  # carry the human analysis notes across re-runs
        with open(sidecar) as f:
            prev = json.load(f)
        if "notes" in prev:
            out["notes"] = prev["notes"]
    except (OSError, ValueError):
        pass
    with open(sidecar, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"scaling_written": len(results)}))


if __name__ == "__main__":
    main()
