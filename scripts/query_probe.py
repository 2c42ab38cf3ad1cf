#!/usr/bin/env python
"""Time individual bench queries with the noop sink (guide §1.4).

Usage: python scripts/query_probe.py <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_REPS (default 3).

Each query's DataFrame is rebuilt per rep (registry callables may run bounded
artifact fits at build time — that cost belongs to the query and is timed),
then written to the noop sink so the measurement is the computation, not a
collect. Prints per-rep seconds plus min/median. This is the round's probe
harness for before/after comparisons; the bench contract itself is unchanged.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: query_probe.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "3"))

    from fdi_flow_spark.core.session import get_spark
    from fdi_flow_spark.plans.registry import QUERIES

    spark = get_spark(app_name="fdi_flow_spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: reps={ts} min={min(ts):.3f} median={statistics.median(ts):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
