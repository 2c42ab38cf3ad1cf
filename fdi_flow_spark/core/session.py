"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the config below is chosen so the same
code is correct and fast on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting),
- Arrow on (every pandas-UDF operator pays one Arrow hop, not pickle),
- explicit shuffle partitions as a *starting point* AQE can shrink,
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fdi_flow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores events.ts as TIMESTAMP(NANOS), which Spark 4
        # refuses by default; read it as a long (ns since epoch) — every use
        # is ordering-only, and long ordering == timestamp ordering.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Scale-out guard (r14, guide §2.2): AQE's partition coalescing only
    # SHRINKS the shuffle partition count — it never grows it above
    # spark.sql.shuffle.partitions — so the local starting point of 32
    # would cap reduce-side parallelism on a real cluster. Production sets
    # SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS (rule of thumb: ~2-4x total
    # executor cores, or input_bytes / 256 MB for the big shuffles) and AQE
    # coalesces DOWN from there per stage; unset locally, nothing changes,
    # keeping the driver's bench comparable across rounds.
    initial_parts = os.environ.get("SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS")
    if initial_parts:
        # validate at read time (r14 ADVICE): a non-integer value would
        # otherwise surface only at the first query as an opaque Spark
        # conf error. NOTE the knob requires AQE partition coalescing
        # (enabled above) — extra_conf that disables it leaves this inert.
        try:
            n = int(initial_parts)
            if n <= 0:
                raise ValueError
        except ValueError:
            raise ValueError(
                "SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS must be a positive "
                f"integer, got {initial_parts!r}"
            ) from None
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(n),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
