"""Stream-static ANN: a STATIC persisted IVF-PQ index probed by STREAMING
queries — the online half of the ANN story (the offline half is
``quantization.ivfpq_build_index``, run once per corpus rebuild).

Execution shape (r9 VERDICT item 7): each micro-batch of queries is probed
with ``foreachBatch`` through the exact batch path
(``quantization.ivfpq_query_index``) — probe cells chosen against the tiny
centroid table, the postings read partition-pruned to ``nprobe/nlist`` of
the index, ADC over stored codes. ``foreachBatch`` (rather than a
continuous stream-static join) is the right idiom here because the ADC
lookup tables are built from the micro-batch's query matrix on the driver;
the index side never re-scans more than the probed partitions, so
per-trigger work is O(batch x nprobe/nlist x corpus). Batch/stream parity
is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_ivfpq_probe(
    queries: DataFrame,
    index_path: str,
    out_path: str,
    k: int = 5,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
):
    """Probe a persisted IVF-PQ index with a streaming query DataFrame;
    append ``(query_id, rank, neighbor_id, cosine)`` rows per trigger to
    ``out_path`` (parquet). Returns the started StreamingQuery — callers
    own ``awaitTermination``/``stop``. Results per query are identical to
    the batch ``ivfpq_query_index`` on the same rows: each query's top-k
    depends only on its own vector and the static index."""
    from fdi_flow_spark.pipelines.quantization import ivfpq_query_index

    def _probe(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivfpq_query_index(
            batch_df, index_path, k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col
        ).write.mode("append").parquet(out_path)

    return (
        queries.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint or out_path.rstrip("/") + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
