"""Stream-static containment probe: STATIC persisted containment-index
artifacts (``dedup.containment_index``) probed by ARRIVING documents —
the subset-clone / contamination twin of ``streaming.ann``'s IVF-PQ
probe, completing the incremental-dedup family's streaming surface
(exact digests: ``streaming_dedup_exact``; Jaccard LSH:
``dedup.near_dup_candidates_against``, a pure stream-static join; ANN:
``streaming_ivfpq_probe``).

``foreachBatch`` (not a continuous stream-static join) because the
arriving side needs a per-doc rank window (the k-rarest sketch), which
is a batch-side shape; each micro-batch runs the exact batch path
``dedup.containment_screen_against`` against the static artifacts, so
batch/stream parity holds per construction and is pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_containment_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    hot_path: str,
    out_path: str,
    k: int = 64,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "char",
    char_k: int = 12,
    n: int = 2,
) -> None:
    """Probe the static index with one micro-batch and OVERWRITE its own
    ``batch_id``-keyed partition directory under ``out_path`` — the same
    idempotence unit as ``streaming.ann.write_probe_batch``: an
    at-least-once ``foreachBatch`` replay rewrites ``batch_id=N`` in
    place, keeping the partition union exactly-once under sink retry."""
    from fdi_flow_spark.pipelines.dedup import containment_screen_against

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    index = spark.read.parquet(index_path)
    hot = spark.read.parquet(hot_path)
    containment_screen_against(
        batch_df, index, hot,
        id_col=id_col, text_col=text_col, k=k, threshold=threshold,
        unit=unit, char_k=char_k, n=n,
    ).write.mode("overwrite").parquet(f"{out_path.rstrip('/')}/batch_id={batch_id}")


def streaming_containment_probe(
    new_docs: DataFrame,
    index_path: str,
    hot_path: str,
    out_path: str,
    k: int = 64,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "char",
    char_k: int = 12,
    n: int = 2,
    checkpoint: str | None = None,
):
    """Probe persisted containment-index artifacts with a streaming
    document DataFrame; write ``(id, corpus_id, est_containment)`` rows
    per trigger to ``out_path`` (parquet, one ``batch_id=N`` partition
    directory per micro-batch — read the root for the union). Returns the
    started StreamingQuery — callers own ``awaitTermination``/``stop``.
    Results per doc are identical to the batch
    ``containment_screen_against`` on the same rows: each doc's sketch
    and matches depend only on its own text and the static artifacts."""

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        write_containment_batch(
            batch_df, batch_id, index_path, hot_path, out_path,
            k=k, threshold=threshold, id_col=id_col, text_col=text_col,
            unit=unit, char_k=char_k, n=n,
        )

    return (
        new_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint or out_path.rstrip("/") + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
