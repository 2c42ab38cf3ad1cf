"""Int8 embedding quantization — the memory/IO lever for 100 TB ANN.

No reference twin — driver-mandated LLM-pipeline surface (SURVEY §2.9).
Per-vector symmetric int8 (the FAISS ``SQ8``-style scalar quantizer):
``scale = max|x| / 127``, ``q_i = floor(x_i / scale + 0.5)``. A quantized
corpus is 4x smaller on disk and in shuffle than float32 (8x vs the
float64 compute layout), which at 100 TB is the difference between an
in-memory IVF probe and a spilling one.

Everything here is EXACT integer math after the quantization step:
``floor(x/scale + 0.5)`` is engine-independent (unlike round-half-even vs
half-up), integer dot products stay below 2^53 so they are bit-identical
under any summation order, and the cosine of two quantized vectors is
scale-free (the per-vector scales cancel) — so the DuckDB oracle
reproduces the whole pipeline exactly, no rounding tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: adds ``q`` (array<int> in
    [-127, 127]) and ``scale`` (double; ``x ~= q * scale``). Zero vectors
    quantize to all-zero with scale 0. Pure JVM projection — zero shuffle,
    whole-stage codegen, scales like any map."""
    x = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = mx / F.lit(127.0)
    q = F.transform(
        x,
        lambda v: F.when(mx == 0.0, F.lit(0))
        .otherwise(F.floor(v / scale + F.lit(0.5)))
        .cast("int"),
    )
    return ensure_min_parallelism(df, id_col).select(
        F.col(id_col), q.alias("q"), scale.alias("scale")
    )


def cosine_topk_quantized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by the cosine of the QUANTIZED vectors (the per-vector scales
    cancel, so no dequantization happens anywhere). Output matches
    ``cosine_topk_bruteforce``: ``(query_id, rank, neighbor_id, cosine)``.

    Execution: quantize both sides (projection), then stream candidates
    through the same BLAS-blocked partial-top-k kernel as the float path —
    the integer-valued doubles make every dot product exact, so ranks are
    deterministic on any engine, partitioning, or BLAS."""
    from fdi_flow_spark.pipelines.similarity import cosine_topk_bruteforce

    def as_dq(df: DataFrame) -> DataFrame:
        return quantize_embeddings(df, id_col=id_col, vec_col=vec_col).select(
            F.col(id_col), F.col("q").cast("array<double>").alias(vec_col)
        )

    return cosine_topk_bruteforce(
        as_dq(queries), as_dq(candidates), k=k, id_col=id_col, vec_col=vec_col
    )
