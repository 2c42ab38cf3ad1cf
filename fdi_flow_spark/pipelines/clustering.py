"""Embedding clustering and semantic near-duplicate detection.

No reference twin — driver-mandated LLM-pipeline surface (SURVEY §2.9).
``kmeans_embeddings`` is a deterministic distributed Lloyd iteration;
``semantic_dedup_pairs`` is the SemDeDup recipe (Abbas et al., 2023):
cluster the embedding space, then search for near-duplicates only WITHIN
each cluster — the cluster assignment bounds the candidate pairs, turning
an O(n^2) all-pairs cosine into k tractable blocks.

Design at 100 TB:

- Lloyd is deterministic end-to-end: init = the vectors of the k smallest
  ids (TakeOrdered, no full sort), assignment = exact argmin against
  broadcast centroids (Arrow-batched pandas UDF, BLAS-free direct form so
  the DuckDB oracle reproduces it), update = map-side partial sums per
  partition (``mapInPandas`` emitting <= k tiny rows per partition) reduced
  per cluster — the full vector stream is never shuffled, and nothing
  data-sized ever reaches the driver (the reduce input is
  #partitions x k rows).
- Empty clusters keep their previous centroid (pinned, mirrored in the
  oracle).
- ``semantic_dedup_pairs`` self-joins on the cluster key only, with the
  cosine evaluated JVM-side (``zip_with`` + ``aggregate`` fold — the same
  sequential sum order DuckDB's LIST_COSINE_SIMILARITY uses, which keeps
  the value hash bit-stable).

MLlib's KMeans is deliberately not used: its kmeans|| init and
tolerance-based convergence are seed- and partitioning-dependent, which
breaks the driver's value-hash contract; this Lloyd is reproducible on any
cluster layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from fdi_flow_spark.core.partitioning import ensure_min_parallelism


def _collect_init_centroids(df: DataFrame, k: int, id_col: str, vec_col: str) -> np.ndarray:
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)  # TakeOrdered: top-k per partition then merge, no full sort
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available vectors")
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _assign(df: DataFrame, cent: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    """(id, vector, cluster, dist): exact nearest centroid, ties to the
    lowest cluster id (np.argmin first-hit == SQL min_by (dist, cluster))."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("struct<cluster: bigint, dist: double>")
    def nearest(v: pd.Series) -> pd.DataFrame:
        c = bc.value  # (k, d)
        x = np.stack(v.to_numpy()).astype(np.float64)  # (n, d)
        # direct form (x - c)^2 summed over dims — matches the oracle's
        # LIST_DISTANCE elementwise evaluation, unlike the gemm expansion
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        idx = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype(np.int64), "dist": np.sqrt(d2[np.arange(len(idx)), idx])}
        )

    out = df.select(F.col(id_col), F.col(vec_col), nearest(F.col(vec_col)).alias("_n"))
    return out.select(id_col, vec_col, F.col("_n.cluster").alias("cluster"), F.col("_n.dist").alias("dist"))


def _lloyd_step(df: DataFrame, cent: np.ndarray, vec_col: str) -> np.ndarray:
    """One fused Lloyd iteration: a SINGLE ``mapInPandas`` pass assigns each
    vector to its nearest centroid AND accumulates per-partition partial
    (cluster, count, sum) rows; the reduce runs over the tiny
    #partitions x k partial table. Empty clusters keep their previous
    centroid. One Python/Arrow pass per iteration — the assignment is never
    materialized as a column during training."""
    k, d = cent.shape
    bc = df.sparkSession.sparkContext.broadcast(cent)
    part_schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("_n", LongType()),
            StructField("_s", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        c = bc.value
        cnt = np.zeros(k, dtype=np.int64)
        sm = np.zeros((k, d))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            cnt += np.bincount(a, minlength=k)
            for j in range(k):
                m = a == j
                if m.any():
                    sm[j] += x[m].sum(axis=0)
        hit = np.nonzero(cnt)[0]
        if len(hit):
            yield pd.DataFrame(
                {
                    "cluster": hit.astype(np.int64),
                    "_n": cnt[hit],
                    "_s": [sm[j].tolist() for j in hit],
                }
            )

    part = df.select(vec_col).mapInPandas(partials, part_schema)
    rows = part.groupBy("cluster").agg(
        F.sum("_n").alias("n"),
        F.array(*[F.sum(F.col("_s")[i]) for i in range(d)]).alias("s"),
    ).collect()
    new = cent.copy()
    for r in rows:
        new[int(r["cluster"])] = np.array(r["s"], dtype=np.float64) / float(r["n"])
    return new


def kmeans_embeddings(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column.

    Runs ``n_iter`` full (assign, update) iterations from the pinned init,
    then returns the assignment against the FINAL centroids:
    ``(id, cluster, dist)`` with ``dist`` the euclidean distance, rounded
    to 6 places. Reproducible on any partitioning — no RNG anywhere.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    work = ensure_min_parallelism(df.select(id_col, vec_col), id_col)
    if n_iter > 0:  # training scans the data n_iter+1 times — cache it
        work = work.persist()
    try:
        cent = _collect_init_centroids(work, k, id_col, vec_col)
        for _ in range(n_iter):
            cent = _lloyd_step(work, cent, vec_col)
    finally:
        if n_iter > 0:
            # the final assignment below recomputes from source — one scan
            work.unpersist(blocking=False)
    final = _assign(work, cent, id_col, vec_col)
    return final.select(
        F.col(id_col),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means the embeddings, then emit every within-cluster pair
    with cosine similarity >= ``threshold`` (``id_a < id_b``).

    The shuffle key is the CLUSTER, so pair candidates are bounded by
    cluster sizes instead of n^2, and each cluster block evaluates as ONE
    dense BLAS gemm inside ``applyInPandas`` (the same normalized-matmul
    kernel as ``cosine_near_dup_pairs``) — only above-threshold pairs are
    ever materialized. At 100 TB, k scales with the corpus (SemDeDup uses
    ~100k clusters for web scale) precisely so the per-cluster blocks stay
    gemm-sized AND the cluster count keeps every executor busy.

    r14: the cluster label is attached by the zero-shuffle assignment
    projection itself (:func:`kmeans_fit` centroids + :func:`_assign`
    carrying the vector through), not by re-scanning the source and
    equi-joining the EMBEDDING PAYLOAD on id against the ``(id, cluster)``
    table — that join shuffled every vector once by id before the
    groupBy(cluster) shuffled it again by placement (guide §8: decide on
    small rows, move the payload once). Training is unchanged (float ->
    double widening is exact, so centroids/assignments are bit-identical);
    the payload now crosses exactly one exchange, the cluster one.
    """
    work = ensure_min_parallelism(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        "_id",
    )
    cent = kmeans_fit(work, k=k, n_iter=n_iter, id_col="_id", vec_col="_v")
    vecs = _assign(work, cent, "_id", "_v").select("_id", "_v", "cluster")

    thr = float(threshold)
    schema = StructType(
        [
            StructField("cluster", LongType()),
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def pairs_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order].astype(np.int64)
        X = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        B = 4096  # row-blocked gemm: memory stays O(B * cluster_size)
        col = np.arange(n)
        for s in range(0, n, B):
            S = Xn[s : s + B] @ Xn.T
            row = np.arange(s, s + S.shape[0])
            mask = (S >= thr) & (row[:, None] < col[None, :])
            i, j = np.nonzero(mask)
            out_a.append(ids[row[i]])
            out_b.append(ids[j])
            out_c.append(S[i, j])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        c = np.concatenate(out_c) if out_c else np.array([])
        return pd.DataFrame(
            {
                "cluster": np.full(len(a), int(pdf["cluster"].iloc[0]), dtype=np.int64),
                "id_a": a,
                "id_b": b,
                "cosine": np.round(c, 6),
            }
        )

    return vecs.groupBy("cluster").applyInPandas(pairs_fn, schema)


def embedding_outliers(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    z: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier flagging (r10b, §2.9 extension) — the
    curation stage that drops mis-embedded / off-distribution vectors
    before ANN indexing or SemDeDup: assign every vector with the same
    deterministic Lloyd as :func:`kmeans_embeddings`, then flag vectors
    whose distance-to-centroid exceeds ``mean + z * std`` of their OWN
    cluster (population std over the 6-dp-rounded assignment distances, so
    the cutoff is reproducible cross-engine).

    Output: ``(vec_id, cluster, dist, cutoff, is_outlier)`` — every vector
    labeled, cutoff rounded to 6 dp and the flag compared against the
    ROUNDED cutoff (kills last-ulp summation-order differences between
    engines).

    Scale: the kmeans plan unchanged + one map-side-combinable per-cluster
    moment aggregate whose result is a K-row broadcast; the assignment is
    checkpointed once so the stats and labeling consumers do not re-train.
    """
    assign = kmeans_embeddings(df, k, n_iter, id_col, vec_col)
    if not assign.isStreaming:
        assign = assign.localCheckpoint(eager=False)
    cutoff = F.round(F.avg("dist") + F.lit(float(z)) * F.stddev_pop("dist"), 6)
    stats = assign.groupBy("cluster").agg(cutoff.alias("cutoff"))
    return assign.join(F.broadcast(stats), "cluster").select(
        F.col(id_col),
        F.col("cluster"),
        F.col("dist"),
        F.col("cutoff"),
        (F.col("dist") > F.col("cutoff")).alias("is_outlier"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit the deterministic Lloyd centroids OFFLINE and return them as a
    ``(k, d)`` ndarray — the model artifact :func:`kmeans_assign` consumes.
    Same pinned init / iteration as :func:`kmeans_embeddings`, so
    ``kmeans_assign(df, kmeans_fit(df, ...))`` is identical to the fused
    call (pinned by a parity test)."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    work = ensure_min_parallelism(df.select(id_col, vec_col), id_col)
    if n_iter > 0:
        work = work.persist()
    try:
        cent = _collect_init_centroids(work, k, id_col, vec_col)
        for _ in range(n_iter):
            cent = _lloyd_step(work, cent, vec_col)
    finally:
        if n_iter > 0:
            work.unpersist(blocking=False)
    return cent


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign vectors to pretrained centroids — the deployment shape
    (centroids fit once on a reference snapshot via :func:`kmeans_fit`,
    every later shard or Structured Streaming micro-batch labeled against
    the broadcast ``(k, d)`` array). Pure Arrow-batched projection — no
    aggregation, no shuffle — so it runs unchanged on a stream in append
    mode (parity pinned in ``tests/test_streaming.py``). Output:
    ``(id, cluster, dist)``, dist rounded to 6 dp, ties to the lowest
    cluster id — the exact :func:`kmeans_embeddings` contract."""
    cent = np.asarray(centroids, dtype=np.float64)
    if cent.ndim != 2:
        raise ValueError(f"centroids must be (k, d), got shape {cent.shape}")
    out = _assign(df.select(id_col, vec_col), cent, id_col, vec_col)
    return out.select(
        F.col(id_col),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )
