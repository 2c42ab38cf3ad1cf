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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from fdi_flow_spark.core.partitioning import ensure_min_parallelism, local_df


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


# ------------------------------------------------- product quantization


def pq_train(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks (Jegou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): split the ``d`` dims into ``m`` contiguous
    subspaces and run the deterministic Lloyd from
    ``pipelines.clustering`` independently in each — init is the ``ks``
    smallest ids' subvectors, so training is reproducible on any
    partitioning. Returns ``(m, ks, d/m)`` float64 codebooks.

    ALL ``m`` subspaces train in the SAME fused Arrow pass — one corpus
    scan per iteration plus one for init, independent of ``m`` (the
    per-subspace math is identical to running ``_lloyd_step`` on each
    slice, so the unrolled-SQL oracle is unchanged); each pass reduces to
    ``#partitions x m x ks`` partial rows like ``kmeans_embeddings``."""
    d = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    work = ensure_min_parallelism(
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")),
        id_col,
    )
    if n_iter > 0:
        work = work.persist()
    try:
        rows = work.orderBy(id_col).limit(ks).collect()  # TakeOrdered
        if len(rows) < ks:
            raise ValueError(f"ks={ks} exceeds the {len(rows)} available vectors")
        x0 = np.array([r["_v"] for r in rows], dtype=np.float64)  # (ks, d)
        books = np.stack([x0[:, j * sub : (j + 1) * sub] for j in range(m)])
        for _ in range(n_iter):
            books = _pq_lloyd_step(work, books)
    finally:
        if n_iter > 0:
            work.unpersist(blocking=False)
    return books


def _pq_lloyd_step(df: DataFrame, books: np.ndarray) -> np.ndarray:
    """One fused Lloyd iteration over EVERY subspace: a single
    ``mapInPandas`` pass assigns each vector's m subvectors and accumulates
    per-partition ``(subspace, cluster, count, sum)`` partials; the reduce
    runs over the tiny ``#partitions x m x ks`` table. Empty clusters keep
    their previous centroid. Per-cluster sums use the same mask-and-sum
    form as ``clustering._lloyd_step`` so the float association (and hence
    the oracle parity) is identical to the sliced per-subspace run."""
    m, ks, sub = books.shape
    bc = df.sparkSession.sparkContext.broadcast(books)
    part_schema = StructType(
        [
            StructField("subspace", LongType()),
            StructField("cluster", LongType()),
            StructField("_n", LongType()),
            StructField("_s", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        B = bc.value
        cnt = np.zeros((m, ks), dtype=np.int64)
        sm = np.zeros((m, ks, sub))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            for j in range(m):
                xj = x[:, j * sub : (j + 1) * sub]
                d2 = ((xj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                cnt[j] += np.bincount(a, minlength=ks)
                for c in range(ks):
                    msk = a == c
                    if msk.any():
                        sm[j, c] += xj[msk].sum(axis=0)
        jj, cc = np.nonzero(cnt)
        if len(jj):
            yield pd.DataFrame(
                {
                    "subspace": jj.astype(np.int64),
                    "cluster": cc.astype(np.int64),
                    "_n": cnt[jj, cc],
                    "_s": [sm[j, c].tolist() for j, c in zip(jj, cc)],
                }
            )

    part = df.select("_v").mapInPandas(partials, part_schema)
    rows = (
        part.groupBy("subspace", "cluster")
        .agg(
            F.sum("_n").alias("n"),
            F.array(*[F.sum(F.col("_s")[i]) for i in range(sub)]).alias("s"),
        )
        .collect()
    )
    new = books.copy()
    for r in rows:
        new[int(r["subspace"]), int(r["cluster"])] = np.array(
            r["s"], dtype=np.float64
        ) / float(r["n"])
    return new


def pq_encode(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-encode every vector: ``(id, codes, dists, norm)`` where
    ``codes[j]`` is the nearest codebook entry in subspace ``j`` (ties to
    the lowest code, matching the oracle's ``(dist, code)`` rank),
    ``dists[j]`` the euclidean distance to it (rounded to 6 dp), and
    ``norm`` the exact L2 norm of the full vector (ADC cosine needs it).
    One Arrow pass over the corpus against broadcast codebooks — a
    ``d``-dim float64 row becomes ``m`` byte-sized codes plus one double,
    the ~``4*d/m``-fold memory cut that makes 100 TB ANN fit in RAM."""
    if codebooks is None:
        codebooks = pq_train(
            df, m=m, ks=ks, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    mm, _, sub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast(codebooks)

    @F.pandas_udf("struct<codes: array<bigint>, dists: array<double>, norm: double>")
    def enc(v: pd.Series) -> pd.DataFrame:
        C = bc.value  # (m, ks, sub)
        X = np.stack(v.to_numpy()).astype(np.float64)  # (n, d)
        n = len(X)
        codes = np.empty((n, mm), dtype=np.int64)
        dists = np.empty((n, mm))
        for j in range(mm):
            Xj = X[:, j * sub : (j + 1) * sub]
            # direct form — matches the oracle's LIST_DISTANCE evaluation
            d2 = ((Xj[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            codes[:, j] = a
            dists[:, j] = np.sqrt(d2[np.arange(n), a])
        return pd.DataFrame(
            {
                "codes": list(codes),
                "dists": list(np.round(dists, 6)),
                "norm": np.linalg.norm(X, axis=1),
            }
        )

    out = ensure_min_parallelism(df, id_col).select(
        F.col(id_col), enc(F.col(vec_col).cast("array<double>")).alias("_e")
    )
    return out.select(
        id_col,
        F.col("_e.codes").alias("codes"),
        F.col("_e.dists").alias("dists"),
        F.col("_e.norm").alias("norm"),
    )


def cosine_topk_pq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k by asymmetric distance computation (ADC):
    codebooks train on the candidate corpus, candidates are PQ codes, and
    each query precomputes an ``(m, ks)`` lookup table of subspace dot
    products — scoring a candidate is ``m`` table gathers instead of a
    ``d``-dim dot. Same output schema as ``cosine_topk_bruteforce``
    (ties by neighbor_id ASC); the cosine denominator uses the EXACT
    stored candidate norm, so only the numerator is approximated.

    Scale shape: the code table streams through a per-partition partial
    top-k (LUT gathers, no vector math), then a tiny global rank —
    identical topology to the exact kernel but over ``m``-byte codes, so
    the streamed bytes drop ~``4*d/m``-fold."""
    from fdi_flow_spark.core.concurrency import build_concurrently

    # the query-matrix collect is independent of codebook training — overlap
    # the two jobs (guide §2.6) instead of paying the small collect's full
    # scheduling latency after the fit
    books, qrows = build_concurrently(
        lambda: pq_train(
            candidates, m=m, ks=ks, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        ),
        lambda: queries.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        ).collect(),
    )
    enc = pq_encode(
        candidates, id_col=id_col, vec_col=vec_col, codebooks=books
    )
    spark = candidates.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["_v"] for r in qrows], dtype=np.float64)  # (nq, d)
    q_norm = np.maximum(np.linalg.norm(q_mat, axis=1), 1e-12)
    mm, _, sub = books.shape
    # LUT[q, j, c] = <query_j, codebook_j[c]> — nq x m x ks doubles, tiny
    lut = np.stack(
        [q_mat[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(mm)], axis=1
    )
    bc = spark.sparkContext.broadcast((q_ids, q_norm, lut))
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("_score", DoubleType()),
        ]
    )

    def partial_topk(batches):
        ids_b, qn_b, lut_b = bc.value
        nq = len(ids_b)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            cn = np.maximum(pdf["norm"].to_numpy().astype(np.float64), 1e-12)
            nid = pdf[id_col].to_numpy().astype(np.int64)
            # scores[q, i] = sum_j LUT[q, j, codes[i, j]]
            s = np.zeros((nq, len(codes)))
            for j in range(lut_b.shape[1]):
                s += lut_b[:, j, codes[:, j]]
            s /= qn_b[:, None] * cn[None, :]
            kk = min(k + 1, s.shape[1])  # +1 absorbs a possible self-pair
            part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(nq), kk)
            ci = part.ravel()
            yield pd.DataFrame(
                {
                    "query_id": ids_b[qi],
                    "neighbor_id": nid[ci],
                    "_score": s[qi, ci],
                }
            )

    partial = enc.select(id_col, "codes", "norm").mapInPandas(partial_topk, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_score", 6).alias("cosine"),
        )
    )


def _ivfpq_encode(
    candidates: DataFrame,
    C: np.ndarray,
    books: np.ndarray,
    id_col: str,
    vec_col: str,
    M: np.ndarray | None = None,
) -> DataFrame:
    """ONE fused Arrow pass: coarse-cell assignment + PQ codes + exact
    norm — the candidate side streams exactly once and everything
    downstream carries ``(cell, codes, norm)``. With an anchor ``M`` the
    PQ codes quantize ``x - M[cell]`` (residual IVFPQ)."""
    spark = candidates.sparkSession
    mm, _, sub = books.shape
    bc_enc = spark.sparkContext.broadcast((C, books, M))

    @F.pandas_udf("struct<cell: bigint, codes: array<bigint>, norm: double>")
    def enc2(v: pd.Series) -> pd.DataFrame:
        Cn, B, Mn = bc_enc.value
        X = np.stack(v.to_numpy()).astype(np.float64)
        n = len(X)
        norms = np.linalg.norm(X, axis=1)
        Xn = X / np.maximum(norms[:, None], 1e-12)
        cells = np.argmax(Xn @ Cn.T, axis=1).astype(np.int64)
        T = X - Mn[cells] if Mn is not None else X
        codes = np.empty((n, mm), dtype=np.int64)
        for j in range(mm):
            Xj = T[:, j * sub : (j + 1) * sub]
            d2 = ((Xj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame({"cell": cells, "codes": list(codes), "norm": norms})

    return (
        ensure_min_parallelism(candidates, id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            enc2(F.col(vec_col).cast("array<double>")).alias("_e"),
        )
        .select(
            "neighbor_id",
            F.col("_e.cell").alias("cell"),
            F.col("_e.codes").alias("codes"),
            F.col("_e.norm").alias("norm"),
        )
    )


def _cell_means(candidates, C, vec_col):
    """True (unnormalized) per-cell means under the spherical assignment —
    the residual anchor. The spherical centroids themselves are UNIT
    vectors, so ``x - C[cell]`` is not centered (residual-PQ against them
    measured WORSE than raw PQ: 0.54 vs 0.63 recall@5); anchoring at the
    actual cell means recenters the residuals. One mapInPandas pass
    reducing to ``#partitions x nlist`` partial rows; empty cells fall
    back to the unit centroid."""
    nlist, d = C.shape
    bc = candidates.sparkSession.sparkContext.broadcast(C)
    part_schema = StructType(
        [
            StructField("cell", LongType()),
            StructField("_n", LongType()),
            StructField("_s", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        Cn = bc.value
        cnt = np.zeros(nlist, dtype=np.int64)
        sm = np.zeros((nlist, d))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(Xn @ Cn.T, axis=1)
            cnt += np.bincount(cells, minlength=nlist)
            for c in range(nlist):
                msk = cells == c
                if msk.any():
                    sm[c] += X[msk].sum(axis=0)
        hit = np.nonzero(cnt)[0]
        if len(hit):
            yield pd.DataFrame(
                {
                    "cell": hit.astype(np.int64),
                    "_n": cnt[hit],
                    "_s": [sm[c].tolist() for c in hit],
                }
            )

    part = candidates.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    ).mapInPandas(partials, part_schema)
    rows = (
        part.groupBy("cell")
        .agg(
            F.sum("_n").alias("n"),
            F.array(*[F.sum(F.col("_s")[i]) for i in range(d)]).alias("s"),
        )
        .collect()
    )
    M = C.copy()
    for r in rows:
        M[int(r["cell"])] = np.array(r["s"], dtype=np.float64) / float(r["n"])
    return M


def _residual_df(candidates, C, M, id_col, vec_col):
    """Residual stream ``x - M[cell(x)]`` for residual-PQ training (lazy —
    pq_train's passes recompute it, trading one extra UDF evaluation per
    pass for never materializing a second corpus). Assignment is by the
    spherical centroids ``C``; the anchor is the true cell mean ``M``."""
    bc = candidates.sparkSession.sparkContext.broadcast((C, M))

    @F.pandas_udf("array<double>")
    def resid(v: pd.Series) -> pd.Series:
        Cn, Mn = bc.value
        X = np.stack(v.to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cells = np.argmax(Xn @ Cn.T, axis=1)
        return pd.Series(list(X - Mn[cells]))

    return ensure_min_parallelism(candidates, id_col).select(
        F.col(id_col), resid(F.col(vec_col).cast("array<double>")).alias(vec_col)
    )


def _ivfpq_probe_plan(queries, C, books, nprobe, id_col, vec_col):
    """Driver-side probe planning: collect the query matrix, pick each
    query's ``nprobe`` nearest cells, and precompute the per-query ADC
    lookup tables. Returns None when there are no queries."""
    from fdi_flow_spark.pipelines.similarity import _collect_id_matrix

    spark = queries.sparkSession
    q_ids, q_mat = _collect_id_matrix(queries, id_col, vec_col)
    if len(q_ids) == 0:
        return None
    mm, _, sub = books.shape
    q_norm = np.maximum(np.linalg.norm(q_mat, axis=1), 1e-12)
    qn_mat = q_mat / q_norm[:, None]
    lut = np.stack(
        [q_mat[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(mm)], axis=1
    )
    order = np.argsort(-(qn_mat @ C.T), axis=1)[:, : min(nprobe, len(C))]
    # single-slice local relation: the probe list is broadcast-joined, and a
    # defaultParallelism-sliced pickled relation pays one Python-worker round
    # trip PER SLICE in the broadcast build (see core.partitioning.local_df)
    probes = local_df(
        spark,
        [(int(q), int(c)) for q, cs in zip(q_ids, order) for c in cs],
        "query_id long, cell long",
    )
    probed_cells = sorted({int(c) for cs in order for c in cs})
    return q_ids, q_norm, lut, probes, probed_cells, q_mat


def _ivfpq_adc_rank(cand, probes, q_ids, q_norm, lut, k, qc=None) -> DataFrame:
    """Probe join (broadcast) + ADC scoring (per-query LUT gathers) + the
    single global rank Exchange. With ``qc`` (residual mode) the score
    adds the exact ``<q, C[cell]>`` coarse term back."""
    spark = cand.sparkSession
    bc_score = spark.sparkContext.broadcast(
        ({int(q): i for i, q in enumerate(q_ids)}, q_norm, lut, qc)
    )
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("_score", DoubleType()),
        ]
    )

    def adc_score(batches):
        qpos, qn_b, lut_b, qc_b = bc_score.value
        for pdf in batches:
            if not len(pdf):
                continue
            qi = pdf["query_id"].map(qpos).to_numpy().astype(np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            cn = np.maximum(pdf["norm"].to_numpy().astype(np.float64), 1e-12)
            s = np.zeros(len(codes))
            for j in range(lut_b.shape[1]):
                s += lut_b[qi, j, codes[:, j]]
            if qc_b is not None:
                cells = pdf["cell"].to_numpy().astype(np.int64)
                s += qc_b[qi, cells]
            s /= qn_b[qi] * cn
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "_score": s,
                }
            )

    joined = cand.join(F.broadcast(probes), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id", "neighbor_id", "cell", "codes", "norm"
    ).mapInPandas(adc_score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_score", 6).alias("cosine"),
        )
    )


def _fit_ivfpq_quantizers(
    candidates: DataFrame,
    m: int,
    ks: int,
    n_iter: int,
    nlist: int,
    seed: int,
    residual: bool,
    id_col: str,
    vec_col: str,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    """The one IVF-PQ trainer chain shared by :func:`cosine_topk_ivfpq`
    and :func:`ivfpq_build_index` (r14 ADVICE: the two blocks were
    duplicated verbatim). Returns ``(C, M, books)`` with ``M`` None in
    non-residual mode.

    residual=True chains C -> M -> residual stream -> PQ (every step
    consumes the previous one, so the fits stay sequential). Non-residual:
    the coarse quantizer and the PQ codebooks both train directly on
    ``candidates`` and never read each other — two independent corpus-scan
    chains issued serially left the cluster idle through each fit's tail
    (guide §2.6), so they overlap; each trainer is seeded and
    partition-deterministic, so concurrent submission cannot change its
    output."""
    from fdi_flow_spark.core.concurrency import build_concurrently
    from fdi_flow_spark.pipelines.similarity import _train_spherical_centroids

    if residual:
        C = _train_spherical_centroids(candidates, vec_col, nlist, seed)
        M = _cell_means(candidates, C, vec_col)
        train_src = _residual_df(candidates, C, M, id_col, vec_col)
        books = pq_train(
            train_src, m=m, ks=ks, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
        return C, M, books
    C, books = build_concurrently(
        lambda: _train_spherical_centroids(candidates, vec_col, nlist, seed),
        lambda: pq_train(
            candidates, m=m, ks=ks, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        ),
    )
    return C, None, books


def cosine_topk_ivfpq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    m: int = 32,
    ks: int = 16,
    n_iter: int = 2,
    nlist: int = 32,
    nprobe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ — the canonical billion-scale ANN layout (Jegou et al. 2011):
    a spherical-k-means coarse quantizer prunes the search to ``nprobe`` of
    ``nlist`` cells, and PQ codes + per-query ADC lookup tables score the
    survivors. Composes the existing IVF coarse quantizer with ``pq_train``;
    cell assignment and PQ encoding run in ONE fused Arrow pass, so the
    candidate side streams exactly once and what shuffles afterwards is
    ``(cell, codes, norm)`` — ~4*d/m-fold fewer bytes than vectors.

    ``residual=True`` is the FAISS IVFPQ layout: PQ quantizes
    ``x - C[cell]`` and ADC adds the exact ``<q, C[cell]>`` coarse term
    back — higher recall at the same code size for one extra training
    UDF per pass. Same output schema as ``cosine_topk_bruteforce``;
    recall floors for both modes are pinned in
    tests/test_quantization.py."""
    C, M, books = _fit_ivfpq_quantizers(
        candidates, m, ks, n_iter, nlist, seed, residual, id_col, vec_col
    )
    spark = candidates.sparkSession
    plan = _ivfpq_probe_plan(queries, C, books, nprobe, id_col, vec_col)
    if plan is None:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    q_ids, q_norm, lut, probes, _, q_mat = plan
    cand = _ivfpq_encode(candidates, C, books, id_col, vec_col, M=M)
    qc = (q_mat @ M.T) if residual else None
    return _ivfpq_adc_rank(cand, probes, q_ids, q_norm, lut, k, qc=qc)


def ivfpq_build_index(
    candidates: DataFrame,
    path: str,
    m: int = 32,
    ks: int = 16,
    n_iter: int = 2,
    nlist: int = 32,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> None:
    """Materialize an IVF-PQ index: ``{path}/centroids`` (nlist tiny
    rows), ``{path}/codebooks`` (m x ks tiny rows), and
    ``{path}/postings`` — ``(neighbor_id, codes, norm)`` written
    ``partitionBy(cell)``. The postings hold PQ codes INSTEAD of vectors,
    so the persisted index is ~4*d/m-fold smaller than the float IVF
    postings of ``ivf_build_index`` — at 100 TB that is the difference
    between an in-memory probe and a spilling one. One full fused-encode
    pass over the corpus; the quantizers retrain only on drift."""
    C, M, books = _fit_ivfpq_quantizers(
        candidates, m, ks, n_iter, nlist, seed, residual, id_col, vec_col
    )
    spark = candidates.sparkSession
    # single-slice local relations (core.partitioning.local_df): these three
    # one-file metadata writes used to cost ~5 s EACH — a coalesce(1) over a
    # defaultParallelism-sliced pickled relation computes every slice through
    # one sequential Python-worker round trip per slice (r10 profiling: 15 of
    # the build's 20 s at sf0.01 were these three writes).
    local_df(spark, [(bool(residual),)], "residual boolean").write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    anchor = M if M is not None else C
    local_df(
        spark,
        [
            (int(j), [float(x) for x in C[j]], [float(x) for x in anchor[j]])
            for j in range(len(C))
        ],
        "cell long, centroid array<double>, anchor array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    mm, kk, _ = books.shape
    local_df(
        spark,
        [
            (int(j), int(c), [float(x) for x in books[j, c]])
            for j in range(mm)
            for c in range(kk)
        ],
        "subspace long, code long, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    _ivfpq_encode(candidates, C, books, id_col, vec_col, M=M).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/postings")


def ivfpq_query_index(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF-PQ index: probe cells are chosen against the
    tiny centroid table, the postings scan is filtered to the probed cells
    (partition-pruned read — I/O scales with ``nprobe/nlist`` of the
    index), and scoring is ADC over the stored codes. Same output schema
    as ``cosine_topk_bruteforce``; plan-asserted pruning in
    tests/test_quantization.py."""
    spark = queries.sparkSession
    residual = bool(spark.read.parquet(f"{path}/meta").first()["residual"])
    crows = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(crows), len(crows[0]["centroid"])))
    A = np.zeros_like(C)
    for r in crows:
        C[int(r["cell"])] = r["centroid"]
        A[int(r["cell"])] = r["anchor"]
    brows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(int(r["subspace"]) for r in brows)
    kk = 1 + max(int(r["code"]) for r in brows)
    sub = len(brows[0]["centroid"])
    books = np.zeros((mm, kk, sub))
    for r in brows:
        books[int(r["subspace"]), int(r["code"])] = r["centroid"]

    plan = _ivfpq_probe_plan(queries, C, books, nprobe, id_col, vec_col)
    if plan is None:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    q_ids, q_norm, lut, probes, probed_cells, q_mat = plan
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("cell").isin(probed_cells)  # partition filter -> pruned read
    )
    qc = (q_mat @ A.T) if residual else None
    return _ivfpq_adc_rank(postings, probes, q_ids, q_norm, lut, k, qc=qc)
