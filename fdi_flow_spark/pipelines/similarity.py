"""Similarity search over an embeddings table ``(vec_id, embedding ARRAY<FLOAT>, label)``.

- ``cosine_topk_bruteforce``: exact cosine top-k — the correctness baseline.
  Norms are computed once per side *before* the join (never per pair), the
  query side is broadcast, and the dot product is a JVM-side higher-order
  function (``zip_with`` + ``aggregate``) — no Python, no UDF.
- ``cosine_topk_lsh``: the scale path — random-hyperplane (signed projection)
  LSH buckets; only bucket-colliding pairs are scored, then exact-reranked.
  Hyperplanes are a seeded driver-side constant (broadcast literals), so the
  result is deterministic.
- ``knn_classify_exact``: the reference's KNN fault detector (D1,
  ``/root/reference/fdi_flow/detectors/sklearn_detectors.py:19-253``)
  re-expressed relationally: distance -> rank -> majority vote, all SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from fdi_flow_spark.core.partitioning import local_df


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


# Errors that mean "the Arrow pull path is unavailable here" (no
# DataFrame.toArrow on this PySpark, Arrow stack missing/broken) — the only
# conditions under which _collect_id_matrix may fall back to a row collect.
try:
    import pyarrow as _pa

    _ARROW_UNAVAILABLE_ERRORS: tuple = (AttributeError, ImportError, _pa.ArrowException)
except ImportError:  # pragma: no cover - pyarrow is baked into this env
    _ARROW_UNAVAILABLE_ERRORS = (AttributeError, ImportError)


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _collect_id_matrix(df, id_col, vec_col, limit=None):
    """Pull ``(ids int64, (n, d) float64 matrix)`` to the driver for the
    broadcast fast-paths. Arrow-batched via ``DataFrame.toArrow`` when
    available (one Arrow table instead of py4j Row objects — measurably
    faster and allocation-light; r9), with a flat zero-copy reshape when
    the list column is rectangular and null-free; falls back to the row
    collect on any Arrow unavailability. ``limit`` caps the pull with a
    LIMIT pushed into the scan (the broadcast-cap probes rely on it)."""
    sel = df.select(
        F.col(id_col).cast("long").alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    if limit is not None:
        sel = sel.limit(limit)
    # Fallback is for ARROW UNAVAILABILITY only (r9 ADVICE: a broad except
    # around the whole conversion masked post-collection reshape bugs and
    # re-executed the scan via collect). The try covers just the toArrow()
    # call; everything after it propagates.
    try:
        tbl = sel.toArrow()
    except _ARROW_UNAVAILABLE_ERRORS:
        rows = sel.collect()
        ids = np.array([r["_id"] for r in rows], dtype=np.int64)
        M = np.array([r["_v"] for r in rows], dtype=np.float64)
        return ids, M
    id_arr = tbl.column(0)
    if id_arr.null_count:
        # the old collect path surfaced null ids as None -> TypeError; the
        # Arrow path would silently turn them into NaN -> int64 garbage
        raise ValueError(
            f"{id_col} has {id_arr.null_count} null value(s); ids must be non-null"
        )
    ids = id_arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    n = tbl.num_rows
    if n == 0:
        return ids, np.zeros((0, 0), dtype=np.float64)
    col = tbl.column(1).combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    values = col.flatten()  # offset-safe concatenation of the list rows
    if (
        col.null_count == 0
        and values.null_count == 0
        and len(widths)
        and widths.min() == widths.max()
        and widths[0] > 0
    ):
        flat = values.to_numpy(zero_copy_only=False)
        return ids, flat.reshape(n, int(widths[0])).astype(np.float64, copy=False)
    return ids, np.array(col.to_pylist(), dtype=np.float64)


def _blocked_partial_topk(candidates: DataFrame, q_ids, q_mat, k: int, metric: str,
                          id_col: str, vec_col: str, carry_cols=None) -> DataFrame:
    """mapInPandas blocked scorer: each Arrow batch of candidates is scored
    against the broadcast query matrix with one BLAS matmul, and only the
    per-batch top-k per query survives. The shuffle that follows carries
    O(batches * |Q| * k) rows instead of O(|Q| * |C|) — this is the shape
    that scales to 10^9 candidates.

    ``carry_cols``: names of extra candidate columns to thread through the
    scorer output unchanged (e.g. a train label). Carrying them here keeps
    downstream consumers from re-joining against the full candidate corpus
    — the surviving rows are O(batches * |Q| * k), so the carried payload
    stays small no matter how large the corpus is."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    carry_cols = list(carry_cols or [])
    spark = candidates.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, q_mat))
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("_score", DoubleType()),
        ]
        + [StructField(c, candidates.schema[c].dataType) for c in carry_cols]
    )

    def fn(batches):
        q_ids_l, Q = bq.value  # (nq,), (nq, d) float64
        # Zero-norm guard: a zero vector's cosine is defined as 0 here (the
        # clamp keeps the division finite) instead of NaN, which numpy would
        # otherwise rank FIRST under argpartition — a latent correctness bug.
        qn = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf["_v"].tolist(), dtype=np.float64)  # (nc, d)
            nid = pdf["_nid"].to_numpy()
            if metric == "cosine":
                cn = np.maximum(np.linalg.norm(C, axis=1), 1e-12)
                S = (C @ Q.T) / np.outer(cn, qn)  # (nc, nq) similarity
                order_scores = -S
            else:  # squared euclidean distance
                d2 = (
                    (C * C).sum(axis=1)[:, None]
                    - 2.0 * (C @ Q.T)
                    + (Q * Q).sum(axis=1)[None, :]
                )
                S = d2
                order_scores = S
            # NaN guard (ADVICE r7): NaN vector components propagate into
            # the l2 distances (cosine is norm-clamped). Left alone they
            # poison BOTH selections — np.partition can pick NaN at the
            # kk-th slot (`<=` then drops every candidate for that query),
            # and an emitted NaN becomes SQL NULL, which sorts FIRST in the
            # downstream ascending rank. Pin non-finite scores to the
            # worst-possible value instead, so NaN candidates rank last in
            # batch selection and in the global rank alike.
            order_scores = np.where(np.isfinite(order_scores), order_scores, np.inf)
            S = -order_scores if metric == "cosine" else order_scores
            nc = len(nid)
            carried = {c: pdf[c].to_numpy() for c in carry_cols}
            kk = min(k + 1, nc)  # +1 so a self-pair can be dropped later
            q_arr = np.asarray(q_ids_l)
            # Boundary-tie-safe top-kk, fully vectorized (a per-query
            # Python loop here was measured at ~2x the whole query's cost
            # when ensure_min_parallelism splits the candidates into tiny
            # batches): per query, EVERY candidate at or under the kk-th
            # smallest order-score survives — a superset of the exact
            # top-kk that includes boundary ties, never more than kk +
            # ties rows. The downstream (score, neighbor_id) rank window
            # performs the exact global cut, so emitting the tie-closed
            # superset is semantics-preserving and loop-free.
            if kk < nc:
                thresh = np.partition(order_scores, kk - 1, axis=0)[kk - 1]
                ci, qj = np.nonzero(order_scores <= thresh[None, :])
            else:
                ci, qj = np.nonzero(np.ones((nc, len(q_arr)), dtype=bool))
            rows = {
                "query_id": q_arr[qj],
                "neighbor_id": nid[ci],
                "_score": S[ci, qj],
            }
            rows.update({c: carried[c][ci] for c in carry_cols})
            yield pd.DataFrame(rows)

    c = candidates.select(
        F.col(id_col).alias("_nid"),
        _as_double(F.col(vec_col)).alias("_v"),
        *[F.col(c) for c in carry_cols],
    )
    return c.mapInPandas(fn, schema=out_schema)


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output ``(query_id, rank, neighbor_id, cosine)`` (cosine rounded to 6 dp;
    ties broken by neighbor_id ASC). Self-pairs are excluded by id.

    Execution: the query matrix (assumed broadcastable — that's what makes it
    a top-k *search*) ships to executors once; candidates stream through a
    BLAS-blocked partial top-k (see ``_blocked_partial_topk``), then a tiny
    global rank finishes the job.
    """
    q_ids, q_mat = _collect_id_matrix(queries, id_col, vec_col)
    spark = candidates.sparkSession
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    partial = _blocked_partial_topk(candidates, q_ids, q_mat, k, "cosine", id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(F.col("_score").desc(), F.col("neighbor_id").asc())
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


def _hyperplanes(dim: int, n_planes: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, planes) -> "F.Column":
    """Signed-projection bucket id: bit i = sign(<v, plane_i>)."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        proj = _dot(vec_col, arr)
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _lsh_buckets_all_tables(vec_col, dim, n_planes, n_tables, seed) -> "F.Column":
    """Array of bucket ids, one per table — all tables in ONE projection so
    the (table, bucket) rows come from a single ``posexplode`` over a single
    corpus scan (a per-table union re-reads the corpus ``n_tables`` times)."""
    return F.array(
        *[
            lsh_bucket(vec_col, _hyperplanes(dim, n_planes, seed + t))
            for t in range(n_tables)
        ]
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent random-hyperplane
    bucketings; a pair is scored only when it collides in at least one table.
    Exact cosine reranks the collided set. Same output schema as brute force.

    Defaults (4 planes x 8 tables) target the top-k regime where neighbors
    sit at cosine ~0.3-0.5: collision probability per table is
    (1 - acos(c)/pi)^planes, so FEWER planes (wider buckets) and MORE tables
    is what buys recall; 6x4 measured only ~0.16 recall@5 on random 64-dim
    data versus ~0.5+ for 4x8. Tune planes UP only when neighbors are
    near-duplicates (cosine > 0.8).

    At 100 TB the candidate side is partitioned by (table, bucket) — each
    bucket is a tiny fraction of the corpus, so the join is sparse instead of
    O(|Q|·|C|).
    """
    sample = candidates.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = sample["d"]
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    qall = q.select(
        "query_id",
        "_qv",
        "_qn",
        F.posexplode(_lsh_buckets_all_tables(F.col("_qv"), dim, n_planes, n_tables, seed)).alias(
            "table", "bucket"
        ),
    )
    call = c.select(
        "neighbor_id",
        "_cv",
        "_cn",
        F.posexplode(_lsh_buckets_all_tables(F.col("_cv"), dim, n_planes, n_tables, seed)).alias(
            "table", "bucket"
        ),
    )
    cand = (
        call.join(F.broadcast(qall), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_qn", "_cv", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("_cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_cos", 6).alias("cosine"),
        )
    )


def _train_spherical_centroids(
    candidates: DataFrame,
    vec_col: str,
    nlist: int,
    seed: int,
    sample_cap: int = 20_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Coarse quantizer for IVF: seeded Lloyd's on L2-normalized vectors
    (spherical k-means) over a bounded sample. The quantizer is tiny
    (nlist x dim) and training on a capped sample is the standard IVF
    recipe — the driver never holds more than ``sample_cap`` vectors."""
    n = candidates.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = candidates.select(_as_double(F.col(vec_col)).alias("_v"))
    if frac < 1.0:
        sample = sample.sample(fraction=frac, seed=seed)
    M = np.array([r["_v"] for r in sample.collect()], dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    nlist = min(nlist, len(M))
    C = M[rng.choice(len(M), size=nlist, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(nlist):
            members = M[assign == j]
            if len(members) == 0:
                C[j] = M[rng.integers(len(M))]
            else:
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    nprobe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index — the
    cluster-pruned scale path alongside ``cosine_topk_lsh``.

    1. Train a spherical-k-means coarse quantizer on a bounded sample
       (driver-side, deterministic under ``seed``).
    2. Assign every candidate to its nearest centroid with a BLAS matmul
       per Arrow batch (vectorized pandas UDF — argmax over ``nlist``
       centroids is exactly the shape pandas UDFs are for).
    3. Probe: each query scans only its ``nprobe`` nearest cells — the
       scored candidate set is ~``nprobe/nlist`` of the corpus; the
       (query_id, cell, vector) probe table is broadcast, so the only
       wide operation is the final per-query rank.

    Same output schema as ``cosine_topk_bruteforce``; recall grows with
    ``nprobe/nlist`` (measured in ``tests/test_similarity.py``). At 100 TB:
    nlist ~ sqrt(N), candidates written partitioned by cell so a probe is a
    partition-pruned scan, quantizer retrained only on drift."""
    from pyspark.sql.types import LongType

    C = _train_spherical_centroids(candidates, vec_col, nlist, seed)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(C)

    @F.pandas_udf(LongType())
    def assign_cell(vecs: pd.Series) -> pd.Series:
        Cn = bc.value
        M = np.array(vecs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype(np.int64))

    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cell", assign_cell(F.col("_cv"))).withColumn("_cn", _norm(F.col("_cv")))

    q_ids, Q = _collect_id_matrix(queries, id_col, vec_col)
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Qn @ C.T), axis=1)[:, : min(nprobe, len(C))]
    probe_rows = [
        (int(qid), [int(c) for c in cells], [float(x) for x in vec])
        for qid, cells, vec in zip(q_ids, order, Q)
    ]
    probes = spark.createDataFrame(
        probe_rows, schema="query_id long, _cells array<int>, _qv array<double>"
    ).select(
        "query_id", F.explode("_cells").alias("_cell"), "_qv"
    ).withColumn("_qn", _norm(F.col("_qv")))

    cos = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        cand.join(F.broadcast(probes), "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_cos", 6).alias("cosine"),
        )
    )


def cosine_near_dup_blocked(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 8192,
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs with NO driver-side corpus
    materialization — the beyond-broadcast *exact* path (the approximate
    beyond-broadcast path is ``cosine_near_dup_lsh``).

    Grid self-join on hash-assigned row blocks: every row lands in one of
    ``n_blocks`` buckets by id hash, replicates (row-level) to every
    block-pair key it participates in (side A to partners >= its block,
    side B to partners <= it — upper triangle, each unordered pair once),
    and ONE ``groupBy(pair_key).applyInPandas`` meets the two sides with a
    BLAS matmul per block-pair, emitting only above-threshold pairs. Total
    arithmetic is the same O(n^2 d) as the broadcast path, but per-task
    memory is bounded regardless of corpus size: ``2 * rows_per_block * d
    * 8`` bytes for the two block matrices PLUS a score slice the matmul
    is chunked to — ``1024 * rows_per_block * 8`` bytes (~64 MiB at the
    defaults; an unchunked score matrix would be rows_per_block^2 * 8 =
    ~512 MiB, the dominant term — r8 ADVICE). The shuffle moves compact
    spillable UnsafeRows; no collect_list buffers — a packed-block draft
    OOM'd an 8 GiB JVM at a 196-block grid. The only driver work is a
    count() when ``n_blocks`` is not given. Data movement is
    O(n * n_blocks) — each row ships once per partner block — the
    unavoidable cost of *exact* all-pairs at scale.

    Output contract is identical to ``cosine_near_dup_pairs``:
    ``(id_a, id_b, cosine)`` with ``id_a < id_b``, cosine rounded to 6 dp,
    zero vectors clamped (cosine ~0, never NaN). Each unordered pair is
    examined in exactly one block-pair task, so no dedup pass is needed.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = emb.sparkSession
    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    base = emb.select(
        F.col(id_col).cast("long").alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    if n_blocks is None:
        n = base.count()  # distributed aggregate; no row data reaches the driver
        if n == 0:
            return spark.createDataFrame([], schema)
        n_blocks = max(1, -(-n // rows_per_block))
    nb = int(n_blocks)
    # BlockMatrix-multiply shape, ROW-LEVEL (r8 x100 finding): an earlier
    # draft packed each block into one collect_list row and met pairs with
    # a hash aggregation — whole blocks then sat in agg buffers and a 196-
    # block grid OOM'd an 8 GiB JVM. Here each ROW replicates to its pair
    # keys (side A to every partner >= its block, side B to every partner
    # <= it), the shuffle moves compact spill-friendly UnsafeRows, and
    # applyInPandas materializes exactly ONE block-pair per group —
    # per-task memory is the two block matrices (2 * rows_per_block * d
    # * 8 bytes) plus the chunked score slice (1024 * rows_per_block * 8
    # bytes; see fn), independent of corpus size and block count. Keying
    # by the PAIR spreads the O(n * nb) replicated bytes evenly over
    # reducers.
    tagged = base.withColumn("_blk", F.pmod(F.xxhash64("_id"), F.lit(nb)))
    side_a = tagged.select(
        F.col("_blk").alias("_ba"),
        F.explode(F.sequence(F.col("_blk"), F.lit(nb - 1))).alias("_bb"),
        F.lit(0).alias("_side"),
        "_id",
        "_v",
    )
    side_b = tagged.select(
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("_ba"),
        F.col("_blk").alias("_bb"),
        F.lit(1).alias("_side"),
        "_id",
        "_v",
    )
    both = side_a.unionByName(side_b)

    def fn(key, pdf):
        ba, bb = key
        a = pdf[pdf["_side"] == 0]
        b = pdf[pdf["_side"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ida = a["_id"].to_numpy(dtype=np.int64)
        A = np.array(a["_v"].tolist(), dtype=np.float64)
        idb = b["_id"].to_numpy(dtype=np.int64)
        B = np.array(b["_v"].tolist(), dtype=np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        # Chunk the matmul over A-rows (r8 ADVICE): a full score matrix is
        # rows^2 * 8 bytes (~512 MiB at the 8192 default) — the dominant
        # per-task term, not the A/B matrices. A 1024-row chunk caps the
        # score slice at chunk * rows * 8 (~64 MiB) with the same BLAS
        # throughput (the K dimension is unchanged).
        out = []
        for lo in range(0, len(ida), 1024):
            Sc = An[lo : lo + 1024] @ Bn.T
            mask = Sc >= threshold
            if ba == bb:
                mask &= ida[lo : lo + 1024, None] < idb[None, :]
            i, j = np.nonzero(mask)
            if len(i):
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(ida[lo + i], idb[j]),
                            "id_b": np.maximum(ida[lo + i], idb[j]),
                            "cosine": np.round(Sc[i, j], 6),
                        }
                    )
                )
        if not out:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.concat(out, ignore_index=True)

    return both.groupBy("_ba", "_bb").applyInPandas(fn, schema)


def _blocked_bipartite_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    carry_cols=None,
    rows_per_block: int = 8192,
    q_blocks: int | None = None,
    c_blocks: int | None = None,
) -> DataFrame:
    """Bipartite block-grid partial top-k with NO driver-side collect on
    EITHER side — the beyond-broadcast twin of ``_blocked_partial_topk``
    (which broadcasts the query matrix, capping the query set at driver
    memory).

    Both sides land in hash blocks; each row replicates across the other
    side's block axis (``explode(sequence(...))``) and ONE
    ``groupBy((q_block, c_block)).applyInPandas`` meets them — the pair
    key spreads the O(Q*ncb + C*nqb) replicated bytes evenly over
    reducers, and each task materializes exactly one block-pair (rows
    shuffle as spillable UnsafeRows, never collect_list buffers). Each
    block-pair task runs one BLAS matmul and emits the tie-closed
    per-query top-(k+1) within that candidate block; the surviving rows
    are O(Q * c_blocks * k), which the caller's global rank window cuts
    exactly. Non-finite scores rank last (same NaN contract as the
    broadcast scorer).

    Output: ``(query_id, neighbor_id, _score, *carry_cols)`` — same
    contract as ``_blocked_partial_topk``.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    carry_cols = list(carry_cols or [])
    spark = candidates.sparkSession
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("_score", DoubleType()),
        ]
        + [StructField(c, candidates.schema[c].dataType) for c in carry_cols]
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("_qid"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = candidates.select(
        F.col(id_col).cast("long").alias("_nid"),
        _as_double(F.col(vec_col)).alias("_v"),
        *[F.col(cc) for cc in carry_cols],
    )
    if q_blocks is None or c_blocks is None:
        # ONE combined job sizes both sides (r8 VERDICT item 5: this used
        # to be two count() actions per call when blocks were unset): tag
        # and union, one map-side-combinable aggregate. Block sizing needs
        # only the order of magnitude; callers at scale should pass
        # explicit blocks (zero extra jobs — the registry queries do).
        counts = {
            r["_s"]: r["count"]
            for r in q.select(F.lit(0).alias("_s"))
            .unionByName(c.select(F.lit(1).alias("_s")))
            .groupBy("_s")
            .count()
            .collect()
        }
        nq, ncnt = counts.get(0, 0), counts.get(1, 0)
        if (q_blocks is None and nq == 0) or (c_blocks is None and ncnt == 0):
            return spark.createDataFrame([], out_schema)
        if q_blocks is None:
            q_blocks = max(1, -(-nq // rows_per_block))
        if c_blocks is None:
            c_blocks = max(1, -(-ncnt // rows_per_block))
    nqb, ncb = int(q_blocks), int(c_blocks)
    # Row-level replication + applyInPandas over the (q_block, c_block)
    # pair key — same memory rationale as cosine_near_dup_blocked: rows
    # shuffle as compact spillable UnsafeRows and each task materializes
    # exactly one block-pair, so per-task memory is bounded by the two
    # block matrices (2 * rows_per_block * d * 8 bytes) plus the chunked
    # score slice (rows_per_block * 1024 * 8 bytes; see fn) regardless of
    # either side's total size.
    qrep = q.select(
        F.pmod(F.xxhash64("_qid"), F.lit(nqb)).alias("_qb"),
        F.explode(F.sequence(F.lit(0), F.lit(ncb - 1))).alias("_cb"),
        F.lit(0).alias("_side"),
        F.col("_qid").alias("_id"),
        F.col("_qv").alias("_vec"),
        *[
            F.lit(None).cast(candidates.schema[cc].dataType).alias(cc)
            for cc in carry_cols
        ],
    )
    crep = c.select(
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("_qb"),
        F.pmod(F.xxhash64("_nid"), F.lit(ncb)).alias("_cb"),
        F.lit(1).alias("_side"),
        F.col("_nid").alias("_id"),
        F.col("_v").alias("_vec"),
        *[F.col(cc) for cc in carry_cols],
    )
    both = qrep.unionByName(crep)
    empty = {
        "query_id": pd.Series([], dtype="int64"),
        "neighbor_id": pd.Series([], dtype="int64"),
        "_score": pd.Series([], dtype="float64"),
    }

    def fn(key, pdf):
        qs = pdf[pdf["_side"] == 0]
        cs = pdf[pdf["_side"] == 1]
        if not len(qs) or not len(cs):
            return pd.DataFrame(dict(empty, **{cc: [] for cc in carry_cols}))
        qid = qs["_id"].to_numpy(dtype=np.int64)
        Q = np.array(qs["_vec"].tolist(), dtype=np.float64)
        nid = cs["_id"].to_numpy(dtype=np.int64)
        C = np.array(cs["_vec"].tolist(), dtype=np.float64)
        nc = len(nid)
        kk = min(k + 1, nc)  # +1 so a self-pair can drop later
        if metric == "cosine":
            qn = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)
            cn = np.maximum(np.linalg.norm(C, axis=1), 1e-12)
        else:
            c_sq = (C * C).sum(axis=1)[:, None]
        # Chunk over query columns (r8 ADVICE): a full score matrix is
        # nc * nq * 8 bytes (~512 MiB at the 8192 defaults); a 1024-query
        # slice caps it at nc * 1024 * 8 (~64 MiB). The per-query
        # np.partition needs complete candidate COLUMNS, which chunking
        # the query axis preserves.
        parts = []
        for lo in range(0, len(qid), 1024):
            Qc = Q[lo : lo + 1024]
            if metric == "cosine":
                S = (C @ Qc.T) / np.outer(cn, qn[lo : lo + 1024])  # (nc, q)
                order = -S
            else:
                order = c_sq - 2.0 * (C @ Qc.T) + (Qc * Qc).sum(axis=1)[None, :]
            order = np.where(np.isfinite(order), order, np.inf)
            S = -order if metric == "cosine" else order
            if kk < nc:
                thresh = np.partition(order, kk - 1, axis=0)[kk - 1]
                ci, qj = np.nonzero(order <= thresh[None, :])
            else:
                ci, qj = np.nonzero(np.ones((nc, Qc.shape[0]), dtype=bool))
            out = {
                "query_id": qid[lo + qj],
                "neighbor_id": nid[ci],
                "_score": S[ci, qj],
            }
            for cc in carry_cols:
                out[cc] = cs[cc].to_numpy()[ci]
            parts.append(pd.DataFrame(out))
        return pd.concat(parts, ignore_index=True)

    return both.groupBy("_qb", "_cb").applyInPandas(fn, schema=out_schema)


def cosine_topk_blocked(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 8192,
) -> DataFrame:
    """Exact top-k cosine neighbors with NO driver-side collect on either
    side — the beyond-broadcast twin of ``cosine_topk_bruteforce`` (whose
    query matrix must fit a broadcast). Identical output contract:
    ``(query_id, rank, neighbor_id, cosine)``, cosine rounded to 6 dp,
    ties by neighbor_id ASC, self-pairs excluded. Use when the query set
    itself is corpus-sized (e.g. all-pairs k-NN graphs for SemDeDup-style
    pipelines)."""
    partial = _blocked_bipartite_topk(
        queries, candidates, k, "cosine", id_col, vec_col, rows_per_block=rows_per_block
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_score").desc(), F.col("neighbor_id").asc())
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


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_collect_rows: int = 2_000_000,
    strategy: str = "auto",
    rows_per_block: int = 8192,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (driver mandate §2.9):
    every ``(id_a, id_b)`` with ``id_a < id_b`` and cosine >= ``threshold``.
    Zero vectors score cosine ~0 (clamped norms), never NaN.

    ``strategy='broadcast'``: the corpus matrix is L2-normalized once on the
    driver and broadcast; candidate rows stream through a blocked BLAS
    matmul, emitting only above-threshold upper-triangle pairs — the shuffle
    carries matches, never the O(n^2) pair space. Fast while one side fits
    in a broadcast; the collect is capped at ``max_collect_rows + 1`` rows
    (a LIMIT pushed into the scan — no separate count pass).

    ``strategy='blocked'``: ``cosine_near_dup_blocked`` — same exact output,
    no driver-side corpus materialization (grid self-join on hash blocks).

    ``strategy='auto'`` (default): broadcast under the cap, blocked beyond
    it — the cap is a fast-path switch, not a hard ceiling.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if strategy not in ("auto", "broadcast", "blocked"):
        raise ValueError(
            f"strategy must be 'auto', 'broadcast' or 'blocked', got {strategy!r}"
        )
    if strategy == "blocked":
        return cosine_near_dup_blocked(
            emb, threshold, id_col, vec_col, rows_per_block=rows_per_block
        )
    ids, M = _collect_id_matrix(emb, id_col, vec_col, limit=max_collect_rows + 1)
    if len(ids) > max_collect_rows:
        if strategy == "auto":
            return cosine_near_dup_blocked(
                emb, threshold, id_col, vec_col, rows_per_block=rows_per_block
            )
        raise ValueError(
            f"cosine_near_dup_pairs(strategy='broadcast') collects the corpus "
            f"(> max_collect_rows={max_collect_rows} rows); use "
            "strategy='blocked' (exact) or cosine_near_dup_lsh (approximate) "
            "for beyond-broadcast corpora"
        )
    spark = emb.sparkSession
    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    if len(ids) == 0:
        return spark.createDataFrame([], schema)
    Qn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    bq = spark.sparkContext.broadcast((ids, Qn))

    def fn(batches):
        q_ids, Q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf["_v"].tolist(), dtype=np.float64)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            cid = pdf["_nid"].to_numpy()
            S = Cn @ Q.T  # (nc, nq) cosine
            mask = (S >= threshold) & (cid[:, None] < q_ids[None, :])
            i, j = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": cid[i],
                    "id_b": q_ids[j],
                    "cosine": np.round(S[i, j], 6),
                }
            )

    c = emb.select(F.col(id_col).alias("_nid"), _as_double(F.col(vec_col)).alias("_v"))
    return c.mapInPandas(fn, schema)


def cosine_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs — the beyond-broadcast scale path.

    ``n_tables`` independent random-hyperplane bucketings; only same-bucket
    pairs are scored, then verified with exact cosine >= ``threshold``.
    No driver-side collect and no broadcast of the corpus: the self-join is
    per (table, bucket), so each reducer sees one bucket's vectors. Recall
    for cosine c with p planes is 1-(1-(1-acos(c)/pi)^p)^tables (~0.75 at
    c=0.4 with the defaults); raise ``n_tables`` to trade compute for recall.
    """
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", _norm(F.col("_v")))
    allb = base.select(
        "id",
        "_v",
        "_n",
        F.posexplode(_lsh_buckets_all_tables(F.col("_v"), dim, n_planes, n_tables, seed)).alias(
            "table", "bucket"
        ),
    )
    a, b = allb.alias("a"), allb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def knn_classify_exact(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    weights: str = "uniform",
    strategy: str = "auto",
    max_collect_rows: int = 2_000_000,
    rows_per_block: int = 8192,
) -> DataFrame:
    """Exact KNN classification (reference D1 semantics: minkowski p=2,
    majority vote; ``weights='distance'`` uses 1/d vote weights).

    Output ``(vec_id, pred_label)``. Vote ties break by (vote DESC, label ASC);
    distance ties rank by train id ASC — both pinned for determinism.

    ``strategy='broadcast'``: the TEST set (the "query" side) collects to
    the driver and broadcasts; the train corpus streams through the BLAS-
    blocked scorer — scales with training-set size, caps the test set at
    driver memory. ``'blocked'``: the bipartite block grid
    (``_blocked_bipartite_topk``) — neither side touches the driver, for
    corpus-sized test sets. ``'auto'`` (default): broadcast under
    ``max_collect_rows``, blocked beyond it. All strategies are
    output-identical (pytest parity)."""
    if strategy not in ("auto", "broadcast", "blocked"):
        raise ValueError(
            f"strategy must be 'auto', 'broadcast' or 'blocked', got {strategy!r}"
        )
    tr = train.select(
        F.col(id_col), F.col(vec_col), F.col(label_col).alias("_tl")
    )
    partial = None
    if strategy != "blocked":
        q_ids, q_mat = _collect_id_matrix(
            test, id_col, vec_col, limit=max_collect_rows + 1
        )
        if len(q_ids) > max_collect_rows:
            if strategy == "broadcast":
                raise ValueError(
                    f"knn_classify_exact(strategy='broadcast') collects the test "
                    f"set (> max_collect_rows={max_collect_rows} rows); use "
                    "strategy='blocked'"
                )
        else:
            if len(q_ids) == 0:
                return train.sparkSession.createDataFrame(
                    [],
                    schema=f"vec_id long, pred_label {train.schema[label_col].dataType.simpleString()}",
                )
            # The train label rides through the blocked scorer's output
            # schema, so the vote below touches only the O(|Q|*k) surviving
            # rows — no join back against the train corpus (a corpus-sized
            # broadcast would kill the driver at the 10^9-candidate scale
            # the scorer is designed for).
            partial = _blocked_partial_topk(
                tr, q_ids, q_mat, k, "l2", id_col, vec_col, carry_cols=["_tl"]
            )
    if partial is None:  # blocked, or auto beyond the cap
        partial = _blocked_bipartite_topk(
            test, tr, k, "l2", id_col, vec_col, carry_cols=["_tl"],
            rows_per_block=rows_per_block,
        )
    w = Window.partitionBy("query_id").orderBy(F.col("_score").asc(), F.col("neighbor_id").asc())
    knn = partial.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    if weights == "distance":
        vote = F.sum(F.lit(1.0) / F.sqrt(F.greatest(F.col("_score"), F.lit(1e-24))))
    else:
        vote = F.count("*").cast("double")
    votes = knn.groupBy("query_id", "_tl").agg(vote.alias("_vote"))
    vw = Window.partitionBy("query_id").orderBy(F.col("_vote").desc(), F.col("_tl").asc())
    return (
        votes.withColumn("_vr", F.row_number().over(vw))
        .where(F.col("_vr") == 1)
        .select(F.col("query_id").alias("vec_id"), F.col("_tl").alias("pred_label"))
    )


def ivf_build_index(
    candidates: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    seed: int = 42,
) -> None:
    """Materialize an IVF index: ``{path}/centroids`` (nlist tiny rows) and
    ``{path}/postings`` written ``partitionBy(_cell)`` — the persisted form
    of ``cosine_topk_ivf``'s in-flight index. At 100 TB the postings write
    is the one full pass over the corpus; every later probe reads only the
    probed cells' directories (partition pruning), and the quantizer is
    retrained only on drift."""
    from pyspark.sql.types import LongType

    C = _train_spherical_centroids(candidates, vec_col, nlist, seed)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(C)

    @F.pandas_udf(LongType())
    def assign_cell(vecs: pd.Series) -> pd.Series:
        Cn = bc.value
        M = np.array(vecs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ Cn.T, axis=1).astype(np.int64))

    # single-slice local relation: a coalesce(1) over the default pickled
    # relation pays one Python-worker round trip per slice in ONE task
    # (~5 s to write nlist rows on local[32]; core.partitioning.local_df)
    local_df(
        spark,
        [(int(j), [float(x) for x in C[j]]) for j in range(len(C))],
        "_cell long, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    (
        candidates.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
        )
        .withColumn("_cell", assign_cell(F.col("_cv")))
        .withColumn("_cn", _norm(F.col("_cv")))
        .write.mode("overwrite")
        .partitionBy("_cell")
        .parquet(f"{path}/postings")
    )


def ivf_query_index(
    queries: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 8,
) -> DataFrame:
    """Probe a persisted IVF index: per query the ``nprobe`` nearest cells
    are chosen against the (tiny) centroid table, and the postings scan is
    filtered to the union of probed cells — a partition-pruned read, so I/O
    scales with ``nprobe/nlist`` of the index, not its size. Same output
    schema as ``cosine_topk_bruteforce``."""
    spark = queries.sparkSession
    crows = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(crows), len(crows[0]["centroid"])))
    for r in crows:
        C[int(r["_cell"])] = r["centroid"]

    q_ids, Q = _collect_id_matrix(queries, id_col, vec_col)
    if len(q_ids) == 0:
        return spark.createDataFrame(
            [], schema="query_id long, rank long, neighbor_id long, cosine double"
        )
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Qn @ C.T), axis=1)[:, : min(nprobe, len(C))]
    probe_rows = [
        (int(qid), [int(c) for c in cells], [float(x) for x in vec])
        for qid, cells, vec in zip(q_ids, order, Q)
    ]
    probes = (
        spark.createDataFrame(
            probe_rows, schema="query_id long, _cells array<int>, _qv array<double>"
        )
        .select("query_id", F.explode("_cells").alias("_cell"), "_qv")
        .withColumn("_qn", _norm(F.col("_qv")))
    )
    probed_cells = sorted({int(c) for _, cells, _ in probe_rows for c in cells})
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("_cell").isin(probed_cells)  # partition filter -> pruned read
    )
    cos = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        postings.join(F.broadcast(probes), "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
    )
