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

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


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
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("_cos"))
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


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent random-hyperplane
    bucketings; a pair is scored only when it collides in at least one table.
    Exact cosine reranks the collided set. Same output schema as brute force.

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
    qb, cb = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qb.append(
            q.select("query_id", "_qv", "_qn", F.lit(t).alias("table"), lsh_bucket(F.col("_qv"), planes).alias("bucket"))
        )
        cb.append(
            c.select("neighbor_id", "_cv", "_cn", F.lit(t).alias("table"), lsh_bucket(F.col("_cv"), planes).alias("bucket"))
        )
    qall = qb[0]
    for x in qb[1:]:
        qall = qall.unionByName(x)
    call = cb[0]
    for x in cb[1:]:
        call = call.unionByName(x)
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


def knn_classify_exact(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    weights: str = "uniform",
) -> DataFrame:
    """Exact KNN classification (reference D1 semantics: minkowski p=2,
    majority vote; ``weights='distance'`` uses 1/d vote weights).

    Output ``(vec_id, pred_label)``. Vote ties break by (vote DESC, label ASC);
    distance ties rank by train id ASC — both pinned for determinism.
    """
    tr = train.select(
        F.col(id_col).alias("_tid"),
        _as_double(F.col(vec_col)).alias("_tv"),
        F.col(label_col).alias("_tl"),
    )
    te = test.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_sv"))
    d2 = F.aggregate(
        F.zip_with(F.col("_sv"), F.col("_tv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = tr.crossJoin(F.broadcast(te)).select(
        "vec_id", "_tid", "_tl", d2.alias("_d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_d2").asc(), F.col("_tid").asc())
    knn = pairs.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    if weights == "distance":
        vote = F.sum(F.lit(1.0) / F.sqrt(F.greatest(F.col("_d2"), F.lit(1e-12))))
    else:
        vote = F.count("*").cast("double")
    votes = knn.groupBy("vec_id", "_tl").agg(vote.alias("_vote"))
    vw = Window.partitionBy("vec_id").orderBy(F.col("_vote").desc(), F.col("_tl").asc())
    return (
        votes.withColumn("_vr", F.row_number().over(vw))
        .where(F.col("_vr") == 1)
        .select("vec_id", F.col("_tl").alias("pred_label"))
    )
