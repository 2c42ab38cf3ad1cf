"""Trainable document-quality classifier — hashed n-gram multinomial
Naive Bayes (the "NB log-odds" linear model of Wang & Manning 2012,
"Baselines and Bigrams"), the deterministic analog of the fastText
classifiers used for corpus quality filtering (DCLM, FineWeb-Edu).

No reference twin — driver-mandated LLM-pipeline extension surface
(SURVEY §2.9). Where DSIR (``pipelines/selection.py``) scores *unlabeled*
distribution match between two corpora, this fits a *supervised* classifier
from a labeled column and predicts keep/drop: the modern "model-based
quality filter" stage. fastText trains a shallow softmax over averaged
bucket embeddings by SGD; the NB log-odds model over the same hashed
unigram+bigram features is its closed-form, seed-free counterpart — exactly
computable in SQL, hence oracle-verifiable end to end, while remaining the
classic strong baseline for topical/variety text classification.

Design at 100 TB (the DSIR contract, improved to one pass):

- ONE gram scan of the labeled corpus fits both classes (conditional
  aggregation), vs two corpus scans for DSIR's two distributions.
- The model is ONE ``buckets``-row table ``(b, w, prior)`` over the full
  bucket domain — broadcastable by construction at any corpus size.
- Scoring is a gram-stream x model join + per-doc sum: stream-static
  joinable, so arriving documents can be scored by Structured Streaming
  against an offline-fitted model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism
from fdi_flow_spark.pipelines.curation import _hash_bucket


def _labeled_gram_stream(
    docs: DataFrame, id_col: str, text_col: str, label_col: str
) -> DataFrame:
    """Per-occurrence lowercase word unigrams + bigrams keeping the label:
    ``(id, label, gram)`` — the DSIR feature map (selection.py:37-56) with
    the supervision column carried through."""
    from fdi_flow_spark.pipelines.selection import gram_exprs

    docs = ensure_min_parallelism(docs, id_col)
    toks, grams = gram_exprs(text_col)
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("boolean").alias("label"),
            toks.alias("_t"),
        )
        .where(F.size("_t") >= 1)
        .select("id", "label", F.explode(grams).alias("gram"))
    )


def nb_quality_fit(
    docs: DataFrame,
    label_col: str,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit the NB log-odds model from a labeled corpus (``label_col`` true =
    positive/keep class). Returns ONE ``buckets``-row table
    ``(b, w, prior)`` over the FULL bucket domain:

    - ``w_b = ln((c1_b + 1)/(N1 + B)) - ln((c0_b + 1)/(N0 + B))`` —
      Laplace-smoothed multinomial log-likelihood ratio per hashed bucket
      (occurrence counts, like DSIR — a document's repeated grams count
      repeatedly);
    - ``prior = ln((D1 + 1)/(D0 + 1))`` — smoothed class log-prior over
      DOCUMENT counts, constant across rows (kept in the table so the model
      stays a single broadcastable relation).

    One corpus scan: both class count columns come from a conditional
    aggregation of the same gram stream. Documents with a NULL label carry
    no supervision and are EXCLUDED from the fit (standard semantics and
    the oracle's FILTER behavior) — they would otherwise silently count as
    negatives.
    """
    docs = docs.where(F.col(label_col).isNotNull())
    g = _labeled_gram_stream(docs, id_col, text_col, label_col).withColumn(
        "b", _hash_bucket(F.col("gram"), seed, buckets)
    )
    # ONE gram scan + ONE doc-level scan, materialized (the lm.py/lid.py
    # contract, now audited in test_plan_shape): counts is <= buckets rows
    # and dprior is 1 row, but without the checkpoints every downstream
    # leg — totals here, and the WHOLE fit inside any fit+score plan like
    # curation_scored — lazily re-derives the corpus gram stream
    # (curation_scored measured 10 documents scans before this).
    from fdi_flow_spark.core.concurrency import build_concurrently

    counts, dprior = build_concurrently(
        lambda: (
            g.groupBy("b")
            .agg(
                F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("c1"),
                F.sum(F.when(F.col("label"), 0).otherwise(1)).alias("c0"),
            )
            .localCheckpoint()
        ),
        lambda: (
            docs.agg(
                F.sum(
                    F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)
                ).alias("d1"),
                F.sum(
                    F.when(F.col(label_col).cast("boolean"), 0).otherwise(1)
                ).alias("d0"),
            ).localCheckpoint()
        ),
    )
    totals = counts.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
    )
    domain = docs.sparkSession.range(buckets).select(F.col("id").alias("b"))
    return (
        domain.join(counts, "b", "left")
        .crossJoin(totals)
        .crossJoin(dprior)
        .select(
            "b",
            (
                F.log(F.coalesce(F.col("c1"), F.lit(0)) + 1)
                - F.log(F.col("n1") + buckets)
                - F.log(F.coalesce(F.col("c0"), F.lit(0)) + 1)
                + F.log(F.col("n0") + buckets)
            ).alias("w"),
            (F.log(F.col("d1") + 1) - F.log(F.col("d0") + 1)).alias("prior"),
        )
    )


def nb_quality_score(
    docs: DataFrame,
    model: DataFrame,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score documents under a fitted NB model (must share
    ``buckets``/``seed``): ``score = prior + sum over gram occurrences of
    w_bucket``; ``pred = score > 0`` (keep). Docs with zero tokens are
    dropped (no feature evidence — the DSIR contract). Output:
    ``(doc_id, n_grams, score, pred)``, score rounded to 6 dp.

    ``docs`` may be a STREAMING DataFrame — the model is static, so this is
    a stream-static join plus one per-doc aggregation.
    """
    # A dummy constant-true label lets us reuse the labeled stream builder.
    g = _labeled_gram_stream(
        docs.withColumn("_one", F.lit(True)), id_col, text_col, "_one"
    ).withColumn("b", _hash_bucket(F.col("gram"), seed, buckets))
    if broadcast_model:
        model = F.broadcast(model)
    scored = (
        g.join(model, "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            (F.sum("w") + F.first("prior")).alias("_s"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_grams",
        F.round(F.col("_s"), 6).alias("score"),
        (F.col("_s") > 0).alias("pred"),
    )


def nb_quality_classify(
    docs: DataFrame,
    label_col: str,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Fit on the labeled corpus and score the same corpus (the train-set
    diagnostic / filtering shape): ``nb_quality_score(docs,
    nb_quality_fit(docs, ...))``."""
    model = nb_quality_fit(
        docs, label_col, buckets=buckets, seed=seed, id_col=id_col, text_col=text_col
    )
    return nb_quality_score(
        docs,
        model,
        buckets=buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
        broadcast_model=broadcast_model,
    )
