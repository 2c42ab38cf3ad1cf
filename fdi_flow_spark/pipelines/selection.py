"""Data selection for LM pretraining — DSIR-style hashed n-gram importance
weighting (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling").

No reference twin — this belongs to the driver-mandated LLM-pipeline
extension surface (SURVEY §2.9), alongside the perplexity filter in
``pipelines/lm.py``. Where ``lm_perplexity`` scores fluency under one
corpus, DSIR scores *distribution match*: how much more likely a document's
hashed bag-of-n-grams is under a trusted TARGET corpus than under the RAW
pool it came from. Selection = keep the highest-ratio documents.

Design at 100 TB:

- Features are word unigrams + bigrams hashed into ``buckets`` slots with
  the md5-bridge hash shared with the DuckDB oracle — the model is two
  ``buckets``-row count tables, NEVER a vocabulary-sized structure, so the
  model side of every join is broadcastable by construction at any corpus
  size (DSIR's core trick).
- One gram scan of the target corpus (count aggregate) and two of the raw
  corpus (count aggregate + scoring join), all map-side combinable; totals
  derive from the count tables, never from another corpus scan.
- The scoring join is gram-stream x ``buckets`` rows: Catalyst broadcasts
  the model at any realistic ``buckets``; everything is JVM expressions,
  no Python in the row path.
- Selection (``dsir_select``) is a global top-n on the scored table —
  TakeOrdered, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism
from fdi_flow_spark.pipelines.curation import _hash_bucket


def gram_exprs(text_col: str):
    """The ONE definition of the unigram+bigram feature map shared by
    DSIR, the NB quality classifier, and the composed ingest stage
    (whose composed-vs-standalone score parity REQUIRES all three to
    tokenize identically — a drifted copy would break it silently).
    Returns ``(toks, grams)`` Column builders; the caller must alias the
    token array as ``_t`` before evaluating ``grams``."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    bigrams = F.expr(
        """
        transform(sequence(1, size(_t) - 1),
                  i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))
        """
    )
    grams = F.when(F.size("_t") >= 2, F.concat(F.col("_t"), bigrams)).otherwise(
        F.col("_t")
    )
    return toks, grams


def _gram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-occurrence lowercase word unigrams + bigrams: ``(id, gram)``.
    Occurrence-weighted (not distinct) — DSIR's product over feature
    occurrences, like the LM bigram stream and unlike the dedup shingles."""
    docs = ensure_min_parallelism(docs, id_col)
    toks, grams = gram_exprs(text_col)
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") >= 1)
        .select("id", F.explode(grams).alias("gram"))
    )


def dsir_fit(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit the DSIR model OFFLINE: one ``buckets``-row table ``(b, logr)``
    over the FULL bucket domain (buckets unseen in either corpus carry the
    pure-Laplace ratio), so ``dsir_score`` can inner-join any document
    stream — including grams the raw pool never produced — without
    dropping rows. Bucket ``b`` gets Laplace-smoothed probabilities,
    ``p(b) = (count_b + 1) / (N + buckets)``, and
    ``logr = ln p_target(b) - ln p_raw(b)``."""
    # One gram scan per corpus, materialized: both count tables are
    # <= buckets rows, and without the checkpoints the totals legs below —
    # and the whole fit inside any fit+score plan — lazily re-derive the
    # corpus gram streams (the repeated-scan class test_plan_shape pins).
    # The two scans are independent jobs, so they run concurrently.
    from fdi_flow_spark.core.concurrency import build_concurrently

    def _bucket_counts(docs: DataFrame, out: str) -> DataFrame:
        return (
            _gram_stream(docs, id_col, text_col)
            .withColumn("b", _hash_bucket(F.col("gram"), seed, buckets))
            .groupBy("b")
            .agg(F.count("*").alias(out))
            .localCheckpoint()
        )

    raw_c, tgt_c = build_concurrently(
        lambda: _bucket_counts(raw_docs, "cr"),
        lambda: _bucket_counts(target_docs, "ct"),
    )
    raw_n = raw_c.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    tgt_n = tgt_c.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    domain = raw_docs.sparkSession.range(buckets).select(F.col("id").alias("b"))
    return (
        domain.join(raw_c, "b", "left")
        .join(tgt_c, "b", "left")
        .crossJoin(raw_n)
        .crossJoin(tgt_n)
        .select(
            "b",
            (
                F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                - F.log(F.col("nt") + buckets)
                - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1)
                + F.log(F.col("nr") + buckets)
            ).alias("logr"),
        )
    )


def dsir_score(
    docs: DataFrame,
    model: DataFrame,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score documents against a fitted DSIR model (``dsir_fit`` output —
    must share ``buckets``/``seed``): the sum over gram OCCURRENCES of the
    bucket log ratio. Output is total over docs with >= 1 token:
    ``(doc_id, n_grams, log_weight)``, ``log_weight`` rounded to 6 dp.

    The join is gram-stream x ``buckets`` rows; ``broadcast_model=True``
    forces the broadcast, otherwise Catalyst's size estimate decides.
    ``docs`` may be a STREAMING DataFrame — the model is static, so this
    is a stream-static join plus one per-doc aggregation (the production
    deployment shape; see tests/test_streaming.py)."""
    g = _gram_stream(docs, id_col, text_col).withColumn(
        "b", _hash_bucket(F.col("gram"), seed, buckets)
    )
    if broadcast_model:
        model = F.broadcast(model)
    return (
        g.join(model, "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.round(F.sum("logr"), 6).alias("log_weight"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "log_weight")
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document DSIR log importance weight of the raw pool itself:
    ``dsir_score(raw, dsir_fit(raw, target))``. See those for semantics."""
    model = dsir_fit(
        raw_docs,
        target_docs,
        buckets=buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
    )
    return dsir_score(
        raw_docs,
        model,
        buckets=buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
        broadcast_model=broadcast_model,
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n: int,
    buckets: int = 1024,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Deterministic DSIR selection: the ``n`` documents whose hashed
    n-gram distribution best matches the target corpus, ordered by
    ``(log_weight DESC, doc_id ASC)`` — a global top-n (TakeOrdered), never
    a full sort. (The paper resamples with Gumbel noise; the deterministic
    top-n variant keeps reruns and the oracle bit-identical.)"""
    w = dsir_weights(
        raw_docs,
        target_docs,
        buckets=buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
        broadcast_model=broadcast_model,
    )
    return w.orderBy(F.col("log_weight").desc(), F.col(id_col).asc()).limit(n)
