"""N-gram language-model quality scoring — CCNet-style perplexity filtering
for pretraining corpora.

No reference twin — this belongs to the driver-mandated LLM-pipeline
extension surface (SURVEY §2.9), alongside dedup/text/curation. The
canonical use (CCNet, Gopher, LLaMA data recipes) is: train a cheap n-gram
LM on a trusted corpus, score every candidate document's perplexity under
it, and keep the low-perplexity (fluent) tail.

Design at 100 TB:

- The model is two aggregate tables (bigram counts, context counts) — the
  bigram stream is scanned ONCE for counts (``groupBy(w1, w2)``,
  map-side combinable); context counts and the vocabulary size derive from
  the much smaller count table, never from a second corpus scan.
- Scoring re-derives the bigram stream and joins it against the counts.
  With no hint, Catalyst's size estimates pick broadcast joins at bench
  scale and degrade to shuffle joins once the count tables outgrow
  ``autoBroadcastJoinThreshold`` (a web-scale vocabulary's count table can
  be too big to broadcast); ``broadcast_model=True`` forces the broadcast
  regardless. Both regimes are plan-shape-tested.
- Everything is JVM expressions + joins — no Python in the row path, and
  the whole pipeline is one Catalyst plan (lazy), so filter/column pruning
  reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism

BOS = "<s>"


def _bigrams(
    docs: DataFrame, id_col: str, text_col: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-position (not distinct) lowercase word bigrams with a BOS marker:
    ``(id, *carry_cols, w1, w2)`` — one row per adjacent token pair, so
    counts weight by frequency like a real LM, unlike the dedup shingle
    kernel. ``carry_cols`` ride along unchanged (doc-level attributes like
    ``lang`` that the scoring aggregation must keep WITHOUT a
    post-aggregation rejoin — which on a stream would be an unsupported
    stream-stream join)."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    pairs = F.expr(
        f"""
        transform(sequence(1, size(_t) - 1),
                  i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))
        """
    )
    carry = [F.col(c) for c in carry_cols]
    return (
        docs.select(
            F.col(id_col).alias("id"), *carry, F.concat(F.array(F.lit(BOS)), toks).alias("_t")
        )
        .where(F.size("_t") >= 2)  # at least one real token
        .select("id", *carry_cols, F.explode(pairs).alias("_p"))
        .select("id", *carry_cols, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def fit_bigram_counts(
    model_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fit the bigram count table OFFLINE — the ``(w1, w2, c12)`` artifact
    every add-one consumer derives from (:func:`lm_perplexity` context
    counts, vocabulary, scoring join). This is the KenLM-deployment shape:
    the persisted LM artifact is the count table, not the reference
    corpus, so one fit serves cutoff fitting AND every later scoring
    stage (pass it via their ``model_counts`` parameters; the composed
    ingest's registry query shares one checkpointed table between
    ``perplexity_cutoffs`` and ``curation_deploy_score`` instead of
    re-scanning the corpus per consumer)."""
    return (
        _bigrams(model_docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )


def lm_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
    carry_cols: tuple[str, ...] = (),
    model_counts: DataFrame | None = None,
) -> DataFrame:
    """Score each document's perplexity under an add-one-smoothed bigram LM
    trained on ``model_docs`` (default: the same corpus — self-scoring, the
    in-distribution baseline CCNet uses before importing a clean LM).

    Per bigram: ``log P(w2|w1) = ln(c(w1,w2) + 1) - ln(c(w1) + V)`` with
    ``V`` = distinct successor vocabulary of the model. Unseen bigrams
    back off to the +1 numerator; unseen contexts to the ``V``-only
    denominator. Output: ``(doc_id, *carry_cols, n_bigrams, avg_logp,
    ppl)`` with ``ppl = exp(-avg_logp)``; documents with zero tokens are
    not scorable and are absent from the result (documented).
    ``carry_cols`` are doc-level attributes (e.g. ``lang``) kept through
    the scoring aggregation as extra group keys — functionally dependent
    on the doc id, so the grouping is unchanged, and on a stream this
    avoids the unsupported aggregate-then-rejoin shape. ``model_counts``
    (a :func:`fit_bigram_counts` table) skips the in-flight fit entirely
    — the offline-artifact deployment shape.
    """
    big = _bigrams(docs, id_col, text_col, carry_cols)
    if model_counts is not None:
        c12 = model_counts.select("w1", "w2", F.col("c12").alias("_c12"))
    else:
        model_big = (
            big if model_docs is None else _bigrams(model_docs, id_col, text_col)
        )
        # one scan of the model's bigram stream; everything else derives
        # from it. Materialize the pair-count table ONCE (vocab-type-
        # bounded, << corpus): its three consumers (c1, vocab, the scoring
        # join) plan canonically different subtrees, so without the cut
        # each re-runs the corpus scan + explode (measured 4 parquet scans
        # of documents in the executed plan).
        c12 = model_big.groupBy("w1", "w2").agg(F.count("*").alias("_c12"))
        if not c12.isStreaming:  # checkpoint is illegal on a streaming plan
            c12 = c12.localCheckpoint(eager=False)
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = c12.agg(F.countDistinct("w2").alias("_v"))
    if broadcast_model:
        c12, c1 = F.broadcast(c12), F.broadcast(c1)

    scored = (
        big.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            *carry_cols,
            (
                F.log(F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(1))
                - F.log(F.coalesce(F.col("_c1"), F.lit(0)) + F.col("_v"))
            ).alias("_logp"),
        )
    )
    n = F.count("*")
    avg_logp = F.sum("_logp") / n
    return scored.groupBy(F.col("id").alias(id_col), *carry_cols).agg(
        n.cast("bigint").alias("n_bigrams"),
        F.round(avg_logp, 6).alias("avg_logp"),
        F.round(F.exp(-avg_logp), 4).alias("ppl"),
    )


def kn_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    broadcast_model: bool = False,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995; the
    smoothing CCNet's KenLM models actually use) — the quality upgrade
    over :func:`lm_perplexity`'s add-one baseline: contexts reserve
    ``discount`` mass per seen successor type, and backoff weight goes to
    the CONTINUATION unigram (in how many contexts does ``w`` appear),
    not the raw frequency.

    Per bigram ``(v, w)`` with ``D = discount``::

        Pcont(w)  = (N1+(.,w) + 1) / (N1+(.,.) + V + 1)   # +1: OOV floor
        P(w|v)    = max(c(v,w) - D, 0)/c(v)
                    + D * N1+(v,.)/c(v) * Pcont(w)         # seen context
        P(w|v)    = Pcont(w)                               # unseen context

    Same scale shape as the baseline: ONE scan of the model's bigram
    stream to the pair-count table; every other statistic (context
    totals, distinct-successor/-predecessor counts, pair/vocab sizes)
    derives from that table, never from a second corpus scan. Output:
    ``(doc_id, n_bigrams, avg_logp, ppl)``, zero-token documents absent.
    """
    if not (0.0 < discount < 1.0):
        raise ValueError("discount must be in (0, 1)")
    big = _bigrams(docs, id_col, text_col)
    model_big = big if model_docs is None else _bigrams(model_docs, id_col, text_col)

    c12 = model_big.groupBy("w1", "w2").agg(F.count("*").alias("_c12"))
    if not c12.isStreaming:  # one corpus scan; see lm_perplexity
        c12 = c12.localCheckpoint(eager=False)
    # all derived from the pair table (rows are distinct (v, w) pairs):
    c1 = c12.groupBy("w1").agg(
        F.sum("_c12").alias("_c1"), F.count("*").alias("_n1f")
    )
    n1b = c12.groupBy("w2").agg(F.count("*").alias("_n1b"))
    consts = c12.agg(
        F.count("*").alias("_npairs"), F.countDistinct("w2").alias("_v")
    )
    if broadcast_model:
        c12, c1, n1b = F.broadcast(c12), F.broadcast(c1), F.broadcast(n1b)

    D = F.lit(float(discount))
    pcont = (F.coalesce(F.col("_n1b"), F.lit(0)) + F.lit(1)) / (
        F.col("_npairs") + F.col("_v") + F.lit(1)
    )
    seen_ctx = F.col("_c1").isNotNull()
    p_seen = (
        F.greatest(F.coalesce(F.col("_c12"), F.lit(0)) - D, F.lit(0.0)) / F.col("_c1")
        + D * F.col("_n1f") / F.col("_c1") * pcont
    )
    logp = F.log(F.when(seen_ctx, p_seen).otherwise(pcont))
    scored = (
        big.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(n1b, ["w2"], "left")
        .crossJoin(F.broadcast(consts))
        .select("id", logp.alias("_logp"))
    )
    n = F.count("*")
    avg_logp = F.sum("_logp") / n
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        n.cast("bigint").alias("n_bigrams"),
        F.round(avg_logp, 6).alias("avg_logp"),
        F.round(F.exp(-avg_logp), 4).alias("ppl"),
    )


def kn3_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    broadcast_model: bool = False,
) -> DataFrame:
    """Order-3 interpolated Kneser-Ney perplexity — the full backoff chain
    a real CCNet/KenLM filter runs (theirs is order 5; the chain shape is
    identical at every order):

    - trigram level uses RAW counts: ``P3(w|u,v) = max(c(uvw)-D,0)/c(uv)
      + D*N1+(uv,.)/c(uv) * P2(w|v)``; an unseen ``(u,v)`` context backs
      off to ``P2`` entirely.
    - bigram level uses CONTINUATION counts (in how many left-contexts
      does ``(v,w)`` appear): ``P2(w|v) = max(N1+(.vw)-D,0)/N1+(.v.)
      + D*N1f2(v)/N1+(.v.) * P1(w)``; unseen ``v`` backs off to ``P1``.
    - unigram level is the continuation unigram over distinct ``(v,w)``
      types with the same +1 OOV floor as :func:`kn_perplexity`.

    Tokens are prefixed with TWO BOS markers so every real token is
    predicted from a full-width context (n_trigrams == n_tokens). ONE
    scan of the model's trigram stream builds ``c123``; every other
    table (context totals, distinct-successor counts, both continuation
    levels) derives from ``c123`` — never a second corpus scan. Output:
    ``(doc_id, n_trigrams, avg_logp, ppl)``, zero-token docs absent.
    """
    if not (0.0 < discount < 1.0):
        raise ValueError("discount must be in (0, 1)")

    def trigrams(d: DataFrame) -> DataFrame:
        d = ensure_min_parallelism(d, id_col)
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
        )
        trips = F.expr(
            """
            transform(sequence(1, size(_t) - 2),
                      i -> struct(element_at(_t, i) AS w1,
                                  element_at(_t, i + 1) AS w2,
                                  element_at(_t, i + 2) AS w3))
            """
        )
        return (
            d.select(
                F.col(id_col).alias("id"),
                F.concat(F.array(F.lit(BOS), F.lit(BOS)), toks).alias("_t"),
            )
            .where(F.size("_t") >= 3)  # at least one real token
            .select("id", F.explode(trips).alias("_g"))
            .select(
                "id",
                F.col("_g.w1").alias("w1"),
                F.col("_g.w2").alias("w2"),
                F.col("_g.w3").alias("w3"),
            )
        )

    tri = trigrams(docs)
    model_tri = tri if model_docs is None else trigrams(model_docs)

    # Materialize the trigram-count table ONCE (type-bounded, << corpus):
    # its five consumers plan canonically different subtrees, so without
    # the cut the executed plan held SEVEN parquet scans of the corpus —
    # the same re-derivation blowup the DuckDB oracle hits without
    # MATERIALIZED CTEs, and the ngram_jaccard shingle precedent.
    c123 = model_tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("_c123"))
    if not c123.isStreaming:
        c123 = c123.localCheckpoint(eager=False)
    # trigram context stats (rows of c123 are distinct (u,v,w) types)
    c12 = c123.groupBy("w1", "w2").agg(
        F.sum("_c123").alias("_c12"), F.count("*").alias("_n1f3")
    )
    # bigram continuation level: N1+(. v w) and its context aggregates
    cont2 = c123.groupBy("w2", "w3").agg(F.count("*").alias("_k2"))
    if not cont2.isStreaming:  # three consumers of the continuation-pair table
        cont2 = cont2.localCheckpoint(eager=False)
    c2ctx = cont2.groupBy("w2").agg(
        F.sum("_k2").alias("_k2ctx"), F.count("*").alias("_n1f2")
    )
    # unigram continuation level over distinct (v, w) types
    cont1 = cont2.groupBy("w3").agg(F.count("*").alias("_k1"))
    consts = cont2.agg(
        F.count("*").alias("_npairs"), F.countDistinct("w3").alias("_v")
    )
    if broadcast_model:
        c123, c12, cont2, c2ctx, cont1 = (
            F.broadcast(c123),
            F.broadcast(c12),
            F.broadcast(cont2),
            F.broadcast(c2ctx),
            F.broadcast(cont1),
        )

    D = F.lit(float(discount))
    p1 = (F.coalesce(F.col("_k1"), F.lit(0)) + F.lit(1)) / (
        F.col("_npairs") + F.col("_v") + F.lit(1)
    )
    p2_seen = (
        F.greatest(F.coalesce(F.col("_k2"), F.lit(0)) - D, F.lit(0.0))
        / F.col("_k2ctx")
        + D * F.col("_n1f2") / F.col("_k2ctx") * p1
    )
    p2 = F.when(F.col("_k2ctx").isNotNull(), p2_seen).otherwise(p1)
    p3_seen = (
        F.greatest(F.coalesce(F.col("_c123"), F.lit(0)) - D, F.lit(0.0))
        / F.col("_c12")
        + D * F.col("_n1f3") / F.col("_c12") * p2
    )
    logp = F.log(F.when(F.col("_c12").isNotNull(), p3_seen).otherwise(p2))

    scored = (
        tri.join(c123, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(cont2, ["w2", "w3"], "left")
        .join(c2ctx, ["w2"], "left")
        .join(cont1, ["w3"], "left")
        .crossJoin(F.broadcast(consts))
        .select("id", logp.alias("_logp"))
    )
    n = F.count("*")
    avg_logp = F.sum("_logp") / n
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        n.cast("bigint").alias("n_trigrams"),
        F.round(avg_logp, 6).alias("avg_logp"),
        F.round(F.exp(-avg_logp), 4).alias("ppl"),
    )


def perplexity_buckets(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    cutoffs: DataFrame | None = None,
    model_counts: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, §4.3 — the
    head/middle/tail split CCNet publishes its corpus in): score every
    document with the bigram LM (:func:`lm_perplexity`), then cut each
    LANGUAGE's perplexity distribution at the exact ``edges`` quantiles —
    ``ppl <= q(edges[0])`` -> ``head`` (most in-distribution),
    ``<= q(edges[1])`` -> ``middle``, else ``tail``. Ties at a cutoff fall
    to the better bucket (``<=``, pinned in the oracle). Unscorable docs
    (zero tokens) are absent, as in :func:`lm_perplexity`.

    Output: ``(doc_id, lang, n_bigrams, avg_logp, ppl, bucket)``. Buckets
    compare the ROUNDED ppl (4 dp, the scorer's output contract) so the
    cutoffs and labels are reproducible cross-engine.

    Scale: the scorer's count-table plan unchanged (``lang`` rides the
    scoring aggregation as an extra, functionally-dependent group key — no
    rejoin) + one exact per-language quantile aggregate whose result is a
    LANGUAGES-row table, broadcast to label. Exact quantiles over the
    per-doc score table cost one shuffle of scalar (lang, ppl) rows — at
    100 TB the score table is ~1e10 scalars, well inside a percentile agg;
    approx_percentile is the documented fallback if languages are few and
    docs are extreme.

    ``cutoffs`` (from :func:`perplexity_cutoffs`, columns
    ``(lang, lo, hi)``) switches to the DEPLOYMENT shape: cut points fit
    offline on a reference corpus, arriving docs — batch or a Structured
    Streaming source — scored against the static ``model_docs`` LM and
    labeled by the static broadcast cutoff table (stream parity pinned in
    ``tests/test_streaming.py``). Docs whose language has NO cutoffs row
    are kept (left join) and labeled ``unknown`` — never silently dropped.
    """
    scored = lm_perplexity(
        docs, model_docs, id_col, text_col,
        carry_cols=(lang_col,), model_counts=model_counts,
    )
    how = "inner"
    if cutoffs is not None:
        # Deployment shape: cutoffs fit OFFLINE (see
        # :func:`perplexity_cutoffs`), arriving docs — batch or STREAM —
        # are scored and labeled against the static broadcast table. LEFT
        # join (r10 ADVICE): an inner join would silently drop arriving
        # docs whose language has no cutoffs row — undocumented data loss
        # for languages that appear on the stream after the offline fit.
        # Such docs keep their score and get the sentinel bucket
        # ``unknown``; the caller decides whether to refit or route them.
        how = "left"
        cuts = cutoffs.select(
            F.col(lang_col), F.col("lo").alias("_lo"), F.col("hi").alias("_hi")
        )
    else:
        # Self-cut: materialize the per-doc score table ONCE — its two
        # consumers (the tertile aggregate and the labeling join) otherwise
        # each re-derive the full scoring plan: 4 corpus scans instead of 0
        # (pinned by the per-query scan-cap audit).
        if not scored.isStreaming:
            scored = scored.localCheckpoint(eager=False)
        cuts = scored.groupBy(lang_col).agg(
            F.percentile("ppl", edges[0]).alias("_lo"),
            F.percentile("ppl", edges[1]).alias("_hi"),
        )
    return scored.join(F.broadcast(cuts), lang_col, how).select(
        F.col(id_col),
        F.col(lang_col),
        "n_bigrams",
        "avg_logp",
        "ppl",
        F.when(F.col("_lo").isNull(), F.lit("unknown"))
        .when(F.col("ppl") <= F.col("_lo"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def perplexity_cutoffs(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    model_counts: DataFrame | None = None,
) -> DataFrame:
    """Fit the per-language perplexity cut points OFFLINE — the
    ``(lang, lo, hi)`` table :func:`perplexity_buckets` consumes via its
    ``cutoffs`` parameter (CCNet fits these once on a reference snapshot,
    then labels every later shard/stream against them). Same scorer, same
    exact quantiles as the self-cut path. ``model_counts`` (a
    :func:`fit_bigram_counts` table) shares one offline LM fit with every
    other consumer."""
    scored = lm_perplexity(
        docs, model_docs, id_col, text_col,
        carry_cols=(lang_col,), model_counts=model_counts,
    )
    return scored.groupBy(lang_col).agg(
        F.percentile("ppl", edges[0]).alias("lo"),
        F.percentile("ppl", edges[1]).alias("hi"),
    )
