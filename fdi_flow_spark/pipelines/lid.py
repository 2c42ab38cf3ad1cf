"""Model-based language identification — hashed character-n-gram
multinomial Naive Bayes, the deterministic closed-form analog of the
fastText LID models (lid.176) every production corpus pipeline filters
with. Upgrades the marker-word heuristic in ``text.language_id`` (which
cannot survive contact with real multilingual data: a fixed marker list
scores zero on any language, register, or script it wasn't hand-built
for) to a model FIT FROM LABELED DATA.

No reference twin — driver-mandated LLM-pipeline extension surface
(SURVEY §2.9), same family as ``pipelines/quality_model.py`` (binary NB
quality filter) generalized to multi-class over character grams, the
feature space LID actually needs (word markers miss close languages and
unseen vocabulary; character 2-3-gram distributions separate languages
robustly — Cavnar & Trenkle 1994, and the n-gram feature set of fastText
LID, Joulin 2016).

Design at 100 TB (the quality_model contract, multi-class):

- ONE gram scan of the labeled corpus fits every class at once
  (``groupBy(lang, bucket)``) — adding languages adds no passes.
- The model is ``buckets x n_langs`` rows over the FULL bucket domain —
  broadcastable by construction at any corpus size (2048 x 4 = 8 KB-ish
  here; lid.176-scale is 10^6 x 176 rows, still a broadcast).
- Scoring joins the model PIVOTED to one row per bucket with a
  per-language weight column, so the gram stream is never multiplied by
  ``n_langs`` (176-fold at lid.176 scale), and the per-doc sums + priors
  + argmax land in ONE aggregation — a single stateful operator, so
  arriving documents score under Structured Streaming against an
  offline-fitted model (the fit/score split of DSIR and nb_quality;
  batch==stream parity in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism
from fdi_flow_spark.pipelines.curation import _hash_bucket

# Fixed substitution ciphers deriving deterministic synthetic languages
# from the shared ``documents`` table: same token structure, disjoint
# character-gram distributions — what distinguishes real languages at the
# feature level LID operates on. (rot13 / reversal / rot5 of a-z.)
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
CIPHERS = {
    "qa": "nopqrstuvwxyzabcdefghijklm",
    "qb": "zyxwvutsrqponmlkjihgfedcba",
    "qc": "fghijklmnopqrstuvwxyzabcde",
}
FIXTURE_LANGS = ["en", "qa", "qb", "qc"]


def multilingual_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a deterministic multilingual corpus over ``documents``:
    ``lang_true`` cycles en/qa/qb/qc by ``doc_id % 4`` and the text is the
    lowercase document text passed through that language's substitution
    cipher (en = identity). Pure projection — the DuckDB oracle re-derives
    it with ``TRANSLATE``."""
    docs = ensure_min_parallelism(docs, id_col)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in FIXTURE_LANGS]),
        (F.col(id_col) % 4 + 1).cast("int"),
    )
    low = F.lower(F.col(text_col))
    text = (
        F.when(F.col(id_col) % 4 == 1, F.translate(low, _ALPHA, CIPHERS["qa"]))
        .when(F.col(id_col) % 4 == 2, F.translate(low, _ALPHA, CIPHERS["qb"]))
        .when(F.col(id_col) % 4 == 3, F.translate(low, _ALPHA, CIPHERS["qc"]))
        .otherwise(low)
    )
    return docs.select(
        F.col(id_col), lang.alias("lang_true"), text.alias(text_col)
    )


def _char_gram_stream(
    docs: DataFrame, id_col: str, text_col: str, extra_cols: tuple = ()
) -> DataFrame:
    """Per-occurrence lowercase character 2- and 3-grams:
    ``(id, [extra...], gram)``. Whitespace participates in grams (standard
    for LID — word boundaries are a language signal). Pure JVM projection
    + explode; the ``when`` guards keep ``sequence`` monotone under short
    texts (Spark's sequence(1, 0) would DESCEND, not return empty)."""
    t = F.lower(F.col(text_col))
    grams2 = F.when(
        F.length(t) >= 2,
        F.transform(F.sequence(F.lit(1), F.length(t) - 1), lambda i: t.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))
    grams3 = F.when(
        F.length(t) >= 3,
        F.transform(F.sequence(F.lit(1), F.length(t) - 2), lambda i: t.substr(i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.explode(F.concat(grams2, grams3)).alias("gram"),
    )


def lid_fit(
    docs: DataFrame,
    label_col: str = "lang",
    buckets: int = 2048,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit the multi-class NB model from a labeled corpus. Returns ONE
    ``buckets * n_langs``-row table ``(b, lang, w, prior)`` over the FULL
    (bucket x language) domain:

    - ``w = ln((c_{lang,b} + 1) / (N_lang + B))`` — Laplace-smoothed
      multinomial log-likelihood per hashed char-gram bucket;
    - ``prior = ln((D_lang + 1) / (D + L))`` — smoothed class log-prior
      over document counts.

    NULL-labeled docs carry no supervision and are excluded. One gram
    scan fits every language (conditional on the groupBy key, not on
    per-class passes)."""
    docs = docs.where(F.col(label_col).isNotNull())
    gb = _char_gram_stream(docs, id_col, text_col, (label_col,)).select(
        F.col(label_col).alias("lang"),
        _hash_bucket(F.col("gram"), seed, buckets).alias("b"),
    )
    # ONE gram scan and ONE doc-level scan of the corpus, total (the
    # lm.py contract): the aggregates are materialized via localCheckpoint
    # — counts is <= buckets*langs rows, dp is n_langs rows — so the model
    # plan (and anything scoring against it) re-reads the tiny checkpointed
    # tables, never the corpus. Without this the lazy plan re-derived the
    # gram stream per downstream leg (7 corpus scans, measured).
    from fdi_flow_spark.core.concurrency import build_concurrently

    counts, dp = build_concurrently(
        lambda: (
            gb.groupBy("lang", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        ),
        lambda: (
            docs.groupBy(F.col(label_col).alias("lang"))
            .agg(F.count(F.lit(1)).alias("dl"))
            .localCheckpoint()
        ),
    )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("n"))
    # class-count totals derive from dp (n_langs rows) — identical values
    # to aggregating the corpus again, without the extra scan
    dt = dp.agg(F.sum("dl").alias("dd"), F.count(F.lit(1)).alias("ll"))
    domain = (
        docs.sparkSession.range(buckets)
        .select(F.col("id").alias("b"))
        .crossJoin(dp.select("lang"))
    )
    return (
        domain.join(counts, ["lang", "b"], "left")
        # LEFT join + coalesce: a labeled language whose docs yield zero
        # grams (all texts < 2 chars) has no totals row; an inner join
        # would silently drop its whole (b, lang) slice from the model —
        # breaking the full-domain contract and making it unpredictable.
        # With n = 0 its weights collapse to the pure-Laplace ln(1/B).
        .join(totals, "lang", "left")
        .join(dp, "lang")
        .crossJoin(dt)
        .select(
            "b",
            "lang",
            (
                F.log(F.coalesce(F.col("c"), F.lit(0)) + 1)
                - F.log(F.coalesce(F.col("n"), F.lit(0)) + buckets)
            ).alias("w"),
            (F.log(F.col("dl") + 1) - F.log(F.col("dd") + F.col("ll"))).alias(
                "prior"
            ),
        )
    )


def lid_predict(
    docs: DataFrame,
    model: DataFrame,
    buckets: int = 2048,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Predict the language of each document under a fitted model (must
    share ``buckets``/``seed``). Output ``(doc_id, pred_lang, n_grams)``;
    docs with zero grams (text shorter than 2 chars) are dropped — no
    feature evidence. Argmax ties break to the lexicographically greatest
    language (pinned, mirrored in the oracle; the marker heuristic's rule).

    Plan shape: the model PIVOTS to one row per bucket with a per-language
    weight column (the language set is read from the model — it is
    ``n_langs`` rows of metadata, known at fit time), so the gram-stream
    join never multiplies rows by ``n_langs`` (at lid.176 scale that is a
    176-fold saving on the aggregation input), and the per-doc sums, the
    prior addition (driver-side literals), and the argmax (``greatest``
    over (score, lang) structs — ties to the greatest lang) all land in
    ONE ``groupBy(doc)`` aggregation. One stateful operator total, so
    ``docs`` may be a STREAMING DataFrame: pivoted model stream-static
    join + a single aggregation (parity test in tests/test_streaming.py).
    ``broadcast_model=True`` opts into a broadcast hint (the pivot is
    ``buckets`` rows by construction); left off by default so AQE decides
    from measured size, as with nb_quality_score."""
    prow = sorted(
        (r["lang"], float(r["prior"]))
        for r in model.select("lang", "prior").distinct().collect()
    )
    langs = [lang for lang, _ in prow]
    priors = dict(prow)
    pivoted = model.groupBy("b").agg(
        *[
            F.first(F.when(F.col("lang") == lang, F.col("w")), ignorenulls=True).alias(
                f"_w{i}"
            )
            for i, lang in enumerate(langs)
        ]
    )
    g = _char_gram_stream(docs, id_col, text_col).select(
        "id", _hash_bucket(F.col("gram"), seed, buckets).alias("b")
    )
    m = F.broadcast(pivoted) if broadcast_model else pivoted
    scored = g.join(m, "b").groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        *[F.sum(f"_w{i}").alias(f"_s{i}") for i in range(len(langs))],
    )
    best = F.greatest(
        *[
            F.struct(
                (F.col(f"_s{i}") + F.lit(priors[lang])).alias("s"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.select(
        F.col("id").alias(id_col), best["lang"].alias("pred_lang"), "n_grams"
    )
