"""NB log-odds quality classifier tests: exact NumPy-twin parity on a tiny
corpus, perfect separation on a planted two-style corpus, and a real
accuracy floor on the sf0.001 language labels."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fdi_flow_spark.pipelines.quality_model import (
    nb_quality_classify,
    nb_quality_fit,
    nb_quality_score,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string, label boolean")


def naive_nb(rows, buckets, seed, hash_bucket):
    """Multinomial NB log-odds re-derived with plain Python dicts."""
    c1, c0 = {}, {}
    d1 = d0 = 0
    docs_grams = {}
    for doc_id, text, label in rows:
        toks = [t for t in text.lower().split() if t]
        grams = list(toks)
        if len(toks) >= 2:
            grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        docs_grams[doc_id] = grams
        if label:
            d1 += 1
        else:
            d0 += 1
        tgt = c1 if label else c0
        for g in grams:
            b = hash_bucket(g)
            tgt[b] = tgt.get(b, 0) + 1
    n1, n0 = sum(c1.values()), sum(c0.values())
    prior = math.log(d1 + 1) - math.log(d0 + 1)
    scores = {}
    for doc_id, grams in docs_grams.items():
        if not grams:
            continue
        s = prior
        for g in grams:
            b = hash_bucket(g)
            s += (
                math.log(c1.get(b, 0) + 1)
                - math.log(n1 + buckets)
                - math.log(c0.get(b, 0) + 1)
                + math.log(n0 + buckets)
            )
        scores[doc_id] = s
    return scores


def md5_bucket(seed, buckets):
    import hashlib

    def h(gram):
        hx = hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()[:8]
        return int(hx, 16) % buckets

    return h


def test_matches_naive_nb_exactly(spark):
    rows = [
        (1, "good clean prose with many words", True),
        (2, "solid factual writing with words", True),
        (3, "buy now click here spam spam", False),
        (4, "click buy spam now", False),
        (5, "good words but click spam", True),
    ]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in nb_quality_classify(df, "label", buckets=64, seed=7).collect()
    }
    ref = naive_nb(rows, 64, 7, md5_bucket(7, 64))
    assert set(out) == set(ref)
    for doc_id, s in ref.items():
        assert abs(out[doc_id][0] - s) < 1e-6
        assert out[doc_id][1] == (s > 0)


def test_separates_planted_styles(spark):
    good = [(i, "measured insightful analysis of turbine vibration data", True) for i in range(20)]
    bad = [(100 + i, "FREE FREE click click win win prize prize", False) for i in range(20)]
    df = _docs(spark, good + bad)
    out = nb_quality_classify(df, "label").toPandas()
    acc = (out["pred"] == (out["doc_id"] < 100)).mean()
    assert acc == 1.0


def test_fit_score_split_and_zero_token_drop(spark):
    train = _docs(spark, [(1, "alpha beta gamma", True), (2, "delta epsilon zeta", False)])
    model = nb_quality_fit(train, "label", buckets=32, seed=3)
    assert model.count() == 32  # full bucket domain
    test = _docs(spark, [(10, "alpha beta", None), (11, "   ", None)])
    scored = nb_quality_score(test, model, buckets=32, seed=3)
    rows = scored.collect()
    assert [r["doc_id"] for r in rows] == [10]  # zero-token doc dropped
    assert rows[0]["pred"]  # alpha/beta grams are positive-class evidence


def test_language_label_accuracy_floor(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "is_en", F.col("lang") == "en"
    )
    out = nb_quality_classify(docs, "is_en").join(
        docs.select("doc_id", "is_en"), "doc_id"
    )
    acc = out.agg(
        F.avg((F.col("pred") == F.col("is_en")).cast("double"))
    ).collect()[0][0]
    # Train-set accuracy on a genuinely separable signal (English vs other
    # languages). The sf0.001 corpus is tiny and the generator mixes
    # cross-language vocabulary, so hashed-bucket collisions cap this well
    # below 1.0 (measured 0.852); the floor guards against regressions to
    # majority-class behavior (0.56 here).
    assert acc >= 0.8


def test_null_labels_excluded_from_fit(spark):
    """Docs with a NULL label must not be counted as negatives — the model
    fitted with and without the unlabeled docs is identical."""
    labeled = [(1, "alpha beta gamma delta", True), (2, "spam click buy now", False)]
    df_clean = _docs(spark, labeled)
    df_noisy = _docs(spark, labeled + [(3, "mystery unlabeled words here", None)])
    m1 = {r["b"]: (r["w"], r["prior"]) for r in nb_quality_fit(df_clean, "label", buckets=64).collect()}
    m2 = {r["b"]: (r["w"], r["prior"]) for r in nb_quality_fit(df_noisy, "label", buckets=64).collect()}
    assert m1 == m2
