"""NB char-gram language ID (pipelines/lid.py): the model-based upgrade of
the marker heuristic. The floor test is the point — the fit-from-data model
must beat the hand-built marker list on languages the list wasn't built
for (here: planted cipher languages, the stand-in for real multilingual
contact)."""

from pyspark.sql import functions as F

from fdi_flow_spark.pipelines.lid import (
    FIXTURE_LANGS,
    lid_fit,
    lid_predict,
    multilingual_docs,
)
from fdi_flow_spark.pipelines.text import language_id
from fdi_flow_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _splits(spark):
    ml = multilingual_docs(load_table(spark, SF, "documents"))
    return ml.where(F.col("doc_id") % 5 != 0), ml.where(F.col("doc_id") % 5 == 0)


def _accuracy(pred, truth):
    j = pred.join(truth, "doc_id")
    return j.agg(
        F.avg((F.col("pred_lang") == F.col("lang_true")).cast("double"))
    ).first()[0]


def test_nb_lid_beats_marker_baseline(spark):
    train, test = _splits(spark)
    truth = test.select("doc_id", "lang_true")
    model = lid_fit(train, label_col="lang_true")
    nb_acc = _accuracy(lid_predict(test, model), truth)
    marker_acc = _accuracy(language_id(test), truth)
    assert nb_acc >= 0.95, nb_acc  # perfect on cipher langs in practice
    assert marker_acc <= 0.5, marker_acc  # marker list is blind off-list
    assert nb_acc > marker_acc + 0.4


def test_lid_model_is_broadcastable_by_construction(spark):
    train, _ = _splits(spark)
    model = lid_fit(train, label_col="lang_true", buckets=256)
    rows = model.collect()
    # full (bucket x lang) domain, regardless of corpus size
    assert len(rows) == 256 * len(FIXTURE_LANGS)
    langs = {r["lang"] for r in rows}
    assert langs == set(FIXTURE_LANGS)
    # priors: one value per lang, shared across buckets
    priors = {(r["lang"], round(r["prior"], 9)) for r in rows}
    assert len(priors) == len(FIXTURE_LANGS)


def test_lid_drops_featureless_docs_and_pins_ties(spark):
    train, _ = _splits(spark)
    model = lid_fit(train, label_col="lang_true")
    docs = train.sparkSession.createDataFrame(
        [(1, "x"), (2, ""), (3, "the cat sat on the mat")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lid_predict(docs, model).collect()}
    assert 1 not in out and 2 not in out  # < 2 chars: no grams, no row
    assert out[3]["pred_lang"] == "en"
    assert out[3]["n_grams"] == (len("the cat sat on the mat") - 1) + (
        len("the cat sat on the mat") - 2
    )


def test_lid_scoring_single_agg_no_lang_fanout(spark):
    """The scale contract: the model joins PIVOTED (one row per bucket,
    per-language weight columns), so the gram stream is never multiplied
    by n_langs, and the whole score+prior+argmax lands in ONE aggregation
    — a single hashpartitioning Exchange (the doc agg; the model side is
    a BroadcastExchange) and one stateful operator, which is what makes
    the same plan run on a stream."""
    import contextlib
    import io

    train, _ = _splits(spark)
    # materialize the model (its own build shuffles don't belong to the
    # score path) and score plain docs (no fixture repartition)
    model = lid_fit(train, label_col="lang_true").localCheckpoint()
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "dog ran far")], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lid_predict(docs, model, broadcast_model=True).explain("simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    # exactly two hash Exchanges: the model PIVOT (bounded by
    # buckets x n_langs rows — metadata-sized at any corpus) and the one
    # per-doc aggregation; the gram stream itself never shuffles before
    # the broadcast join and never fans out by n_langs
    assert plan.count("Exchange hashpartitioning") == 2, plan
