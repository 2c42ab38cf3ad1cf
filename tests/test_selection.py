"""DSIR importance-weighting tests: distribution-match ordering, selection
determinism, and broadcast-path equivalence."""

import pytest
from pyspark.sql import functions as F

from fdi_flow_spark.pipelines.selection import dsir_select, dsir_weights


@pytest.fixture(scope="module")
def pool(spark):
    # target-like docs speak vocabulary A, off-distribution docs vocab B
    a_words = "alpha beta gamma delta epsilon zeta eta theta"
    b_words = "zork quux blarg frotz gnusto rezrov plugh xyzzy"
    rows = []
    for i in range(10):  # the target slice itself (source='tgt')
        rows.append((i, a_words + f" alpha beta t{i}", "tgt"))
    for i in range(10, 20):  # raw docs matching the target distribution
        rows.append((i, a_words + f" gamma delta r{i}", "raw"))
    for i in range(20, 30):  # raw docs far from it
        rows.append((i, b_words + f" zork quux r{i}", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_weights_rank_target_like_docs_higher(pool):
    w = dsir_weights(pool, pool.where(F.col("source") == "tgt"))
    by_doc = {r.doc_id: r.log_weight for r in w.collect()}
    assert set(by_doc) == set(range(30))
    near = [by_doc[i] for i in range(10, 20)]
    far = [by_doc[i] for i in range(20, 30)]
    assert min(near) > max(far)  # every A-doc outscores every B-doc


def test_dsir_select_top_n_and_determinism(pool):
    tgt = pool.where(F.col("source") == "tgt")
    sel = dsir_select(pool, tgt, n=15)
    rows = sel.collect()
    assert len(rows) == 15
    # ordered by (log_weight desc, doc_id asc)
    keys = [(-r.log_weight, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # off-distribution docs never make the cut at n=15 (20 A-flavored docs)
    assert all(r.doc_id < 20 for r in rows)
    again = dsir_select(pool, tgt, n=15).collect()
    assert [r.doc_id for r in again] == [r.doc_id for r in rows]


def test_dsir_broadcast_model_same_values(pool):
    tgt = pool.where(F.col("source") == "tgt")
    a = {r.doc_id: r.log_weight for r in dsir_weights(pool, tgt).collect()}
    b = {
        r.doc_id: r.log_weight
        for r in dsir_weights(pool, tgt, broadcast_model=True).collect()
    }
    assert a == b


def test_dsir_weights_unseen_vocab_is_finite(spark):
    import math

    raw = spark.createDataFrame(
        [(1, "completely novel words nowhere in target")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(2, "target corpus text")], "doc_id long, text string")
    out = dsir_weights(raw, tgt).collect()
    assert len(out) == 1 and math.isfinite(out[0].log_weight)
