

def test_repetition_scores_hand_fixture(spark):
    from fdi_flow_spark.pipelines.text import repetition_scores

    rows = [
        (0, "spam spam spam spam spam"),        # one bigram repeated 4x
        (1, "all words here are different ok"),  # no duplicate bigrams
        (2, "ab cd ab cd ab cd"),                # 'ab cd' 3x, 'cd ab' 2x
        (3, "single"),                           # < 2 tokens -> zeros
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert got[0].n_bigrams == 4
    assert got[0].top_bigram_frac == 1.0 and got[0].dup_bigram_frac == 1.0
    assert got[1].dup_bigram_frac == 0.0 and got[1].top_bigram_frac == 0.2
    assert got[2].n_bigrams == 5
    assert got[2].top_bigram_frac == 0.6 and got[2].dup_bigram_frac == 1.0
    assert got[3].n_bigrams == 0
    assert got[3].top_bigram_frac == 0.0 and got[3].dup_bigram_frac == 0.0
