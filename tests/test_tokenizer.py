"""BPE tokenizer tests: hand-derivable golden merges, application
semantics, determinism across partitioning, and the histogram guard."""

import hashlib

import pytest

from fdi_flow_spark.pipelines.tokenizer import (
    EOW,
    _apply_merges,
    bpe_tokenize,
    bpe_train,
)


def test_bpe_train_golden_tiny_corpus(spark):
    # words: aa(x2), ab(x1). Round 1 pairs: (a,a)=2, (a,</w>)=2, (a,b)=1,
    # (b,</w>)=1 -> tie at 2 broken lexicographically: ('a','</w>') < ('a','a').
    # Round 2: ('a','a</w>')=2 wins. Round 3: best count 1 -> stop.
    docs = spark.createDataFrame([(1, "aa aa ab")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    assert merges == [("a", EOW), ("a", "a" + EOW)]


def test_bpe_apply_merges_golden():
    ranks = {("a", EOW): 0, ("a", "a" + EOW): 1}
    assert _apply_merges("aa", ranks) == ["aa" + EOW]
    assert _apply_merges("ab", ranks) == ["a", "b", EOW]
    assert _apply_merges("aaa", ranks) == ["a", "aa" + EOW]


def test_bpe_tokenize_matches_driver_application(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick"),
            (2, "the the the lazy dog"),
            (3, "quick brown quick brown"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=20)
    assert len(merges) > 0
    ranks = {m: i for i, m in enumerate(merges)}
    out = {r.doc_id: r for r in bpe_tokenize(docs, merges).collect()}
    for i, text in [(1, "the quick brown fox the quick"),
                    (2, "the the the lazy dog"),
                    (3, "quick brown quick brown")]:
        pieces = []
        for w in text.split():
            pieces.extend(_apply_merges(w, ranks))
        assert out[i].n_words == len(text.split())
        assert out[i].n_tokens == len(pieces)
        assert out[i].tokens_md5 == hashlib.md5(" ".join(pieces).encode()).hexdigest()
    # merges actually compress: repeated words end below character count
    assert out[2].n_tokens < sum(len(w) + 1 for w in "the the the lazy dog".split())


def test_bpe_train_deterministic_across_partitioning(spark):
    rows = [(i, f"alpha beta gamma w{i % 7} alpha beta") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = bpe_train(docs, n_merges=15)
    m2 = bpe_train(docs.repartition(11), n_merges=15)
    assert m1 == m2


def test_bpe_train_guard_and_pruning(spark):
    rows = [(i, " ".join(f"u{i}x{j}" for j in range(5))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_word_types"):
        bpe_train(docs, n_merges=5, max_word_types=10)
    # pruning the singleton tail empties the histogram -> zero merges
    assert bpe_train(docs, n_merges=5, min_word_freq=2) == []
