

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


# ---------------------------------------------------- unicode normalization


def test_normalize_text_nfc_and_cleanup(spark):
    import hashlib

    from fdi_flow_spark.pipelines.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "cafe\u0301 au lait"),  # decomposed -> composed (len shrinks)
            (2, "a\x07b\x00c"),  # control chars stripped
            (3, "  lots   of\t spaces  "),  # squash + trim (tab is C0)
            (4, "line1\nline2"),  # newline preserved
            (5, ""),  # empty stays empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalize_text(docs).collect()}
    exp = {
        1: "caf\u00e9 au lait",
        2: "abc",
        3: "lots of spaces",
        4: "line1\nline2",
        5: "",
    }
    for i, want in exp.items():
        assert out[i].clean_md5 == hashlib.md5(want.encode()).hexdigest(), i
        assert out[i].n_clean_chars == len(want)
    assert out[1].n_raw_chars == len("cafe\u0301 au lait")  # code points, pre-NFC


# ---------------------------------------------------- tf-idf / n-gram stats


def test_tfidf_semantics(spark):
    import math

    from fdi_flow_spark.pipelines.text import tfidf_vectors

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_vectors(docs, buckets=4096).collect()
    # no hash collisions expected at 3 words / 4096 buckets
    by_doc_bucket = {(r.doc_id, r.bucket): r for r in rows}
    buckets_of = {}
    for r in rows:
        buckets_of.setdefault(r.doc_id, set()).add(r.bucket)
    assert len(buckets_of[1]) == 2 and len(buckets_of[2]) == 2 and len(buckets_of[3]) == 1
    apple_b = (buckets_of[1] & buckets_of[2]).pop()
    banana_b = (buckets_of[1] & buckets_of[3]).pop()
    assert by_doc_bucket[(1, apple_b)].tf == 2
    assert by_doc_bucket[(3, banana_b)].tf == 3
    # smooth idf: ln((N+1)/(df+1)) + 1 with N=3
    idf_apple = math.log(4 / 3) + 1  # df=2
    assert abs(by_doc_bucket[(1, apple_b)].tfidf - round(2 * idf_apple, 6)) < 1e-9
    idf_banana = math.log(4 / 3) + 1  # df=2
    assert abs(by_doc_bucket[(3, banana_b)].tfidf - round(3 * idf_banana, 6)) < 1e-9


def test_tfidf_composed_equals_fit_then_score(spark):
    """The r12 one-scan composed path must remain EXACTLY
    tfidf_score(docs, tfidf_fit(docs)) — same rows, same schema, same
    rounded values (reverting the one-scan reuse or desyncing the two
    paths' hashing/rounding turns this red)."""
    from fdi_flow_spark.pipelines.text import tfidf_fit, tfidf_score, tfidf_vectors

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana kiwi"),
            (2, "apple cherry cherry durian fig"),
            (3, "banana banana banana fig"),
            (4, "kiwi durian apple banana cherry"),
        ],
        "doc_id long, text string",
    )
    composed = tfidf_vectors(docs, buckets=256)
    two_scan = tfidf_score(docs, tfidf_fit(docs, buckets=256), buckets=256)
    assert composed.columns == two_scan.columns
    got = sorted(tuple(r) for r in composed.collect())
    want = sorted(tuple(r) for r in two_scan.collect())
    assert got == want and len(got) > 0


def test_ngram_counts_order_and_df(spark):
    from fdi_flow_spark.pipelines.text import ngram_counts

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "z z"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_counts(docs, n=2, top=3).collect()
    assert [(r.gram, r["count"], r.doc_freq) for r in rows] == [
        ("a b", 3, 2),  # twice in doc 1, once in doc 2
        ("b a", 1, 1),
        ("b c", 1, 1),
    ]


# ---------------------------------------------------- gopher quality rules


def test_gopher_filter_rule_semantics(spark):
    from fdi_flow_spark.pipelines.text import gopher_filter

    good = (
        "the quick brown fox jumps over one lazy sleeping dog while birds "
        "sing and children play near the quiet river bank under warm skies"
    )
    docs = spark.createDataFrame(
        [
            (1, good),  # passes everything
            (2, "tiny doc"),  # word_count + stopwords
            (3, good + " # # # # # # # # # #"),  # symbol_ratio (+ alpha drift)
            (4, good + " " + "spam " * 40),  # repetition caps
            (5, "the " + "12345 67890 " * 20),  # alpha_words + mean length ok
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_filter(docs, min_words=10).collect()}
    assert out[1].keep and out[1].failed_rules == ""
    assert not out[2].keep
    assert "word_count" in out[2].failed_rules and "stopwords" in out[2].failed_rules
    assert "symbol_ratio" in out[3].failed_rules
    assert "top_bigram" in out[4].failed_rules and "dup_bigram" in out[4].failed_rules
    assert "alpha_words" in out[5].failed_rules
    # failed_rules is alphabetical and comma-joined
    for r in out.values():
        parts = r.failed_rules.split(",") if r.failed_rules else []
        assert parts == sorted(parts)


def test_readability_scores_pinned_conventions(spark):
    from fdi_flow_spark.pipelines.text import readability_scores

    rows = [
        (1, "The cat sat. The dog ran!"),          # 6 words, 2 sentences
        (2, "xyz"),                                # no vowels/sentences -> floors of 1
        (3, "Incomprehensibilities notwithstanding, readability estimation persists."),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in readability_scores(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # syllable groups: e|a|a|e|o|a  -> "The cat sat" = e,a,a; "The dog ran" = e,o,a
    assert r1["n_syllables"] == 6
    ease = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1["flesch_ease"] - ease) < 1e-9
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["n_sentences"] == 1 and r2["n_syllables"] == 1
    # long latinate words read much harder than the simple sentence
    assert out[3]["fk_grade"] > r1["fk_grade"] + 5


def test_chunk_documents_golden(spark):
    """Hand-computed chunking contract (r10): starts at 0, stride, ... while
    start < n_tokens; tail chunk shorter; overlap = window - stride; empty
    docs emit nothing; short docs emit one chunk."""
    from fdi_flow_spark.pipelines.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "x y"),             # shorter than window
            (3, "   "),             # empty after filter
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(docs, window=4, stride=3).collect()
    )
    assert got == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (1, 2, 6, 1, "g"),
        (2, 0, 0, 2, "x y"),
    ]
    # exact-multiple boundary: 6 tokens, stride 3 -> starts 0 and 3 only
    docs2 = spark.createDataFrame([(9, "t1 t2 t3 t4 t5 t6")], "doc_id long, text string")
    got2 = sorted(tuple(r) for r in chunk_documents(docs2, window=3, stride=3).collect())
    assert got2 == [(9, 0, 0, 3, "t1 t2 t3"), (9, 1, 3, 3, "t4 t5 t6")]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, window=0)


def test_split_sentences_golden(spark):
    """Hand-computed sentence contract (r10): non-empty runs between [.!?]+
    groups, whitespace-stripped, 0-indexed over NON-EMPTY sentences only;
    docs with no sentence emit nothing; trailing terminator adds no row."""
    from fdi_flow_spark.pipelines.text import split_sentences

    docs = spark.createDataFrame(
        [
            (1, "Hello world. How are you?!  Fine."),
            (2, "no terminator here"),
            (3, "..."),
            (4, "  leading ws. \t tab lead!"),
        ],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in split_sentences(docs).collect())
    assert got == [
        (1, 0, "Hello world", 2),
        (1, 1, "How are you", 3),
        (1, 2, "Fine", 1),
        (2, 0, "no terminator here", 3),
        (4, 0, "leading ws", 2),
        (4, 1, "tab lead", 2),
    ]


def test_ngram_novelty_golden(spark):
    """Hand-computed novelty (r10): distinct word 3-grams per doc, novelty =
    share with corpus doc-frequency 1. Docs shorter than n emit no row;
    repeated shingles inside ONE doc stay distinct-counted."""
    from fdi_flow_spark.pipelines.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            # doc 1: shingles {a b c, b c d} — "a b c" shared with doc 2
            (1, "a b c d"),
            # doc 2: "a b c a b c" -> distinct 3-grams {a b c, b c a, c a b}
            (2, "a b c a b c"),
            (3, "x y"),  # too short for n=3
            (4, "p q r"),  # unique shingle
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert 3 not in rows
    # doc 2 "a b c a b c": distinct 3-grams {a b c, b c a, c a b}
    assert rows[1]["n_shingles"] == 2 and rows[1]["novel_shingles"] == 1
    assert rows[1]["novelty"] == 0.5
    assert rows[2]["n_shingles"] == 3 and rows[2]["novel_shingles"] == 2
    assert rows[4]["n_shingles"] == 1 and rows[4]["novelty"] == 1.0


def test_splitters_and_novelty_match_python_reference_fuzz(spark):
    """Randomized cross-check (r10): chunking, sentence split, n-gram
    novelty, and directed containment all recomputed by plain-Python set
    logic over one generated corpus — catches systematic errors a shared
    Spark formulation could hide (the prefix-lossless test compares two
    Spark paths; this compares against an independent implementation)."""
    import re as _re

    import numpy as np

    from fdi_flow_spark.pipelines.dedup import containment_pairs
    from fdi_flow_spark.pipelines.text import (
        chunk_documents,
        ngram_novelty,
        split_sentences,
    )

    rng = np.random.default_rng(777)
    alphabet = list("ab cd efg \t.!?  hij k ")
    docs = []
    for i in range(120):
        ln = int(rng.integers(0, 80))
        docs.append((i, "".join(rng.choice(alphabet, size=ln))))
    # plant a subset clone for containment coverage
    docs.append((900, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
    docs.append((901, "w1 w2 w3 w4 w5"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def toks(t):
        return [x for x in _re.split(r"\s+", t) if x]

    # --- chunking (window 4, stride 3)
    expect = []
    for i, t in docs:
        tk = toks(t)
        for cid, s in enumerate(range(0, len(tk), 3)):
            expect.append((i, cid, s, min(4, len(tk) - s), " ".join(tk[s : s + 4])))
    got = sorted(tuple(r) for r in chunk_documents(df, window=4, stride=3).collect())
    assert got == sorted(expect)

    # --- sentences
    expect = []
    for i, t in docs:
        parts = [_re.sub(r"^\s+|\s+$", "", p) for p in _re.split(r"[.!?]+", t)]
        parts = [p for p in parts if p]
        expect.extend((i, sid, p, len(toks(p))) for sid, p in enumerate(parts))
    got = sorted(tuple(r) for r in split_sentences(df).collect())
    assert got == sorted(expect)

    # --- novelty (word 2-grams so short fuzz docs participate)
    grams = {
        i: {" ".join(tk[j : j + 2]) for j in range(len(tk) - 1)}
        for i, t in docs
        for tk in [toks(t)]
        if len(tk) >= 2
    }
    from collections import Counter

    dfreq = Counter(g for gs in grams.values() for g in gs)
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=2).collect()}
    assert set(got) == set(grams)
    for i, gs in grams.items():
        novel = sum(1 for g in gs if dfreq[g] == 1)
        assert got[i]["n_shingles"] == len(gs)
        assert got[i]["novel_shingles"] == novel
        assert got[i]["novelty"] == round(novel / len(gs), 6)

    # --- directed containment (word 2-grams, t=0.5)
    expect_pairs = {}
    for a, ga in grams.items():
        for b, gb in grams.items():
            if a != b:
                c = len(ga & gb) / len(ga)
                if c >= 0.5:
                    expect_pairs[(a, b)] = round(c, 6)
    got_pairs = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, unit="word", n=2, threshold=0.5).collect()
    }
    assert got_pairs == expect_pairs
    assert (901, 900) in got_pairs and got_pairs[(901, 900)] == 1.0
