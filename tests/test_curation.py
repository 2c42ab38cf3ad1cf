"""Corpus-curation operators (pipelines/curation.py): deterministic splits,
quota sampling, PII redaction."""

import numpy as np
import pytest

from fdi_flow_spark.pipelines.curation import hash_split, pii_redact, quota_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc text {i}", f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hash_split_fractions_and_determinism(spark, docs):
    out1 = hash_split(docs, weights={"train": 0.8, "test": 0.2}, seed=42)
    counts = {r["split"]: r["count"] for r in out1.groupBy("split").count().collect()}
    assert set(counts) == {"train", "test"}
    # binomial(400, .2): 3.5 sigma window
    assert 52 <= counts["test"] <= 108, counts
    # same seed -> identical assignment even under different partitioning
    out2 = hash_split(docs.repartition(13), weights={"train": 0.8, "test": 0.2}, seed=42)
    a = {r.doc_id: r.split for r in out1.collect()}
    b = {r.doc_id: r.split for r in out2.collect()}
    assert a == b
    # different seed -> different assignment somewhere
    c = {r.doc_id: r.split for r in hash_split(docs, seed=7).collect()}
    assert a != c


def test_hash_split_three_way(spark, docs):
    out = hash_split(docs, weights={"train": 0.8, "val": 0.1, "test": 0.1}, seed=1)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 400


def test_quota_sample_caps_and_is_stable(spark, docs):
    out = quota_sample(docs, group_col="source", n_per_group=30, seed=42)
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert all(v == 30 for v in counts.values()), counts
    kept1 = sorted(r.doc_id for r in out.collect())
    kept2 = sorted(
        r.doc_id
        for r in quota_sample(docs.repartition(17), "source", 30, seed=42).collect()
    )
    assert kept1 == kept2
    # quota above group size keeps everything
    assert quota_sample(docs, "source", 1000).count() == 400


def test_pii_redact_crafted(spark):
    rows = [
        (1, "contact me at alice.smith+x@example.co.uk or bob@test.io today"),
        (2, "server at 10.0.0.1 and 192.168.255.3, call +491701234567 now"),
        (3, "clean text with no pii at all"),
        (4, "edge: a@b.cc plus +12345678 and 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (2, 0, 0)
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 2, 1)
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)
    assert got[3].clean_text == "clean text with no pii at all"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (1, 1, 1)
    assert got[1].clean_text == "contact me at [REDACTED] or [REDACTED] today"
    assert got[2].clean_text == "server at [REDACTED] and [REDACTED], call [REDACTED] now"
    assert got[4].n_redacted == 3
    assert "[REDACTED]" in got[4].clean_text and "@" not in got[4].clean_text


def test_pii_redact_matches_duckdb_semantics(spark):
    # the oracle runs the same patterns through RE2 — crafted strings must
    # agree between engines, not just on the synthetic corpus
    import duckdb

    rows = [
        (1, "mail x@y.zz then 8.8.8.8 and +4915112345678."),
        (2, "not-an-ip 999.999.999.999 still matches the shape on purpose"),
        (3, "a@b@c.dd double-at"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pii_redact(df).select("doc_id", "n_email", "n_ipv4", "n_phone", "clean_text")
    spark_rows = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    orows = sorted(
        tuple(r)
        for r in con.execute(
            r"""
        SELECT doc_id,
            LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
            LEN(REGEXP_EXTRACT_ALL(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')),
            LEN(REGEXP_EXTRACT_ALL(text, '\+\d{7,15}\b')),
            REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[REDACTED]', 'g'),
                '\+\d{7,15}\b', '[REDACTED]', 'g')
        FROM t
        """
        ).fetchall()
    )
    assert spark_rows == orows


def test_token_pack_invariants(spark):
    from fdi_flow_spark.pipelines.curation import token_pack

    rows = [(i, " ".join(["w"] * (5 + i % 17)), f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = token_pack(df, seq_len=32).collect()
    assert len(out) == 60
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r.pack_id, r.pack_offset))
        # reconstruct the concatenated stream: starts are a cumsum of sizes
        start = 0
        for r in rs:
            assert r.pack_id * 32 + r.pack_offset == start, (shard, r)
            assert 0 <= r.pack_offset < 32
            start += r.n_tokens
    # determinism under repartition
    again = token_pack(df.repartition(7), seq_len=32).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_token_pack_rejects_bad_seq_len(spark):
    from fdi_flow_spark.pipelines.curation import token_pack

    df = spark.createDataFrame([(1, "a b", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        token_pack(df, seq_len=0)


def test_decontaminate_drops_exact_and_near_overlaps(spark):
    """Docs sharing an 8-word window with the benchmark go; others stay.
    Hashed-gram join equals raw-gram semantics on a hand fixture."""
    from fdi_flow_spark.pipelines.curation import contamination_pairs, decontaminate

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    rows = [
        (0, base),                                     # benchmark member
        (1, base + " with extra trailing words"),      # shares 8-grams -> drop
        (2, "completely different text " + "x " * 20), # clean -> keep
        (3, "prefix words then " + base),              # shares 8-grams -> drop
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where("doc_id = 0")
    pairs = contamination_pairs(docs, bench, n=8)
    got = {(r.corpus_id, r.bench_id) for r in pairs.collect()}
    assert {(0, 0), (1, 0), (3, 0)} <= got and (2, 0) not in got
    survivors = {r.doc_id for r in decontaminate(docs, bench, n=8).collect()}
    assert survivors == {2}
    # min_hits raises the bar: no pair here shares 50 grams (the benchmark
    # doc itself only has 6 distinct 8-grams), so everything survives
    strict = decontaminate(docs, bench, n=8, min_hits=50)
    assert {r.doc_id for r in strict.collect()} == {0, 1, 2, 3}


# ----------------------------------------------------------- line_dedup (r5)


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from fdi_flow_spark.pipelines.curation import line_dedup

    boiler = "this line is everywhere in the corpus"
    rows = [
        (0, f"{boiler}\nunique zero\nshort\nunique zero two"),
        (1, f"unique one\n{boiler}"),
        (2, f"{boiler}\nunique two"),
        (3, "all original content here\nnothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=3, min_line_chars=10).collect()}
    assert len(out) == 4  # total: every doc has a row
    assert out[0]["n_removed"] == 1 and out[0]["n_lines"] == 4
    assert out[1]["n_removed"] == 1 and out[2]["n_removed"] == 1
    assert out[3]["n_removed"] == 0
    import hashlib

    # kept lines re-joined in original order ('short' survives: < 10 chars)
    assert out[0]["clean_md5"] == hashlib.md5(
        b"unique zero\nshort\nunique zero two"
    ).hexdigest()
    assert out[3]["clean_md5"] == hashlib.md5(
        b"all original content here\nnothing shared"
    ).hexdigest()


def test_line_dedup_doc_fully_boilerplate_yields_empty_md5(spark):
    from fdi_flow_spark.pipelines.curation import line_dedup

    b = "repeated boilerplate line content"
    rows = [(i, b) for i in range(3)] + [(9, f"real text content\n{b}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=3).collect()}
    import hashlib

    assert out[0]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert out[0]["n_removed"] == 1
    assert out[9]["n_removed"] == 1
    assert out[9]["clean_md5"] == hashlib.md5(b"real text content").hexdigest()


def test_line_dedup_doc_freq_is_distinct_docs(spark):
    from fdi_flow_spark.pipelines.curation import line_dedup

    # the same line 3x within ONE doc must not count as freq 3
    ln = "appears three times in one doc"
    df = spark.createDataFrame(
        [(0, f"{ln}\n{ln}\n{ln}"), (1, "other text entirely")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=3).collect()}
    assert out[0]["n_removed"] == 0


# ----------------------------------------------------------- source_mix (r5)


def test_source_mix_budget_and_quota_shape(spark):
    from fdi_flow_spark.pipelines.curation import source_mix

    # 3 sources with sizes 160/90/40: sqrt-temperature quotas, capped at size
    rows = [(i, f"t{i}", "a" if i < 160 else ("b" if i < 250 else "c")) for i in range(290)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_mix(df, budget=100, temperature=0.5, seed=42)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    import math

    wsum = math.sqrt(160) + math.sqrt(90) + math.sqrt(40)
    for src, n in [("a", 160), ("b", 90), ("c", 40)]:
        assert got[src] == min(n, round(100 * math.sqrt(n) / wsum)), (src, got)
    # deterministic under repartitioning
    out2 = source_mix(df.repartition(17), budget=100, temperature=0.5, seed=42)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_source_mix_quota_caps_at_source_size(spark):
    from fdi_flow_spark.pipelines.curation import source_mix

    # tiny source whose quota would exceed its size gets fully included
    rows = [(i, f"t{i}", "big" if i < 200 else "tiny") for i in range(205)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_mix(df, budget=200, temperature=0.5)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got["tiny"] == 5  # capped at n_source, not its raw quota


def test_domain_filter_semantics(spark):
    from fdi_flow_spark.pipelines.curation import domain_filter

    docs = spark.createDataFrame(
        [
            (1, "clean doc no urls at all"),
            (2, "see https://spam.example.com/offer?x=1 today"),
            (3, "both http://ok.example.org/a and https://spam.example.com/b"),
            (4, "benign https://docs.example.org/guide only"),
            (5, "case HTTPS://SPAM.EXAMPLE.COM/UP matches lowercased"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in domain_filter(docs, ["spam.example.com"]).collect()}
    assert (out[1].n_urls, out[1].n_blocked, out[1].keep) == (0, 0, True)
    assert (out[2].n_urls, out[2].n_blocked, out[2].keep) == (1, 1, False)
    assert (out[3].n_urls, out[3].n_blocked, out[3].keep) == (2, 1, False)
    assert (out[4].n_urls, out[4].n_blocked, out[4].keep) == (1, 0, True)
    assert out[5].keep is False  # lowercase match


def test_corpus_report_dup_rate_and_token_stats(spark):
    """Dataset-card aggregation (r11): dup_rate counts exact text
    duplicates within the (lang, source) group, token stats use the
    shared whitespace rule, and the median is exact."""
    from pyspark.sql import functions as F

    from fdi_flow_spark.pipelines.curation import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s1"),      # exact dup of doc 1
            (3, "d e f g", "en", "s1"),
            (4, "h  i", "en", "s2"),       # double space: 2 tokens
            (5, "x y z", "de", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["lang"], r["source"]): r for r in corpus_report(docs).collect()
    }
    en_s1 = got[("en", "s1")]
    assert en_s1["n_docs"] == 3 and en_s1["n_distinct_texts"] == 2
    assert en_s1["dup_rate"] == round(1 - 2 / 3, 6)
    assert en_s1["total_tokens"] == 10 and en_s1["max_tokens"] == 4
    assert en_s1["p50_tokens"] == 3.0
    assert got[("en", "s2")]["total_tokens"] == 2  # whitespace-run collapse
    assert got[("de", "s1")]["dup_rate"] == 0.0
