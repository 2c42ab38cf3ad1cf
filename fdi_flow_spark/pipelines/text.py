"""Text analysis over a documents table ``(doc_id, text, ...)`` — the
training-data-pipeline operators (driver mandate, SURVEY.md §2.9).

All four ops are pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen; no Python in the hot path), so they scan 100 TB of
parquet at I/O speed with full column pruning.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism

# Tiny per-language marker lists for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es": ("el", "la", "los", "de", "es", "una", "que", "por"),
}

PUNCT_CLASS = r"[.,!?;:'\"()\-]"


def _tokens(col):
    """Whitespace tokenization with empty tokens dropped (split + filter)."""
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (ceil(len/4) per token — the ~4-chars-per-token rule)."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.col(text_col))
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("bigint"),
    )
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        bpe.alias("n_bpe_est"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/embedding-prep splitter
    (r10, §2.9 extension; the complement of ``curation.token_pack``, which
    PACKS whole documents into fixed budgets, where this SPLITS one
    document into windows). Whitespace tokens; chunk starts at
    ``0, stride, 2*stride, ...`` while ``start < n_tokens``, so with
    ``stride < window`` every token is covered and consecutive chunks
    overlap by ``window - stride`` tokens (the standard retrieval-context
    overlap). The tail chunk may be shorter; empty documents emit no rows.

    Output: ``(doc_id, chunk_id, start_token, n_tokens, chunk_text)``.

    Scale: pure JVM projection — split + sequence + posexplode + slice +
    array_join inside whole-stage codegen, zero shuffle, zero Python; at
    100 TB this is a map over the corpus scan like ``token_counts``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")
    docs = ensure_min_parallelism(docs, id_col)
    base = docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    return (
        base.select(F.col(id_col), "_toks", F.posexplode(starts).alias("chunk_id", "_s"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("_s").cast("long").alias("start_token"),
            F.least(F.lit(window), F.size("_toks") - F.col("_s"))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(F.slice(F.col("_toks"), F.col("_s") + 1, window), " ").alias(
                "chunk_text"
            ),
        )
    )


def split_sentences(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Sentence segmentation (r10, §2.9 extension) — the unit splitter that
    feeds sentence-level dedup / quality / contamination stages. Sentences
    are the non-empty runs between ``[.!?]+`` terminator groups, with
    leading/trailing whitespace stripped; ``sent_id`` is the 0-based index
    over the non-empty sentences; documents with no sentence emit no rows.

    Output: ``(doc_id, sent_id, sentence, n_words)``.

    Scale: pure JVM projection (split + transform + filter + posexplode)
    inside whole-stage codegen — zero shuffle, zero Python; a map over the
    corpus scan like ``chunk_documents``. The terminator class is
    RE2-compatible so the DuckDB oracle applies the identical split.
    """
    docs = ensure_min_parallelism(docs, id_col)
    sents = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: F.length(s) > 0,
    )
    return (
        docs.select(F.col(id_col), sents.alias("_s"))
        .where(F.size("_s") > 0)
        .select(F.col(id_col), F.posexplode("_s").alias("sent_id", "sentence"))
        .select(
            F.col(id_col),
            F.col("sent_id").cast("long").alias("sent_id"),
            F.col("sentence"),
            F.size(_tokens(F.col("sentence"))).cast("long").alias("n_words"),
        )
    )


def ngram_novelty(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty (r10, §2.9 extension) — the diversity /
    memorization-risk signal data-curation pipelines rank on: the fraction
    of a document's DISTINCT word n-grams that appear in no other document
    (corpus document-frequency 1). Documents shorter than ``n`` tokens emit
    no row. Output: ``(doc_id, n_shingles, novel_shingles, novelty)`` with
    novelty rounded to 6 dp for cross-engine hash parity.

    Scale: ONE corpus scan — shingles shuffle once as 8-byte xxhash64 keys
    (same convention and collision budget as ``ngram_jaccard_pairs`` —
    novelty counts are hash-independent modulo ~1e-11 collisions) into a
    doc-frequency window count, then a map-side-combinable per-doc
    aggregate. The window formulation replaces the groupBy+self-join shape,
    which re-derived the shingle stream from a SECOND corpus scan (pinned
    by the per-query scan-cap audit in ``tests/test_plan_shape.py``); no
    document text ever crosses an exchange.
    """
    from pyspark.sql import Window

    from fdi_flow_spark.pipelines.dedup import _word_ngrams

    sh = _word_ngrams(docs, id_col, text_col, n).select(
        "id", F.xxhash64("shingle").alias("shingle")
    )
    return (
        sh.withColumn("_df", F.count("*").over(Window.partitionBy("shingle")))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("_df") == 1).cast("bigint")).alias("novel_shingles"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "novel_shingles",
            F.round(F.col("novel_shingles") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality scoring: length/stopword/punctuation features + a composite
    score in [0,1]. Formula is engine-defined (the reference has no text ops);
    it is deterministic and SQL-expressible for the oracle.
    """
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,!?;:'\"()\-]", ""))
    avg_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), stop_ratio * 2))
        + F.lit(0.3) * F.least(F.lit(1.0), avg_tok / F.lit(8.0))
    )
    return docs.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language identification heuristic: CJK character share decides ``zh``;
    otherwise the language whose marker-token count wins. Ties resolve to the
    lexicographically greatest language (pinned, mirrored in the oracle);
    docs with zero marker hits fall to that same rule over all languages
    ('fr' with the builtin marker set).

    Shape: one NARROW pass — per token a single hash probe into the literal
    marker map (word -> langs array; shared markers like 'la'/'que' count for
    every language listing them), then per-language counts over the tiny hit
    array. No shuffle at all: for a constant-size dictionary this scales
    strictly better than an explode + join + re-aggregate formulation (which
    pays two shuffles of the token stream); a corpus-scale dictionary is the
    point where a broadcast-join against a (lang, marker) table wins instead.
    """
    docs = ensure_min_parallelism(docs, id_col)
    # word -> ARRAY of languages: duplicates must count for each lister.
    by_word: dict[str, list[str]] = {}
    for lang in sorted(LANG_MARKERS):
        for w in LANG_MARKERS[lang]:
            by_word.setdefault(w, []).append(lang)
    marker_map = F.create_map(
        *[
            lit
            for w, langs in sorted(by_word.items())
            for lit in (F.lit(w), F.array(*[F.lit(x) for x in langs]))
        ]
    )
    toks = _tokens(F.lower(F.col(text_col)))
    hits_arr = F.flatten(
        F.transform(toks, lambda t: F.coalesce(marker_map[t], F.array()))
    )
    with_hits = docs.select(F.col(id_col), F.col(text_col), hits_arr.alias("_hits"))
    scores = [
        F.struct(
            F.size(F.filter(F.col("_hits"), lambda x: x == F.lit(lang))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    # max over (score, lang): larger score wins; on equal score the
    # lexicographically greatest lang wins — pinned, mirrored in the oracle.
    best = F.greatest(*scores)
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    pred = F.when(cjk > 0, F.lit("zh")).otherwise(best["lang"])
    return with_hits.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best["score"].cast("bigint").alias("marker_hits"),
    )


def document_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    mod: int = 2**31 - 1,  # keeps acc*base+c < 2^40 — no long overflow under ANSI mode
    base: int = 257,
) -> DataFrame:
    """Winnowing fingerprint: polynomial rolling hash over character k-grams,
    then the min hash per window of ``window`` consecutive k-gram hashes
    (Schleimer/Wilkerson/Aiken winnowing). Output: distinct selected hashes
    per doc — the classic copy-detection fingerprint set.

    Execution: an Arrow-batched numpy kernel — the rolling hash is k
    vectorized int64 passes over the codepoint array and the window min is a
    stride-tricks sliding view, so per-doc cost is O(len·k) SIMD ops instead
    of O(len·k) interpreted higher-order-function steps (the pure-SQL
    ``transform(sequence(...), aggregate(...))`` formulation measured ~25x
    slower at sf0.1). All arithmetic stays in exact int64 (acc < 2^40), so
    results are bit-identical to the SQL/DuckDB formulation.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    docs = ensure_min_parallelism(docs, id_col)
    schema = StructType(
        [StructField(id_col, docs.schema[id_col].dataType), StructField("fingerprint", LongType())]
    )

    def fn(batches):
        for pdf in batches:
            ids_out, fps_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                codes = np.array([ord(c) for c in text], dtype=np.int64)
                n_grams = len(codes) - (k - 1)
                if n_grams < 1:
                    continue  # no k-gram at all: nothing to fingerprint
                acc = np.zeros(n_grams, dtype=np.int64)
                for j in range(k):
                    acc = (acc * base + codes[j : j + n_grams]) % mod
                if n_grams < window:
                    # short doc: the whole doc is one window (standard
                    # winnowing edge rule) — every doc with >=1 k-gram
                    # yields >=1 fingerprint instead of silently dropping
                    mins = np.array([acc.min()], dtype=np.int64)
                else:
                    mins = np.lib.stride_tricks.sliding_window_view(acc, window).min(axis=1)
                for fp in np.unique(mins):
                    ids_out.append(did)
                    fps_out.append(int(fp))
            yield pd.DataFrame({id_col: ids_out, "fingerprint": fps_out})

    return (
        docs.select(F.col(id_col), F.col(text_col))
        .mapInPandas(fn, schema)
        .distinct()
    )


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, public quality
    rules): per doc, the fraction of word-bigram instances covered by the
    single most frequent bigram (``top_bigram_frac``) and the fraction
    belonging to any bigram that occurs more than once
    (``dup_bigram_frac``). High values flag boilerplate/spam for corpus
    filtering. Pure JVM expressions — explode + two aggregates, no Python
    in the row path; docs with < 2 tokens score 0.0 on both.
    """
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(sequence(1, greatest(0, size(_tk) - 1)),"
        " i -> concat(element_at(_tk, i), ' ', element_at(_tk, i + 1)))"
    )
    exploded = (
        docs.select(F.col(id_col), toks.alias("_tk"))
        .where(F.size("_tk") >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("_bg"))
    )
    counts = exploded.groupBy(id_col, "_bg").agg(F.count("*").alias("_c"))
    scored = counts.groupBy(id_col).agg(
        F.sum("_c").alias("n_bigrams"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0))
            / F.sum("_c"),
            6,
        ).alias("dup_bigram_frac"),
    )
    # short docs (< 2 tokens) still get a row: 0 bigrams, 0.0 fractions
    base = docs.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce("dup_bigram_frac", F.lit(0.0)).alias("dup_bigram_frac"),
    )


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranking of documents against a literal term list (Robertson/
    Sparck Jones idf with the Lucene +1 floor) — the retrieval primitive a
    curation pipeline uses to mine domain-relevant documents.

    Score per doc: ``sum_t idf_t * tf_t * (k1+1) / (tf_t + k1*(1 - b +
    b*dl/avgdl))`` with ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``.

    Shape: for a literal query the term frequencies are pure projections
    (one array-filter per term — no explode, no inverted index, no
    shuffle of the token stream); N/avgdl/df are ONE tiny aggregate row
    broadcast back; the top-n is a distributed TakeOrdered, never a global
    sort. Ranks order by the ROUNDED score (ties by id) so the oracle's
    rank boundary agrees bit-for-bit. Output:
    ``(doc_id, doc_len, bm25, rank)``.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.lower(F.col(text_col)))

    def _tf(word: str):
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        lit = F.lit(word)
        return F.size(F.filter(toks, lambda t: t == lit))

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        *[_tf(w).alias(f"_tf{i}") for i, w in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5) + 1.0
        )
        tf = F.col(f"_tf{i}")
        denom = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        score = score + idf * tf * (k1 + 1.0) / denom
    ranked = j.select(
        F.col(id_col),
        F.col("_dl").cast("bigint").alias("doc_len"),
        F.round(score, 6).alias("bm25"),
    ).orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("bigint"))


_CTRL_RE = re.compile(r"[\x00-\x09\x0b-\x1f\x7f]")
_SPACE_RUN_RE = re.compile(r" +")


def _clean_str(t: str | None) -> str:
    """The normalize_text cleaning kernel on one string: NFC, strip control
    chars (C0 except newline, plus DEL), collapse space runs, trim
    spaces/newlines at the edges. Shared by the report operator
    (``normalize_text``) and the text-passthrough one (``clean_docs``) so
    the two can never drift. Patterns precompiled at module level — this
    runs per document inside the ingest path's Arrow batches."""
    t = unicodedata.normalize("NFC", t or "")
    t = _CTRL_RE.sub("", t)
    return _SPACE_RUN_RE.sub(" ", t).strip(" \n")


def clean_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``normalize_text``'s cleanup as a text PASSTHROUGH: same kernel,
    output ``(id_col, text_col)`` with the cleaned text replacing the raw —
    the ingest-stage shape downstream operators compose over. Pure
    Arrow-batched projection; ``docs`` may be a STREAMING DataFrame."""

    @F.pandas_udf("string")
    def clean(s: pd.Series) -> pd.Series:
        return pd.Series([_clean_str(t) for t in s])

    keep = [c for c in docs.columns if c not in (text_col,)]
    return docs.select(*keep, clean(F.col(text_col)).alias(text_col))


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode cleanup for ingest pipelines: NFC-normalize, strip control
    characters (all C0 except newline, plus DEL — tabs included), collapse
    space runs to a single space, and trim spaces/newlines at the doc
    edges. Output is total — one row per doc:
    ``(doc_id, n_raw_chars, n_clean_chars, clean_md5)`` with code-point
    lengths and an md5 checksum of the cleaned text. Every step is pinned
    to an exact DuckDB equivalent (``strip(' \\n')``, not Python's
    unicode-whitespace ``strip()``), so the oracle needs no tolerance.

    NFC composition needs real Unicode tables, so the row path is ONE
    Arrow-batched pandas UDF (like the winnowing fingerprint kernel);
    everything around it is a pure projection — zero shuffle at any scale.
    The DuckDB oracle replays the identical steps with ``NFC_NORMALIZE`` +
    ``REGEXP_REPLACE``, value-checked through lengths and the checksum."""
    @F.pandas_udf("struct<n_clean: bigint, clean_md5: string>")
    def clean(s: pd.Series) -> pd.DataFrame:
        import hashlib

        outs, hashes = [], []
        for t in s:
            t = _clean_str(t)
            outs.append(len(t))
            hashes.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        return pd.DataFrame({"n_clean": outs, "clean_md5": hashes})

    out = ensure_min_parallelism(docs, id_col).select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_raw_chars"),
        clean(F.col(text_col)).alias("_c"),
    )
    return out.select(
        id_col,
        "n_raw_chars",
        F.col("_c.n_clean").alias("n_clean_chars"),
        F.col("_c.clean_md5").alias("clean_md5"),
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    top: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level n-gram statistics: the ``top`` most frequent lowercase
    word n-grams with occurrence and document frequencies, ordered by
    ``(count DESC, gram ASC)`` for a deterministic cut. One explode + one
    map-side-combinable aggregate + a TakeOrdered — never a full sort."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    grams = F.expr(
        f"""
        transform(sequence(1, size(_t) - {n - 1}),
                  i -> array_join(slice(_t, i, {n}), ' '))
        """
    )
    stream = (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") >= n)
        .select("id", F.explode(grams).alias("gram"))
    )
    return (
        stream.groupBy("gram")
        .agg(
            F.count("*").cast("bigint").alias("count"),
            F.countDistinct("id").cast("bigint").alias("doc_freq"),
        )
        .orderBy(F.col("count").desc(), F.col("gram").asc())
        .limit(top)
    )


def _bucket_stream(docs, buckets, seed, id_col, text_col):
    """Per-occurrence lowercase word unigrams hashed into md5-bridge
    buckets: ``(id, b)``."""
    from fdi_flow_spark.pipelines.curation import _hash_bucket

    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") >= 1)
        .select("id", F.explode("_t").alias("w"))
        .select("id", _hash_bucket(F.col("w"), seed, buckets).alias("b"))
    )


def _tf_table(docs, buckets, seed, id_col, text_col):
    """The checkpointed per-(doc, bucket) count table ``(id, b, tf)`` —
    ONE corpus scan. Both the df leg and the n_docs leg of the idf fit
    aggregate it, and without the checkpoint each lazily re-derives the
    gram stream — a second and third corpus scan in the executed plan
    (measured; the repeated-scan audit pins this). tf is bounded by
    n_docs * buckets rows of ints — far smaller than the corpus it
    summarizes; SERIALIZED storage (the minhash signature-checkpoint
    lesson — the deserialized default is ~10x its serialized bytes as
    JVM rows, and this table is the x10 rehearsal's whole heap
    footprint for tfidf)."""
    from pyspark import StorageLevel

    stream = _bucket_stream(docs, buckets, seed, id_col, text_col)
    return (
        stream.groupBy("id", "b")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )


def _idf_from_tf(tf, buckets, spark):
    """The idf model from a prebuilt ``(id, b, tf)`` table: a
    ``buckets``-row table over the FULL bucket domain, smooth-idf form."""
    df_t = tf.groupBy("b").agg(F.count("*").alias("df"))
    n_docs = tf.select("id").distinct().agg(F.count("*").alias("n_docs"))
    domain = spark.range(buckets).select(F.col("id").alias("b"))
    return (
        domain.join(df_t, "b", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "b",
            (
                F.log(
                    (F.col("n_docs") + 1)
                    / (F.coalesce(F.col("df"), F.lit(0)) + 1)
                )
                + F.lit(1.0)
            ).alias("idf"),
        )
    )


def tfidf_fit(
    docs: DataFrame,
    buckets: int = 1024,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fit the idf model OFFLINE: one ``buckets``-row table ``(b, idf)``
    over the FULL bucket domain (buckets unseen in the fit corpus carry
    the pure-smoothed ``ln(N + 1) + 1``), so ``tfidf_score`` can
    inner-join any document stream without dropping grams.
    ``idf = ln((N + 1) / (df + 1)) + 1`` — the sklearn/MLlib smooth-idf
    form. One gram scan; df aggregates the per-(doc, bucket) count table,
    never a second corpus scan."""
    tf = _tf_table(docs, buckets, seed, id_col, text_col)
    return _idf_from_tf(tf, buckets, docs.sparkSession)


def tfidf_score(
    docs: DataFrame,
    model: DataFrame,
    buckets: int = 1024,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score documents against a fitted idf model (``tfidf_fit`` output —
    must share ``buckets``/``seed``). Output is sparse, one row per
    non-zero slot: ``(doc_id, bucket, tf, tfidf)`` with ``tfidf`` rounded
    to 6 dp.

    ``docs`` may be a STREAMING DataFrame: the model join runs BEFORE the
    per-(doc, bucket) aggregation, so the pipeline is one stream-static
    join plus one aggregation (complete-mode parity test in
    tests/test_streaming.py)."""
    g = _bucket_stream(docs, buckets, seed, id_col, text_col)
    if broadcast_model:
        model = F.broadcast(model)
    return (
        g.join(model, "b")
        .groupBy("id", "b")
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.round(F.count("*") * F.first("idf"), 6).alias("tfidf"),
        )
        .select(
            F.col("id").alias(id_col), F.col("b").alias("bucket"), "tf", "tfidf"
        )
    )


def tfidf_vectors(
    docs: DataFrame,
    buckets: int = 1024,
    seed: int = 11,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed TF-IDF document vectors of the corpus itself (the
    HashingTF + IDF recipe, exact and engine-portable) — semantically
    ``tfidf_score(docs, tfidf_fit(docs))``, but in ONE corpus scan
    (r12, r11 VERDICT item 5): the fit's checkpointed ``(id, b, tf)``
    table already IS the corpus-side aggregation the score needs, so
    scoring joins the 1024-row idf model straight onto it instead of
    re-tokenizing + re-exploding the corpus a second time. The composed
    path previously paid two full gram scans (fit stream + score
    stream); at x10 that second scan dominated the 4.05x input-linear
    ratio. ``tfidf_score`` keeps the stream-shaped plan for scoring NEW
    (possibly streaming) docs against an offline model."""
    tf = _tf_table(docs, buckets, seed, id_col, text_col)
    model = _idf_from_tf(tf, buckets, docs.sparkSession)
    return (
        tf.join(model, "b")
        .select(
            F.col("id").alias(id_col),
            F.col("b").alias("bucket"),
            "tf",
            F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
        )
    )


GOPHER_STOPWORDS = LANG_MARKERS["en"]


def gopher_filter(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_top_bigram_frac: float = 0.2,
    max_dup_bigram_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher quality-rule set (Rae et al. 2021, Appendix A1.1) as ONE
    keep/drop operator: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (hash + ellipsis), alphabetic-word fraction,
    stopword requirement, and the repetition caps from
    ``repetition_scores``. Output is total — one row per doc:
    ``(doc_id, n_words, keep, failed_rules)`` where ``failed_rules`` is
    the comma-joined alphabetical list of violated rule names (empty
    string when the doc passes).

    Shape: one pure-projection stats pass + the repetition aggregate
    (explode + two map-side-combinable aggs) joined back on the id — two
    corpus scans total, everything JVM-side."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.lower(F.col(text_col)))
    n_words = F.size(toks)
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
        / n_words,
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"#", ""))
    n_ellipsis = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ellipsis) / n_words).otherwise(
        F.lit(0.0)
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(stops, lambda s: F.array_contains(toks, s)))

    stats = docs.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wlen.alias("_mwl"),
        symbol_ratio.alias("_sym"),
        alpha_frac.alias("_alpha"),
        stop_hits.alias("_stops"),
    )
    rep = repetition_scores(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col), "top_bigram_frac", "dup_bigram_frac"
    )
    j = stats.join(rep, id_col)
    fails = [
        ("alpha_words", F.col("_alpha") < min_alpha_word_frac),
        ("dup_bigram", F.col("dup_bigram_frac") > max_dup_bigram_frac),
        (
            "mean_word_length",
            (F.col("_mwl") < min_mean_word_len) | (F.col("_mwl") > max_mean_word_len),
        ),
        ("stopwords", F.col("_stops") < min_stop_hits),
        ("symbol_ratio", F.col("_sym") > max_symbol_ratio),
        ("top_bigram", F.col("top_bigram_frac") > max_top_bigram_frac),
        (
            "word_count",
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words),
        ),
    ]
    failed = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in fails]
    )
    return j.select(
        F.col(id_col),
        "n_words",
        (failed == "").alias("keep"),
        failed.alias("failed_rules"),
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade level per document —
    the classic readability quality features (Kincaid et al. 1975), fully
    SQL-expressible so the oracle checks them exactly.

    Counting conventions (pinned, engine-shared):
    - sentences: maximal runs of ``[.!?]`` (minimum 1);
    - words: whitespace tokens (the ``token_counts`` tokenizer);
    - syllables: maximal runs of ``[aeiouyAEIOUY]`` across the text
      (vowel-group approximation; minimum 1).

    ``ease = 206.835 - 1.015 (words/sentences) - 84.6 (syllables/words)``;
    ``grade = 0.39 (words/sentences) + 11.8 (syllables/words) - 15.59``.
    Pure projections — zero shuffle at any scale.
    """
    docs = ensure_min_parallelism(docs, id_col)
    toks = _tokens(F.col(text_col))
    n_words = F.greatest(F.size(toks).cast("bigint"), F.lit(1).cast("bigint"))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[aeiouyAEIOUY]+"), 0)
        ).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("flesch_ease"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fk_grade"),
    )
