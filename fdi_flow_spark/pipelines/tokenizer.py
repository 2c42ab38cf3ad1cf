"""Byte-pair-encoding tokenizer training and application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

No reference twin — driver-mandated LLM-pipeline extension surface
(SURVEY §2.9), completing the tokenization story next to the whitespace /
BPE-ish regex counters in ``pipelines/text.py``.

Design at 100 TB:

- Training NEVER loops over the corpus. ONE corpus scan aggregates the
  word-frequency table (``groupBy(word).count()``, map-side combinable);
  the merge loop then runs over word TYPES weighted by frequency — the
  standard trick (HF tokenizers does the same), sound because BPE's pair
  statistics are a function of the word histogram only. Word types grow
  ~O(corpus^0.5) (Heaps' law), so the histogram is collectable far beyond
  bench scale; the ``max_word_types`` guard names the cap, and the
  documented answer past it is frequency pruning (``min_word_freq``).
- Tokenization is one Arrow-batched pass against the broadcast merge
  ranks, with a per-batch word cache (Zipf makes the cache hit rate
  ~the token/type ratio). Pure projection — zero shuffle.
- Everything is deterministic: merge selection is (max pair count, then
  lexicographically smallest pair), so training is reproducible on any
  partitioning and the Spark/Python twins agree exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism

EOW = "</w>"


def _word_counts(
    docs: DataFrame, id_col: str, text_col: str, lowercase: bool
) -> DataFrame:
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    toks = F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)
    return (
        ensure_min_parallelism(docs, id_col)
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    min_word_freq: int = 1,
    max_word_types: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus word histogram.

    Words start as character sequences with a ``</w>`` end marker; each
    step merges the most frequent adjacent symbol pair (ties to the
    lexicographically smallest pair) and stops early when no pair occurs
    twice. Returns the merges in training order — the priority ranking
    ``bpe_tokenize`` applies."""
    wc = _word_counts(docs, id_col, text_col, lowercase).where(
        F.col("n") >= min_word_freq
    )
    guard = wc.limit(max_word_types + 1).count()
    if guard > max_word_types:
        raise ValueError(
            f"word histogram exceeds max_word_types={max_word_types}; raise "
            "min_word_freq to prune the long tail (pair statistics are "
            "frequency-weighted, so rare types barely move them)"
        )
    rows = wc.collect()
    seqs: dict[tuple[str, ...], int] = {}
    for r in rows:
        seqs[tuple(r["w"]) + (EOW,)] = seqs.get(tuple(r["w"]) + (EOW,), 0) + int(r["n"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, n in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for seq, n in seqs.items():
            ns, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            key = tuple(ns)
            out[key] = out.get(key, 0) + n
        seqs = out
        merges.append((a, b))
    return merges


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word: repeatedly merge the present pair with the best
    (lowest) training rank — the standard GPT-2-style application loop."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a trained merge list to every document. Output is total over
    docs with >= 1 word: ``(doc_id, n_words, n_tokens, tokens_md5)`` where
    ``tokens_md5`` checksums the space-joined subword stream (``</w>``
    markers included) — the same reassembly contract as ``span_dedup``.

    One Arrow pass against the broadcast ranks with a per-batch word
    cache; zero shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast({tuple(m): i for i, m in enumerate(merges)})

    @F.pandas_udf("struct<n_words: bigint, n_tokens: bigint, tokens_md5: string>")
    def tok(s: pd.Series) -> pd.DataFrame:
        import hashlib

        ranks = bc.value
        cache: dict[str, list[str]] = {}
        n_words, n_tokens, hashes = [], [], []
        for text in s:
            words = [w for w in (text or "").split() if w]
            pieces: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = _apply_merges(w, ranks)
                    cache[w] = got
                pieces.extend(got)
            n_words.append(len(words))
            n_tokens.append(len(pieces))
            hashes.append(hashlib.md5(" ".join(pieces).encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {"n_words": n_words, "n_tokens": n_tokens, "tokens_md5": hashes}
        )

    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    out = ensure_min_parallelism(docs, id_col).select(
        F.col(id_col), tok(col).alias("_t")
    )
    return out.where(F.col("_t.n_words") >= 1).select(
        id_col,
        F.col("_t.n_words").alias("n_words"),
        F.col("_t.n_tokens").alias("n_tokens"),
        F.col("_t.tokens_md5").alias("tokens_md5"),
    )
