"""Unigram-LM subword tokenizer training and application (Kudo 2018,
"Subword Regularization" — the SentencePiece unigram model), completing
the tokenization family next to BPE in ``pipelines/tokenizer.py``.

No reference twin — driver-mandated LLM-pipeline extension surface
(SURVEY §2.9).

Design at 100 TB (same shape as BPE's):

- ONE corpus scan builds the word-frequency histogram (map-side
  combinable). Candidate-piece seeding then runs DISTRIBUTED over the
  histogram: each word type explodes into its substrings (bounded by
  ``max_piece_len^2`` per type), a grouped sum scores each piece by the
  corpus frequency it covers, and only the ``seed_size`` best pieces ever
  reach the driver (TakeOrdered) — the corpus itself is never re-scanned
  and nothing un-bounded is collected.
- EM runs on the driver over word TYPES weighted by frequency (the BPE
  precedent: sound because the unigram likelihood is a function of the
  word histogram only; ``max_word_types`` names the cap and
  ``min_word_freq`` the documented pruning knob). The E-step is the
  exact forward-backward over each word's segmentation lattice — not
  hard-EM — so expected piece counts marginalize over ALL segmentations.
- Vocabulary pruning keeps single characters unconditionally (coverage
  guarantee) and drops the lowest-expected-count pieces between EM
  rounds until ``vocab_size`` remains — the standard simplification of
  Kudo's likelihood-loss pruning (documented deviation; same fixpoint
  family, much simpler, deterministic).
- Tokenization is one Arrow-batched Viterbi pass against the broadcast
  log-prob table with a per-batch word cache. Pure projection — zero
  shuffle. Ties break toward FEWER pieces, then lexicographically, so
  Spark/driver twins agree exactly on any partitioning.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from fdi_flow_spark.core.partitioning import ensure_min_parallelism
from fdi_flow_spark.pipelines.tokenizer import _word_counts


def _seed_pieces(
    wc: DataFrame, max_piece_len: int, seed_size: int
) -> list[tuple[str, int]]:
    """Distributed candidate seeding: substrings of word types up to
    ``max_piece_len`` chars, scored by SUM(word_freq) over occurrences
    (counted once per (word type, start) — the suffix-array convention).
    Only the top ``seed_size`` rows are collected."""
    pieces = (
        wc.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, char_length(w)), s -> "
                    f"transform(sequence(s, least(char_length(w), s + {int(max_piece_len) - 1})), "
                    "e -> substring(w, s, e - s + 1))))"
                )
            ).alias("piece"),
            F.col("n"),
        )
        .groupBy("piece")
        .agg(F.sum("n").alias("score"))
    )
    top = pieces.orderBy(F.desc("score"), F.asc("piece")).limit(int(seed_size))
    return [(r["piece"], int(r["score"])) for r in top.collect()]


def _forward_backward(word: str, logp: dict[str, float], max_len: int):
    """Exact E-step for one word type: returns (loglik, {piece: expected
    count}) marginalized over every segmentation, or (None, {}) if the
    word cannot be segmented (impossible while all chars are in vocab).

    The in-vocab lattice edges are materialized ONCE and reused by the
    alpha, beta, and posterior passes — the dict probe per (j, i) pair is
    the hot cost at large word-type counts."""
    n = len(word)
    NEG = -1e30
    # edges[i] = [(j, lp)] for word[j:i] in vocab
    edges: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    get = logp.get
    for i in range(1, n + 1):
        seg = word[:i]
        lo = max(0, i - max_len)
        edges_i = edges[i]
        for j in range(lo, i):
            lp = get(seg[j:])
            if lp is not None:
                edges_i.append((j, lp))
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j, lp in edges[i]:
            if alpha[j] <= NEG / 2:
                continue
            v = alpha[j] + lp
            acc = v if acc <= NEG / 2 else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[i] = acc
    if alpha[n] <= NEG / 2:
        return None, {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n, 0, -1):
        if beta[i] <= NEG / 2:
            continue
        for j, lp in edges[i]:
            v = lp + beta[i]
            b = beta[j]
            beta[j] = v if b <= NEG / 2 else (
                max(b, v) + math.log1p(math.exp(-abs(b - v)))
            )
    Z = alpha[n]
    counts: dict[str, float] = {}
    for i in range(1, n + 1):
        if beta[i] <= NEG / 2:
            continue
        for j, lp in edges[i]:
            if alpha[j] <= NEG / 2:
                continue
            post = math.exp(alpha[j] + lp + beta[i] - Z)
            if post > 0.0:
                piece = word[j:i]
                counts[piece] = counts.get(piece, 0.0) + post
    return Z, counts


def _expected_counts_distributed(
    wc: DataFrame, logp: dict[str, float], max_len: int
) -> dict[str, float]:
    """One distributed E-step: forward-backward per word TYPE inside an
    Arrow-batched ``mapInPandas`` against the broadcast vocabulary, partial
    piece-count dicts aggregated with one vocab-bounded shuffle. The word
    histogram never reaches the driver — only the (|vocab|-row) count table
    does, so training scales to corpora whose TYPE count alone exceeds
    driver memory."""
    spark = wc.sparkSession
    bc = spark.sparkContext.broadcast(logp)

    def fn(batches):
        for pdf in batches:
            counts: dict[str, float] = {}
            lp = bc.value
            for w, n in zip(pdf["w"], pdf["n"]):
                _, c = _forward_backward(w, lp, max_len)
                for piece, e in c.items():
                    counts[piece] = counts.get(piece, 0.0) + float(n) * e
            yield pd.DataFrame(
                {"piece": list(counts.keys()), "c": list(counts.values())}
            )

    rows = (
        wc.mapInPandas(fn, "piece string, c double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    # One broadcast per E-step sweep; without an unpersist they accumulate
    # on executors across prune_rounds * em_iters sweeps of a long session.
    bc.unpersist(blocking=False)
    return {r["piece"]: float(r["c"]) for r in rows}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_rounds: int = 4,
    min_word_freq: int = 1,
    max_word_types: int = 5_000_000,
    em_backend: str = "driver",
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary. Returns ``[(piece, logprob)]``
    sorted by descending probability (ties lexicographic) — the table
    :func:`unigram_tokenize` consumes.

    Schedule: seed ``seed_factor * vocab_size`` candidates (plus every
    single character, kept unconditionally), then ``prune_rounds`` rounds
    of (``em_iters`` EM sweeps -> drop the weakest non-character pieces),
    geometrically approaching ``vocab_size``, then a final EM sweep.

    ``em_backend='driver'`` (default; the BPE precedent — collects the
    word-type histogram, bounded by ``max_word_types``) or
    ``'distributed'`` — each E-step is one Spark job over the histogram
    DataFrame (``_expected_counts_distributed``); nothing type-count-sized
    is ever collected, so the ``max_word_types`` cap does not apply. Both
    backends run the identical exact forward-backward; results agree to
    float-summation order."""
    if em_backend not in ("driver", "distributed"):
        raise ValueError(f"unknown em_backend {em_backend!r}")
    wc = _word_counts(docs, id_col, text_col, lowercase).where(
        F.col("n") >= min_word_freq
    )
    words: list[tuple[str, int]] = []
    if em_backend == "driver":
        # ONE corpus scan: the OOM guard rides the collect itself (LIMIT
        # cap + post-hoc length check) instead of a separate count job
        # re-deriving the word aggregation — the same one-scan contract the
        # distributed branch keeps via localCheckpoint.
        capped = wc.limit(max_word_types + 1).collect()
        if len(capped) > max_word_types:
            raise ValueError(
                f"word histogram exceeds max_word_types={max_word_types}; "
                "raise min_word_freq to prune the long tail, or use "
                "em_backend='distributed'"
            )
        words = [(r["w"], int(r["n"])) for r in capped]
        if not words:
            return []
        chars = sorted({c for w, _ in words for c in w})
    else:
        wc = wc.localCheckpoint()  # cut re-derivation: EM re-scans per sweep
        char_rows = (
            wc.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))"
                    )
                ).alias("piece")
            )
            .distinct()
            .collect()
        )
        chars = sorted(r["piece"] for r in char_rows)
        if not chars:
            return []
    seeds = _seed_pieces(wc, max_piece_len, seed_factor * vocab_size)
    vocab: dict[str, float] = {}
    total_seed = sum(s for _, s in seeds) or 1
    for piece, score in seeds:
        vocab[piece] = score / total_seed
    floor = min(vocab.values(), default=1.0) * 0.5
    for c in chars:  # coverage guarantee: every char always segmentable
        vocab.setdefault(c, floor)
    norm = sum(vocab.values())
    logp = {p: math.log(v / norm) for p, v in vocab.items()}

    def em_sweep(logp: dict[str, float]) -> dict[str, float]:
        if em_backend == "distributed":
            counts = _expected_counts_distributed(wc, logp, max_piece_len)
        else:
            counts = {}
            for w, n in words:
                _, c = _forward_backward(w, logp, max_piece_len)
                for piece, e in c.items():
                    counts[piece] = counts.get(piece, 0.0) + n * e
        # characters survive at an epsilon count even when unused
        eps = 1e-6
        alive = {p: counts.get(p, 0.0) for p in logp}
        for c in chars:
            alive[c] = max(alive.get(c, 0.0), eps)
        total = sum(alive.values())
        return {p: math.log(v / total) for p, v in alive.items() if v > 0.0}

    target = max(vocab_size, len(chars))
    for _ in range(prune_rounds):
        for _ in range(em_iters):
            logp = em_sweep(logp)
        non_char = [(p, lp) for p, lp in logp.items() if len(p) > 1]
        n_keep = max(target - len(chars), 0)
        if len(non_char) <= n_keep:
            continue
        # geometric schedule toward the target, never below it
        n_next = max(n_keep, int(len(non_char) * 0.6))
        non_char.sort(key=lambda kv: (-kv[1], kv[0]))
        kept = dict(non_char[:n_next])
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in kept}
    logp = em_sweep(logp)
    non_char = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(target - len(chars), 0)]
    final = {p: lp for p, lp in non_char}
    final.update({c: logp[c] for c in chars if c in logp})
    # renormalize the surviving vocabulary
    total = sum(math.exp(lp) for lp in final.values())
    out = [(p, lp - math.log(total)) for p, lp in final.items()]
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out


def _greedy_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Longest-match fallback: deterministic, O(n * max_len) time and O(n)
    memory. Used for out-of-vocabulary characters and for degenerate
    mega-'words' where exact Viterbi's piece-sequence bookkeeping would be
    quadratic (the SentencePiece/HF convention is to cap word length)."""
    out, i, n = [], 0, len(word)
    while i < n:
        got = None
        for L in range(min(max_len, n - i), 0, -1):
            if word[i : i + L] in logp:
                got = word[i : i + L]
                break
        out.append(got or word[i])
        i += len(got) if got else 1
    return out


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int, max_word_chars: int = 512
) -> list[str]:
    """Best segmentation under the unigram LM; ties prefer FEWER pieces,
    then the lexicographically smallest piece sequence (deterministic
    across any float-identical vocab). Words longer than
    ``max_word_chars`` (whitespace-splitting pathologies, not language)
    take the greedy longest-match path instead — exact Viterbi's
    tie-break bookkeeping is O(n^2) memory in the word length."""
    n = len(word)
    if n > max_word_chars:
        return _greedy_segment(word, logp, max_len)
    # best[i] = (score, n_pieces, pieces) for word[:i], or None if unreachable
    best: list[tuple[float, int, tuple] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] is None:
                continue
            sc = best[j][0] + lp
            np_ = best[j][1] + 1
            pieces = best[j][2] + (word[j:i],)
            if (
                cand is None
                or (sc, -np_) > (cand[0], -cand[1])
                or ((sc, -np_) == (cand[0], -cand[1]) and pieces < cand[2])
            ):
                cand = (sc, np_, pieces)
        best[i] = cand
    if best[n] is None:  # unseen character: emit it as its own piece
        return _greedy_segment(word, logp, max_len)
    return list(best[n][2])  # type: ignore[index]


def unigram_tokenize(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a trained unigram vocabulary to every document. Output is
    total over docs with >= 1 word: ``(doc_id, n_words, n_tokens,
    tokens_md5)`` — the same contract as ``bpe_tokenize``, so the two
    tokenizer families are interchangeable downstream.

    One Arrow pass against the broadcast log-prob table with a per-batch
    word cache; zero shuffle."""
    spark = docs.sparkSession
    max_len = max((len(p) for p, _ in vocab), default=1)
    bc = spark.sparkContext.broadcast(dict(vocab))

    @F.pandas_udf("struct<n_words: bigint, n_tokens: bigint, tokens_md5: string>")
    def tok(s: pd.Series) -> pd.DataFrame:
        import hashlib

        logp = bc.value
        cache: dict[str, list[str]] = {}
        n_words, n_tokens, hashes = [], [], []
        for text in s:
            words = [w for w in (text or "").split() if w]
            pieces: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = viterbi_segment(w, logp, max_len)
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
