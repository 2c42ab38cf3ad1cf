"""Deduplication operators over a documents table (driver mandate,
SURVEY.md §2.9): exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale notes (the whole point of these ops):
- exact: one hash-aggregate on md5(text) — shuffles 16-byte digests, never
  the documents themselves.
- n-gram Jaccard: inverted-index self-join on *distinct* shingles — the
  classic candidate-pair generation; common-shingle counting is a
  map-side-combinable aggregate. Hot shingles (stop-bigrams) are the skew
  axis; ``max_doc_freq`` drops them (standard df-pruning) before the join.
- MinHash: permutation family ``h_i(x) = (a_i*x + b_i) mod p`` over shingle
  hashes, banded into LSH buckets; only bucket-colliding pairs are scored.
- SimHash: 64-bit signed-bit-vote fingerprint; near-dups differ in few bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MERSENNE_P = 2**31 - 1


def _word_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    grams = F.expr(
        f"""
        array_distinct(transform(
          sequence(1, greatest(0, size(_toks) - {n - 1})),
          i -> array_join(slice(_toks, i, {n}), ' ')))
        """
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select("id", F.explode(grams).alias("shingle"))
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content digest. Output one row per distinct
    text: ``(keeper_id = min id, dup_count)``."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("id").alias("keeper_id"), F.count("*").alias("dup_count"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity >= threshold.

    Output ``(id_a, id_b, jaccard)`` with ``id_a < id_b``; jaccard rounded to
    6 dp for cross-engine hash parity.
    """
    shingles = _word_ngrams(docs, id_col, text_col, n)
    if max_doc_freq is not None:
        df_counts = shingles.groupBy("shingle").agg(F.count("*").alias("_df"))
        shingles = (
            shingles.join(df_counts.where(F.col("_df") <= max_doc_freq), "shingle")
            .select("id", "shingle")
        )
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("_na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("_nb"))
    jac = F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _shingle_hash(col):
    """Portable 32-bit-ish shingle hash: first 8 hex chars of md5 -> long.
    (Engine-agnostic, unlike Spark's xxhash64 — reproducible in tests.)"""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures: sig_i = min over shingles of (a_i*h + b_i) mod p.

    One aggregate pass over the shingle table; the permutation family is a
    seeded driver-side constant list (broadcast as literals).
    """
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_hashes)]
    shingles = _word_ngrams(docs, id_col, text_col, n).withColumn(
        "_h", _shingle_hash(F.col("shingle"))
    )
    # reduce h mod p before multiplying so a*h + b stays < 2^62 (ANSI-safe)
    hmod = F.col("_h") % F.lit(MERSENNE_P)
    sig = shingles.groupBy("id").agg(
        F.array(
            *[
                F.min((hmod * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P))
                for a, b in coeffs
            ]
        ).alias("signature")
    )
    return sig


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs; candidates are scored by estimated Jaccard (signature agreement)
    and filtered. Output ``(id_a, id_b, est_jaccard)``.

    Only bucket-colliding pairs are ever materialized — the O(n²) pair space
    is never touched, which is what makes this run at 100 TB.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, seed)
    banded = sig.select(
        "id",
        "signature",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"concat(cast(b as string), ':', array_join(slice(signature, b*{rows_per_band}+1, {rows_per_band}), ',')))"
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("_sa"),
            F.col("b.signature").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)) / F.lit(
        float(num_hashes)
    )
    return cand.where(est >= threshold).select(
        "id_a", "id_b", F.round(est, 6).alias("est_jaccard")
    )


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint per doc: per-token md5-derived bit pattern, signed
    vote per bit position, fingerprint bit set where the vote is positive.
    Pure SQL (token explode + bit-position explode + two aggregates).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    tokens = docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    hashed = tokens.withColumn("_h", _shingle_hash(F.col("tok")))
    votes = (
        hashed.select(
            "id", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"), F.col("_h")
        )
        .withColumn(
            "_vote", F.expr("CASE WHEN (shiftright(_h, bit) & 1) = 1 THEN 1 ELSE -1 END")
        )
        .groupBy("id", "bit")
        .agg(F.sum("_vote").alias("_v"))
    )
    fp = votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("_v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
    return fp.select(F.col("id").alias(id_col), "simhash")
