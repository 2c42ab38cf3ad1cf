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

from fdi_flow_spark.core.partitioning import ensure_min_parallelism

MERSENNE_P = 2**31 - 1

# Diagnostics from the most recent COMPLETED star-contraction run in this
# process: rounds executed, per-round checkpoint storage choice, and any
# big-graph repartition sizes. Telemetry for operators; also lets the
# regression test assert the >4M-edge SERIALIZED branch executed (r8 VERDICT
# item 6). Each run accumulates into its own local dict and publishes here
# atomically on completion (r9 ADVICE: the previous clear+mutate-in-place
# let concurrent star runs interleave writes into one shared dict — now the
# worst case under concurrency is last-completed-run-wins, never a mix).
LAST_STAR_RUN: dict = {}


def _word_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    docs = ensure_min_parallelism(docs, id_col)
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


def _char_ngrams(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct character k-gram shingles per doc: (id, shingle).

    Char shingles discriminate far better than word n-grams on small
    vocabularies (the shingle space is |alphabet|^k, not |vocab|^n), which
    keeps the inverted-index document-frequency per shingle low — the
    property every exact similarity join lives or dies by."""
    docs = ensure_min_parallelism(docs, id_col)
    # NOTE: filter length >= k FIRST — Spark's sequence(1, 0) counts
    # backwards ([1, 0]) rather than returning an empty array.
    grams = F.expr(
        f"""
        array_distinct(transform(
          sequence(1, length({text_col}) - {k - 1}),
          i -> substring({text_col}, i, {k})))
        """
    )
    return (
        docs.where(F.length(F.col(text_col)) >= k)
        .select(F.col(id_col).alias("id"), grams.alias("_g"))
        .select("id", F.explode("_g").alias("shingle"))
    )


def _shingle_hash_arrays(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    unit: str = "char",
    char_k: int = 12,
) -> DataFrame:
    """Per-doc SORTED xxhash64 shingle-hash arrays ``(id, ns, arr)`` built
    entirely in array land — the zero-shuffle twin of the
    ``explode -> xxhash64 -> groupBy(id).collect_list -> sort_array``
    rebuild the exact pair joins paid before r14: that collect_list groupBy
    hash-partitioned the full corpus shingle stream to reassemble rows that
    were never split across partitions in the first place (every doc's
    shingles are born in one row). ``arr`` keeps in-doc hash collisions
    between distinct shingles exactly like collect_list did (array_distinct
    runs on shingle STRINGS, before hashing); ``ns`` = size of the distinct
    shingle set — the per-doc count the prefix filters previously recomputed
    with an unordered count window over the id exchange. Row filter matches
    :func:`_word_ngrams` / :func:`_char_ngrams`: docs that yield no shingle
    emit no row."""
    docs = ensure_min_parallelism(docs, id_col)
    if unit == "char":
        grams = F.expr(
            f"""
            array_distinct(transform(
              sequence(1, length({text_col}) - {char_k - 1}),
              i -> substring({text_col}, i, {char_k})))
            """
        )
        base = docs.where(F.length(F.col(text_col)) >= char_k).select(
            F.col(id_col).alias("id"), grams.alias("_g")
        )
    else:
        toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
        grams = F.expr(
            f"""
            array_distinct(transform(
              sequence(1, greatest(0, size(_toks) - {n - 1})),
              i -> array_join(slice(_toks, i, {n}), ' ')))
            """
        )
        base = (
            docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
            .where(F.size("_toks") >= n)
            .select("id", grams.alias("_g"))
        )
    harr = F.sort_array(F.transform(F.col("_g"), lambda s: F.xxhash64(s)))
    return base.select("id", F.size("_g").alias("ns"), harr.alias("arr"))


def content_digests(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(_mid, _dg)`` — one sha2-256 content digest per document, eagerly
    localCheckpoint'd (MEMORY_AND_DISK) so every downstream consumer of the
    exact-duplicate collapse (group-min reps, the expansion map, the
    representative semi-join) reads the materialized table instead of
    re-scanning the corpus. Shared by :func:`ngram_jaccard_pairs` and
    :func:`containment_pairs` via their ``digest_table`` parameter (r14,
    r13 VERDICT item 4: each call re-checkpointing its own digest table
    over the same input cost ~0.5-1 s per call at sf0.1 — callers that run
    both joins over one corpus build this once and pass it to both).

    sha-256, not md5 (r14 ADVICE): md5 collisions are adversarially
    constructible (chosen-prefix), and a crafted pair in an untrusted
    corpus would silently merge two distinct documents into one exact-dup
    group — reported jaccard/containment 1.0, second text never shingled.
    """
    from pyspark import StorageLevel as _SL

    return docs.select(
        F.col(id_col).alias("_mid"),
        F.sha2(F.col(text_col), 256).alias("_dg"),
    ).localCheckpoint(eager=True, storageLevel=_SL.MEMORY_AND_DISK)


def exact_dup_members(
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest_table: DataFrame | None = None,
) -> DataFrame:
    """``(_rep, _mid)`` for members of MULTI-member content-digest groups
    only (``_rep`` = group-min id, rows include the representative itself),
    eagerly localCheckpoint'd. This is the whole state the exact-duplicate
    collapse needs (r14 rework of the r13 collapse): singleton documents
    never enter it, so its size rides on the corpus's DUPLICATE MASS, not
    its row count — 8 twin docs among 5000 yield ~16 rows, while the x100
    twin-duplication fixture (every doc 100x) yields the full corpus,
    exactly where the collapse pays for itself. Build from a prebuilt
    :func:`content_digests` table when available."""
    from pyspark import StorageLevel as _SL

    dg = (
        digest_table
        if digest_table is not None
        else content_digests(docs, id_col, text_col)
    )
    groups = dg.groupBy("_dg").agg(
        F.min("_mid").alias("_rid"), F.count("*").alias("_gc")
    )
    return (
        dg.join(groups.where(F.col("_gc") > 1), "_dg")
        .select(F.col("_rid").alias("_rep"), F.col("_mid"))
        .localCheckpoint(eager=True, storageLevel=_SL.MEMORY_AND_DISK)
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
    threshold: float = 0.5,
    prefix_filter: bool = True,
    unit: str = "word",
    char_k: int = 12,
    broadcast_verify: bool = False,
    collapse_exact: bool = True,
    digest_table: DataFrame | None = None,
    dup_members: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity >= threshold.
    ``unit='word'`` shingles on word n-grams; ``unit='char'`` on character
    k-grams (``char_k``) — prefer char shingles on low-vocabulary corpora.

    Output ``(id_a, id_b, jaccard)`` with ``id_a < id_b``; jaccard rounded to
    6 dp for cross-engine hash parity.

    Scale path (``prefix_filter=True``, lossless): the AllPairs/PPJoin prefix
    filter — shingles are globally ordered by (document frequency ASC,
    shingle), each doc joins only on its first ``|d| - ceil(t*|d|) + 1``
    rarest shingles (any pair with J >= t must collide there), plus the
    Jaccard length filter ``t*|a| <= |b|``. Candidates are then verified
    exactly with one ``array_intersect`` over the per-doc sorted shingle
    arrays — the quadratic hot-shingle blowup of the naive inverted-index
    join never materializes.

    ``collapse_exact`` (r13, default on — LOSSLESS): exact-duplicate groups
    defeat every AllPairs filter (identical texts share ALL shingles, so
    the prefix/length filters prune nothing and a g-sized group costs
    C(g,2) full verifications — at the x100 twin rehearsal that is 4,950
    verify pairs per document). Identical text implies an identical
    shingle SET, and set Jaccard depends only on the sets, so collapsing
    to one representative per sha2-256(text) digest BEFORE shingling
    (r14 ADVICE: sha-256, not md5 — md5 collisions are adversarially
    constructible, and a chosen-prefix pair in an untrusted corpus would
    silently merge two distinct documents into one exact-dup group), running
    AllPairs over representatives, and expanding pairs back afterward
    (cross-group pairs inherit the representative pair's jaccard verbatim;
    same-digest pairs are exactly 1.0, emitted only when the text yields
    >= 1 shingle, matching the shingling universe) reproduces the full
    output bit-for-bit while the verify cost drops from O(sum g^2) to the
    distinct-text pair space. This is the dedup_components_grouped insight
    (exact-collapse first) made output-preserving.

    ``digest_table`` (r14, r13 VERDICT item 4): a prebuilt
    :func:`content_digests` table for this exact ``docs`` input. When
    given, the collapse reads it instead of checkpointing its own — a
    caller running several exact pair joins over one corpus (this and
    :func:`containment_pairs`) pays the digest scan once.

    Duplicate-mass-sized collapse state (r14 rework): the r13 collapse
    carried corpus-sized machinery per call (a reps aggregate over every
    digest, a corpus-wide expansion map, a representative semi-join and a
    full-mem self-join — the measured ~0.5-1 s at sf0.1) even when the
    corpus held almost no twins. The state is now
    :func:`exact_dup_members` — members of MULTI-member digest groups
    only — so the twin drop is an anti-join against the twin set, the
    expansion legs are LEFT joins with identity fallback, and the intra
    leg self-joins only actual twin groups: a corpus with 8 twins among
    5000 docs pays ~16 rows of collapse state, while the x100
    twin-duplication fixture degenerates to the full r13 collapse exactly
    where it wins (>10 h -> 37 s). When the corpus has NO duplicate
    groups the map is empty and the direct plan runs — bit-identical
    output on every path. ``dup_members`` accepts a prebuilt (cached)
    map; ``digest_table`` feeds the map build when only digests are
    cached.
    """
    if collapse_exact:
        # ONE corpus scan builds the dup-member map (r14: members of
        # multi-member digest groups ONLY — the collapse state rides on
        # duplicate mass, not corpus size); every downstream consumer
        # (the twin anti-join, both expansion legs, the intra self-join)
        # reads the checkpoint — without the cut the scan audit counted 8
        # corpus scans through these paths.
        mem = (
            dup_members
            if dup_members is not None
            else exact_dup_members(docs, id_col, text_col, digest_table)
        )
        # adaptive identity skip: no duplicate groups -> the collapse is
        # an algebraic identity; run the direct plan (bit-identical)
        collapse_exact = bool(mem.take(1))
    if collapse_exact:
        # drop non-representative twins; singletons and reps stay
        work = docs.join(
            mem.where(F.col("_mid") != F.col("_rep")).select(
                F.col("_mid").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    else:
        work = docs
    # Join/shuffle on 8-byte shingle hashes instead of strings (xxhash64
    # collisions are ~1e-11 at realistic shingle cardinalities — the exact
    # intersection count is then computed over hashed arrays).
    # Materialize ONCE, in ARRAY form (r14): the per-doc sorted hash arrays
    # are built in array land (zero shuffle) and every downstream consumer —
    # dfreq, prefix rank, both verify sides — derives from this checkpoint.
    # The pre-r14 shape checkpointed the EXPLODED (id, hash) stream and
    # rebuilt the verify arrays with groupBy(id).collect_list: a full
    # corpus-shingle Exchange (paid once per verify side in the physical
    # plan) reassembling rows that were born together, plus an unordered
    # count window recomputing per-doc sizes the arrays already knew.
    from pyspark import StorageLevel

    # SERIALIZED storage (r11, the minhash signature-checkpoint lesson):
    # long-array rows held as deserialized JVM objects are ~10x their
    # bytes; the serialized block is the difference between fitting and
    # OOMing the single-JVM x100 rehearsal, and cuts GC pressure on the
    # wide verify joins at every scale.
    arrays = _shingle_hash_arrays(work, id_col, text_col, n, unit, char_k).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    # the inverted-index stream, re-derived map-side from the checkpoint
    # (explode is CPU-only; ns rides along so no count window is needed)
    shingles = arrays.select("id", "ns", F.explode("arr").alias("shingle"))

    if prefix_filter:
        # Extended-prefix AllPairs: keep each doc's beta-fraction rarest
        # shingles (beta > 1 - t keeps the >=1-collision guarantee) and use
        # the SOUND count bound on prefix collisions: any pair with J >= t
        # has overlap >= alpha = ceil(t/(1+t)*(na+nb)), and common shingles
        # outside the prefixes number at most (na-pa)+(nb-pb), so prefix
        # collisions c >= alpha - (na-pa) - (nb-pb). On realistic data that
        # bound is in the tens — the pair aggregate itself kills the noise
        # pairs, and only near-matches reach exact verification.
        beta = max(0.8, 1.0 - threshold + 0.05)
        dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("_df"))
        # ns arrives with the explode (size of the checkpointed array) —
        # the pre-r14 unordered count window over the id exchange is gone.
        ranked = (
            shingles.join(dfreq, "shingle")
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
                ),
            )
            .withColumn("_p", F.ceil(F.lit(beta) * F.col("ns")))
            .where(F.col("_r") <= F.col("_p"))
            .select("id", "shingle", "ns", "_p")
        )
        a, b = ranked.alias("a"), ranked.alias("b")
        na, nb = F.col("a.ns"), F.col("b.ns")
        alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (na + nb))
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id"))
                # length filter: J>=t requires t*max(|a|,|b|) <= min(|a|,|b|)
                & (F.lit(threshold) * F.greatest(na, nb) <= F.least(na, nb)),
            )
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                na.alias("_na"),
                nb.alias("_nb"),
                F.col("a._p").alias("_pa"),
                F.col("b._p").alias("_pb"),
            )
            .agg(F.count("*").alias("_c"))
            .where(
                F.col("_c")
                >= F.greatest(
                    F.lit(1),
                    F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("_na") + F.col("_nb")))
                    - (F.col("_na") - F.col("_pa"))
                    - (F.col("_nb") - F.col("_pb")),
                )
            )
            .select("id_a", "id_b")
        )
    else:
        inv = shingles.select("id", "shingle")
        a, b = inv.alias("a"), inv.alias("b")
        cand = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )

    aa = arrays.select(F.col("id").alias("id_a"), F.col("arr").alias("_arr_a"))
    ab = arrays.select(F.col("id").alias("id_b"), F.col("arr").alias("_arr_b"))
    inter = F.size(F.array_intersect("_arr_a", "_arr_b"))
    na, nb = F.size("_arr_a"), F.size("_arr_b")
    jac = inter / (na + nb - inter)
    # The per-doc hash-array table grows with the corpus, so the default
    # verify join shuffles (scale-safe). Hash join, not sort-merge: sorting
    # wide hash-array rows by id buys nothing, and the candidate side is
    # always the small build side. broadcast_verify=True is the bench-scale
    # opt-in for corpora known to fit in executor memory.
    if broadcast_verify:
        aa, ab = F.broadcast(aa), F.broadcast(ab)
    else:
        aa, ab = aa.hint("shuffle_hash"), ab.hint("shuffle_hash")
    pairs = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
    if not collapse_exact:
        return pairs
    # Expand representative pairs back to member pairs. Cross-group pairs
    # inherit the representative jaccard verbatim (identical sets, identical
    # float); member ids interleave across groups, so re-order each pair.
    ma = mem.select(F.col("_rep").alias("id_a"), F.col("_mid").alias("_xa"))
    mb = mem.select(F.col("_rep").alias("id_b"), F.col("_mid").alias("_xb"))
    # LEFT joins with identity fallback (r14): mem holds only dup-group
    # members, so a pair not touching a dup representative expands to
    # itself — the join state is duplicate-mass-sized, not corpus-sized.
    xa = F.coalesce("_xa", F.col("id_a"))
    xb = F.coalesce("_xb", F.col("id_b"))
    cross = (
        pairs.join(ma, "id_a", "left")
        .join(mb, "id_b", "left")
        .select(
            F.least(xa, xb).alias("id_a"),
            F.greatest(xa, xb).alias("id_b"),
            "jaccard",
        )
    )
    # Same-digest pairs are exactly 1.0 — but only for texts that produce
    # >= 1 shingle (shorter texts never enter the shingling universe, and
    # the per-pair path would likewise never emit them). `arrays` holds
    # precisely the representatives with non-empty shingle sets.
    eligible = arrays.select(F.col("id").alias("_erep"))
    intra = (
        mem.alias("x")
        .join(
            mem.alias("y"),
            (F.col("x._rep") == F.col("y._rep"))
            & (F.col("x._mid") < F.col("y._mid")),
        )
        .join(eligible, F.col("x._rep") == F.col("_erep"), "left_semi")
        .select(
            F.col("x._mid").alias("id_a"),
            F.col("y._mid").alias("id_b"),
            F.round(F.lit(1.0), 6).alias("jaccard"),
        )
    )
    if threshold > 1.0:  # degenerate caller: identical pairs no longer pass
        return cross
    return cross.unionByName(intra)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.6,
    prefix_filter: bool = True,
    unit: str = "char",
    char_k: int = 12,
    broadcast_verify: bool = False,
    collapse_exact: bool = True,
    digest_table: DataFrame | None = None,
    dup_members: DataFrame | None = None,
) -> DataFrame:
    """Directed near-clone pairs by shingle-set CONTAINMENT (r10, §2.9
    extension): ``C(A->B) = |A ∩ B| / |A| >= threshold`` over distinct
    shingles. The asymmetric complement of ``ngram_jaccard_pairs`` — it
    catches subset relations Jaccard misses (a paragraph lifted into a much
    longer page scores C≈1 from the paragraph's side but tiny Jaccard),
    which is the quote/boilerplate/subset-clone detector curation pipelines
    want. Output ``(id_a, id_b, containment)`` for ORDERED pairs
    ``id_a != id_b`` (containment is directional), rounded to 6 dp.

    Scale path (``prefix_filter=True``, lossless): the one-sided prefix
    filter — if ``C(A->B) >= t`` then ``|A ∩ B| >= ceil(t*|A|)``, so among
    A's ``|A| - ceil(t*|A|) + 1`` globally RAREST shingles (document
    frequency ASC, shingle) at least one must also be in B. Candidates are
    therefore prefix(A) joined against the FULL inverted index on 8-byte
    xxhash64 shingle keys, then verified exactly with one
    ``array_intersect`` over per-doc sorted hash arrays (same verify shape
    and collision budget as the Jaccard path). No length filter can prune
    the B side (containment is one-sided: a tiny A can be contained in any
    B), so the B-side skew axis is hot shingles — at high thresholds the
    prefix is small and df-rarest, which is exactly the anti-skew order.

    ``collapse_exact`` (r13, default on — LOSSLESS, the
    ``ngram_jaccard_pairs`` collapse applied to the directed join):
    containment depends only on the shingle SETS, and identical text means
    an identical set, so exact-duplicate groups are collapsed to one
    sha2-256(text) representative before shingling (r14 ADVICE: collision-
    resistant against adversarial corpus inputs, unlike md5) and the
    directed pairs are
    expanded back afterward — cross-group ordered pairs inherit the
    representative containment verbatim (both directions arrive as
    separate representative rows), same-digest ordered pairs are exactly
    1.0 when the text shingles. Without it a g-sized twin group costs
    g*(g-1) full verifications that no filter can prune.

    ``digest_table`` (r14, r13 VERDICT item 4): a prebuilt
    :func:`content_digests` table for this exact ``docs`` input — shared
    with :func:`ngram_jaccard_pairs` so a caller running both exact pair
    joins over one corpus pays the digest scan + checkpoint once.
    ``dup_members`` / the duplicate-mass-sized collapse state and the
    adaptive identity skip follow the ``ngram_jaccard_pairs`` contract:
    no duplicate groups -> the collapse is a no-op and the direct plan
    runs, bit-identical.
    """
    if collapse_exact:
        # the dup-member map (duplicate-mass-sized; see the jaccard twin)
        mem = (
            dup_members
            if dup_members is not None
            else exact_dup_members(docs, id_col, text_col, digest_table)
        )
        collapse_exact = bool(mem.take(1))
    if collapse_exact:
        work = docs.join(
            mem.where(F.col("_mid") != F.col("_rep")).select(
                F.col("_mid").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    else:
        work = docs
    # One materialization feeds sizes/arrays/dfreq/prefix/both join sides —
    # same cut as ngram_jaccard_pairs, and same r14 ARRAY-form rework: the
    # per-doc sorted hash arrays are built in array land (zero shuffle),
    # killing the groupBy(id).collect_list Exchange that reassembled the
    # exploded stream and the unordered count window that recomputed ns.
    from pyspark import StorageLevel

    # SERIALIZED storage (r11, the minhash signature-checkpoint lesson):
    # long-array rows held as deserialized JVM objects are ~10x their
    # bytes; the serialized block is the difference between fitting and
    # OOMing the single-JVM x100 rehearsal, and cuts GC pressure on the
    # wide verify joins at every scale.
    arrays = _shingle_hash_arrays(work, id_col, text_col, n, unit, char_k).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    shingles = arrays.select("id", "ns", F.explode("arr").alias("shingle"))
    inv = shingles.select("id", "shingle")

    if prefix_filter:
        dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("_df"))
        # EXTENDED prefix + count bound (r15, the Jaccard twin's design
        # brought to the directed join; guide §2.3 "shuffle fewer bytes" —
        # here "verify fewer pairs"). The minimal prefix p = ns - ceil(t*ns)
        # + 1 guarantees >= 1 collision, so every pair sharing ONE rare
        # shingle reached the exact array_intersect verify: measured at
        # sf0.1, 1.57M candidate pairs for 482 true pairs, and the verify
        # joins (wide array payloads + per-pair intersects) were ~60% of
        # the query's warm cost. Keeping the LARGER prefix
        # p' = ns - ceil(beta*t*ns) + 1 (beta < 1) buys a SOUND pair-count
        # bound: if C(A->B) >= t then |A∩B| >= ceil(t*ns_a), and at most
        # ns_a - p'_a of those lie outside A's prefix, so prefix collisions
        # c >= ceil(t*ns_a) - (ns_a - p'_a). Pairs under the bound provably
        # miss the threshold — the filter is lossless, and the dedup the
        # old dropDuplicates paid becomes the same-shuffle count aggregate.
        beta = 0.8
        pa = F.col("ns") - F.ceil(F.lit(beta * threshold) * F.col("ns")) + 1
        pref = (
            shingles.join(dfreq, "shingle")
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
                ),
            )
            .where(F.col("_r") <= pa)
            .select("id", "shingle", "ns", pa.alias("_pa"))
        )
        cand = (
            pref.alias("a")
            .join(
                inv.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") != F.col("b.id")),
            )
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.ns").alias("_nsa"),
                F.col("a._pa").alias("_paa"),
            )
            .agg(F.count("*").alias("_c"))
            .where(
                F.col("_c")
                >= F.greatest(
                    F.lit(1),
                    F.ceil(F.lit(threshold) * F.col("_nsa"))
                    - (F.col("_nsa") - F.col("_paa")),
                )
            )
            .select("id_a", "id_b")
        )
    else:
        cand = (
            inv.alias("a")
            .join(
                inv.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") != F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )

    aa = arrays.select(F.col("id").alias("id_a"), F.col("arr").alias("_arr_a"))
    ab = arrays.select(F.col("id").alias("id_b"), F.col("arr").alias("_arr_b"))
    cont = F.size(F.array_intersect("_arr_a", "_arr_b")) / F.size("_arr_a")
    if broadcast_verify:
        aa, ab = F.broadcast(aa), F.broadcast(ab)
    else:
        aa, ab = aa.hint("shuffle_hash"), ab.hint("shuffle_hash")
    pairs = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )
    if not collapse_exact:
        return pairs
    # Directed expansion: keep orientation (id_a stays the contained side),
    # no reordering — both directions exist as separate representative rows
    # whenever both pass the threshold.
    ma = mem.select(F.col("_rep").alias("id_a"), F.col("_mid").alias("_xa"))
    mb = mem.select(F.col("_rep").alias("id_b"), F.col("_mid").alias("_xb"))
    # LEFT joins with identity fallback (r14; see the jaccard twin)
    cross = (
        pairs.join(ma, "id_a", "left")
        .join(mb, "id_b", "left")
        .select(
            F.coalesce("_xa", F.col("id_a")).alias("id_a"),
            F.coalesce("_xb", F.col("id_b")).alias("id_b"),
            "containment",
        )
    )
    eligible = arrays.select(F.col("id").alias("_erep"))
    intra = (
        mem.alias("x")
        .join(
            mem.alias("y"),
            (F.col("x._rep") == F.col("y._rep"))
            & (F.col("x._mid") != F.col("y._mid")),
        )
        .join(eligible, F.col("x._rep") == F.col("_erep"), "left_semi")
        .select(
            F.col("x._mid").alias("id_a"),
            F.col("y._mid").alias("id_b"),
            F.round(F.lit(1.0), 6).alias("containment"),
        )
    )
    if threshold > 1.0:
        return cross
    return cross.unionByName(intra)


def _shingle_hash(col):
    """Portable 32-bit-ish shingle hash: first 8 hex chars of md5 -> long.
    (Engine-agnostic, unlike Spark's xxhash64 — reproducible in tests.)"""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _hashed_shingles(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    unit: str = "char",
    char_k: int = 12,
) -> DataFrame:
    """Per-doc DISTINCT md5-bridge shingle hashes ``(id, h)`` with the
    dedup done in array land: the shingle array is hashed and
    ``array_distinct``-ed per row BEFORE the explode, so an in-doc hash
    collision between distinct shingles collapses exactly like
    ``dropDuplicates(["id", "h"])`` — but without the corpus-sized
    exchange that dropDuplicates pays (the map-side partial aggregate
    already found the rows unique, so that exchange moved the full
    stream to discover nothing). Output rows stay clustered by the
    input's doc partitioning, which per-doc windows downstream reuse."""
    docs = ensure_min_parallelism(docs, id_col)
    if unit == "char":
        grams = F.expr(
            f"""
            array_distinct(transform(
              sequence(1, length({text_col}) - {char_k - 1}),
              i -> substring({text_col}, i, {char_k})))
            """
        )
        base = docs.where(F.length(F.col(text_col)) >= char_k).select(
            F.col(id_col).alias("id"), grams.alias("_g")
        )
    else:
        toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
        grams = F.expr(
            f"""
            array_distinct(transform(
              sequence(1, greatest(0, size(_toks) - {n - 1})),
              i -> array_join(slice(_toks, i, {n}), ' ')))
            """
        )
        base = (
            docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
            .where(F.size("_toks") >= n)
            .select("id", grams.alias("_g"))
        )
    harr = F.array_distinct(F.transform(F.col("_g"), lambda s: _shingle_hash(s)))
    return base.select("id", F.explode(harr).alias("h"))


def containment_screened(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 64,
    threshold: float = 0.6,
    unit: str = "char",
    char_k: int = 12,
    verify: bool = False,
    margin: float = 0.0,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """APPROXIMATE screening for directed containment (r11, per r10 VERDICT
    item 3) — the sub-output-bound sibling of :func:`containment_pairs`,
    mirroring how ``minhash_dedup_pairs`` screens for
    ``ngram_jaccard_pairs``. The exact path's x10 cost is OUTPUT-bound
    (501k true pairs at the planted-twin fixture cost ~520 s of emit +
    full ``array_intersect`` verify) and no length filter exists one-sided
    (``dedup.py`` exact-path notes) — so the only cheaper path is a sketch.

    Estimator: a DF-RAREST-K sketch — A's ``k`` globally rarest shingles
    (document frequency ASC, hash ASC; the exact path's own anti-skew
    prefix order, truncated to a CONSTANT ``k`` instead of the lossless
    ``|A| - ceil(t*|A|) + 1`` that grows with doc length). With
    ``m = |rarestk(A) ∩ B|`` (matched against B's FULL hashed set, not
    B's sketch — one-sided containment must see all of B),
    ``Ĉ(A→B) = m / min(|A|, k)``. This is deliberately NOT the uniform
    bottom-k-by-hash sample: a uniform sample is size-biased toward hot
    shingles (a sampled hash occurs with probability proportional to
    nothing, so the expected df of a sampled occurrence is
    ``sum(df^2)/sum(df)`` — measured ~80 on the sf0.1 corpus, ~800 at the
    x10 twin corpus), and the sketch x index join volume explodes with
    exactly the skew the exact path's df-ASC prefix exists to avoid
    (measured: executor OOM at 8 GB at x10). Rare-first keeps the
    estimate conservative in the right direction for a SCREEN: a true
    subset clone (``C(A→B) = 1``) has ALL of A's shingles in B including
    the rarest, so its estimate is exactly 1; overlap concentrated in
    corpus boilerplate (the false-positive axis) scores LOW because hot
    shingles never enter the sketch. When ``|A| <= k`` the sketch is the
    whole (capped) set and the estimate is EXACT — screening degrades
    gracefully to the exact answer on short docs.

    Output ``(id_a, id_b, est_containment)`` for ordered pairs with
    ``Ĉ >= threshold - margin``; ``verify=True`` instead exact-verifies the
    survivors with one ``array_intersect`` (same verify shape as the exact
    path) and emits true ``containment >= threshold``. With
    ``max_df=None`` (full-universe semantics) that output is a strict
    SUBSET of :func:`containment_pairs` (recall floor pinned in
    ``tests/test_dedup.py``; 1.0 whenever every doc has ``<= k``
    shingles). With the default stop-shingle cap active, the verify
    arrays are built from the capped ``hashed`` set, so the verified
    containment is over the INFORMATIVE-shingle universe ``U`` (below) —
    dropping hot shingles from A's denominator can lift ``C`` over ``U``
    ABOVE the full-universe value, so a pair can pass here whose
    full-universe containment sits under the threshold. The subset-of-
    the-exact-path contract therefore holds exactly when no shingle
    exceeds the cap (true of high-entropy corpora and the test fixtures);
    on corpora with boilerplate the two paths intentionally answer over
    different universes, and U is the better screen (hot shingles are
    shared by UNRELATED docs — the false-positive axis).

    Scale shape: per-doc candidate fan-out is a CONSTANT ``k`` rows (the
    exact prefix filter emits ``|A| - ceil(t*|A|) + 1`` rows — GROWS with
    doc length), and scoring is a count aggregate over the candidate join
    (map-side combinable) instead of a per-pair full-array intersect.
    Hashes are the portable md5 bridge (``_shingle_hash``), identical in
    the DuckDB oracle, so the screened estimates themselves are
    value-hash-checked.

    The stop-shingle cap (ON by default) bounds the other skew axis — the
    B side. Even rare-first sketches must join an index containing hot
    shingles' postings; ``max_df="auto"`` drops shingles with document
    frequency above ``max(16, ceil(0.001 * n_docs))`` from sketch AND
    index consistently, so ``Ĉ`` is containment over the
    INFORMATIVE-shingle universe ``U = {df <= cap}``:
    ``|A∩B∩U| / min(|A∩U|, k)``. For subset-clone detection this is the
    right universe (df-hot shingles are corpus boilerplate shared by
    unrelated docs — keeping them only inflates false positives); it is
    the standard stop-shingle practice of production near-dup systems.
    The hot set is small by construction
    (``#{h: df > cap} < total_shingle_occurrences / cap``), so its
    exclusion is one broadcast anti-join. Pass an int for an absolute
    cap, or ``None`` to disable (full-universe semantics; only safe on
    high-entropy corpora).
    """
    # deduped on (id, h): an in-doc hash collision shrinks the set the same
    # way in both engines (array-land dedup — no dropDuplicates exchange).
    # One materialization feeds sketch + index (+ verify arrays) — same cut
    # as the exact twins. SERIALIZED storage (the minhash
    # signature-checkpoint lesson): 143M (long, long) rows at the x100
    # rehearsal are ~2 GB serialized but ~10x that as deserialized JVM rows
    # — the deserialized default OOM'd the 8 GB single-JVM rehearsal before
    # the first join ran.
    from pyspark import StorageLevel

    hashed = _hashed_shingles(
        docs, id_col, text_col, n=n, unit=unit, char_k=char_k
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    dfreq = hashed.groupBy("h").agg(F.count("*").alias("_df"))
    if max_df is not None:
        if max_df == "auto":
            nd = hashed.agg(F.countDistinct("id").alias("_nd"))
            cap = F.greatest(F.lit(16), F.ceil(F.lit(0.001) * F.col("_nd")))
            hot = dfreq.crossJoin(F.broadcast(nd)).where(F.col("_df") > cap)
        else:
            hot = dfreq.where(F.col("_df") > F.lit(int(max_df)))
        hashed = hashed.join(F.broadcast(hot.select("h")), "h", "left_anti")
    byid = Window.partitionBy("id")
    sk = (
        hashed.join(dfreq, "h")  # df attach: the rare-first sketch order
        .withColumn(
            "_r",
            F.row_number().over(
                byid.orderBy(F.col("_df").asc(), F.col("h").asc())
            ),
        )
        .withColumn("_ns", F.count("*").over(byid))
        .where(F.col("_r") <= k)
        .select("id", "h", F.least(F.col("_ns"), F.lit(k)).alias("_sk"))
    )
    cand = (
        sk.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.id") != F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("_sk"),  # functionally dependent on id_a; riding the keys
        )
        .agg(F.count("*").alias("_c"))
    )
    est = F.col("_c") / F.col("_sk")
    screened = cand.where(est >= threshold - margin)
    if not verify:
        return screened.select(
            "id_a", "id_b", F.round(est, 6).alias("est_containment")
        )
    arrays = hashed.groupBy("id").agg(
        F.sort_array(F.collect_list("h")).alias("arr")
    )
    aa = arrays.select(F.col("id").alias("id_a"), F.col("arr").alias("_arr_a"))
    ab = arrays.select(F.col("id").alias("id_b"), F.col("arr").alias("_arr_b"))
    cont = F.size(F.array_intersect("_arr_a", "_arr_b")) / F.size("_arr_a")
    return (
        screened.select("id_a", "id_b")
        .join(aa.hint("shuffle_hash"), "id_a")
        .join(ab.hint("shuffle_hash"), "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


def containment_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    unit: str = "char",
    char_k: int = 12,
    max_df: int | str | None = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Build the OFFLINE artifacts :func:`containment_screen_against`
    probes — the subset-clone analog of :func:`minhash_index`. Returns
    ``(index, hot)``:

    - ``index``: the corpus's capped inverted shingle table ``(id, h)``
      (distinct md5-bridge hashes per doc, stop-shingles with document
      frequency above ``max(16, ceil(0.001 * n_docs))`` removed — the
      same informative universe as :func:`containment_screened`);
    - ``hot``: the removed stop-shingle hashes ``(h)`` — REQUIRED at
      probe time so arriving docs exclude the same universe (a hot
      corpus shingle absent from the index would otherwise read as
      df=0 "rare", waste sketch slots, and deflate estimates for docs
      that legitimately contain corpus boilerplate). Bounded by
      ``total_shingle_occurrences / cap`` rows — broadcastable at any
      corpus size.

    Persist both next to the LSH band index; arriving shards never
    re-scan the corpus.
    """
    # one materialization (serialized, as in containment_screened) feeds
    # the THREE consumers below — dfreq, the n_docs scalar, and the
    # anti-join — which otherwise each re-run the corpus md5-shingle
    # explode (measured: the unchecked build paid the explode twice)
    from pyspark import StorageLevel

    hashed = _hashed_shingles(
        corpus, id_col, text_col, n=n, unit=unit, char_k=char_k
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    dfreq = hashed.groupBy("h").agg(F.count("*").alias("_df"))
    if max_df is None:
        hot = dfreq.where(F.lit(False))
    elif max_df == "auto":
        nd = hashed.agg(F.countDistinct("id").alias("_nd"))
        cap = F.greatest(F.lit(16), F.ceil(F.lit(0.001) * F.col("_nd")))
        hot = dfreq.crossJoin(F.broadcast(nd)).where(F.col("_df") > cap)
    else:
        hot = dfreq.where(F.col("_df") > F.lit(int(max_df)))
    # the hot set is tiny by construction; materializing it here means the
    # caller's index checkpoint runs ONE anti-join over the hashed table
    # instead of re-deriving the df aggregate (and the n_docs scalar)
    # inside its own job
    hot = hot.select("h").localCheckpoint()
    index = hashed.join(F.broadcast(hot), "h", "left_anti").select("id", "h")
    return index, hot


def containment_screen_against(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    corpus_hot: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 64,
    threshold: float = 0.6,
    unit: str = "char",
    char_k: int = 12,
) -> DataFrame:
    """Screen ARRIVING documents for containment in a static corpus —
    ``Ĉ(new → corpus_doc) >= threshold`` against a prebuilt
    :func:`containment_index`. The subset-clone / contamination probe of
    the incremental-dedup family (exact: ``dedup_against``; Jaccard:
    ``near_dup_candidates_against``; ANN: ``streaming_ivfpq_probe``):
    "is this new doc mostly lifted from something already ingested?".
    Output ``(id, corpus_id, est_containment)``.

    Same estimator as :func:`containment_screened` with the corpus side
    frozen: the arriving doc's k rarest shingles — ranked by CORPUS
    document frequency (derived from the index, vocab-bounded; an
    arriving shingle the corpus never saw has df 0, ranks rarest, and
    correctly contributes a guaranteed miss: unseen content IS evidence
    against containment) — joined against the static index, scored by one
    count aggregate. ``|A|`` counts the arriving doc's shingles in the
    SHARED universe (corpus stop-shingles excluded via ``corpus_hot``,
    exactly as the index side was). Per-doc work is index-join + count —
    no corpus re-scan, so shards probe an arbitrarily large corpus at
    per-shard cost. Streaming twin: ``streaming.containment_probe``
    (foreachBatch — the per-doc rank window is a batch-side shape), with
    the ``batch_id``-partition idempotent sink of the ANN probe."""
    hashed_new = _hashed_shingles(
        new_docs, id_col, text_col, n=n, unit=unit, char_k=char_k
    ).join(F.broadcast(corpus_hot), "h", "left_anti")
    dfreq = corpus_index.groupBy("h").agg(F.count("*").alias("_df"))
    byid = Window.partitionBy("id")
    sk = (
        hashed_new.join(dfreq, "h", "left")
        .withColumn("_dfr", F.coalesce(F.col("_df"), F.lit(0)))
        .withColumn(
            "_r",
            F.row_number().over(
                byid.orderBy(F.col("_dfr").asc(), F.col("h").asc())
            ),
        )
        .withColumn("_ns", F.count("*").over(byid))
        .where(F.col("_r") <= k)
        .select("id", "h", F.least(F.col("_ns"), F.lit(k)).alias("_sk"))
    )
    est = F.col("_c") / F.col("_sk")
    return (
        sk.alias("a")
        .join(corpus_index.alias("b"), "h")
        .groupBy(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("corpus_id"),
            F.col("_sk"),
        )
        .agg(F.count("*").alias("_c"))
        .where(est >= threshold)
        .select("id", "corpus_id", F.round(est, 6).alias("est_containment"))
    )


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
    max_bucket_rows: int | None = 1024,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs; candidates are scored by estimated Jaccard (signature agreement)
    and filtered. Output ``(id_a, id_b, est_jaccard)``.

    Only bucket-colliding pairs are ever materialized — the O(n²) pair space
    is never touched, which is what makes this run at 100 TB.

    ``max_bucket_rows`` (r8, VERDICT r7 item 4) bounds the verify-stage
    reducer skew: a band bucket of m rows is m(m-1)/2 pairs in ONE reducer
    under the plain self-join, and m grows linearly with the corpus
    duplication factor. Buckets over the cap are routed through a salted
    chunk grid — each member gets a deterministic chunk id (hash % n_chunks,
    n_chunks = ceil(m / cap)), both sides replicate across partner chunks,
    and the join key becomes (band, bucket, chunk_a, chunk_b), so no reducer
    sees more than ~cap^2 pair checks. Output is IDENTICAL (every pair is
    generated exactly once, under the unique (chunk(id_a), chunk(id_b))
    key); only the execution shape changes. ``None`` disables the cap
    (single-join plan, no bucket-size pass)."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    # Materialize the SIGNATURES once (SERIALIZED — a 64-long array held as
    # a deserialized JVM object graph is ~10x its bytes): the banding
    # self-join consumes them on both sides and the bucket-size guard a
    # third time, and without the cut every consumer would re-run the
    # shingle explode + min-hash aggregate (full corpus passes). The
    # banding PROJECTION itself is deliberately NOT checkpointed: an r9
    # draft materialized the banded rows too (bands-times-replicated
    # signatures, ~1 GB per call at the x100 rehearsal scale) and those
    # retained blocks OOM'd the 8 GiB x100 JVM across the rehearsal's
    # repeated calls — recomputing the band strings from the signature
    # checkpoint is CPU-only and exchange reuse already shares the
    # self-join's banding work between its two sides. (Same failure class
    # as the star loop's r7 deserialized-caching fix; caught the same way,
    # by the x100 rehearsal.)
    from pyspark import StorageLevel

    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, seed).localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
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

    def _self_pairs(side):
        a = side.alias("a")
        b = side.alias("b")
        return a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("_sa"),
            F.col("b.signature").alias("_sb"),
        )

    if max_bucket_rows is None:
        oversize = None
    else:
        # One cheap map-side-combinable count pass finds oversize buckets —
        # only (band, bucket) pairs with partial counts move in the shuffle,
        # and by construction the survivors are FEW (each is a pathology,
        # not the norm), so the tiny result materializes eagerly. The
        # Python-side branch below matters for cost: the r8 shape kept the
        # tagged/normal/heavy three-way plan even when ZERO buckets were
        # oversize, re-scanning the banded projection five times instead of
        # two and regressing the sf0.1 bench +80% (r8 VERDICT item 1). Now
        # the common case pays exactly this count pass on top of the plain
        # single-join plan, and the chunk grid is built only when a bucket
        # actually needs it.
        oversize = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("_m"))
            .where(F.col("_m") > max_bucket_rows)
            .localCheckpoint(eager=True)
        )
        if not oversize.head(1):
            oversize = None
    if oversize is None:
        cand = _self_pairs(banded).dropDuplicates(["id_a", "id_b"])
    else:
        tagged = banded.join(F.broadcast(oversize), ["band", "bucket"], "left")
        normal = tagged.where(F.col("_m").isNull()).drop("_m")
        heavy = (
            tagged.where(F.col("_m").isNotNull())
            .withColumn(
                "_nc", F.ceil(F.col("_m") / F.lit(max_bucket_rows)).cast("int")
            )
            .withColumn("_c", F.pmod(F.xxhash64("id"), F.col("_nc")).cast("int"))
            .drop("_m")
        )
        # Salted chunk grid: a-side carries its own chunk and replicates over
        # partner chunks (_cb); b-side symmetric (_ca). Pair (i, j) with
        # i < j matches exactly once: a = i's copy with _cb = chunk(j)
        # against b = j's copy with _ca = chunk(i). The 4-part join key
        # spreads one bucket over n_chunks^2 reducers.
        ha = heavy.withColumn("_cb", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        hb = heavy.withColumn("_ca", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        a = ha.alias("a")
        b = hb.alias("b")
        heavy_pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a._c") == F.col("b._ca"))
            & (F.col("a._cb") == F.col("b._c"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("_sa"),
            F.col("b.signature").alias("_sb"),
        )
        cand = (
            _self_pairs(normal)
            .unionByName(heavy_pairs)
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
    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    tokens = docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    hashed = tokens.withColumn("_h", _shingle_hash(F.col("tok")))
    # One aggregation: collect the token hashes per doc (short arrays), then
    # fold the 32 bit-votes with nested higher-order functions — no
    # |docs| x bits explode, no second shuffle.
    fp = (
        hashed.groupBy("id")
        .agg(F.collect_list("_h").alias("_hs"))
        .withColumn(
            "simhash",
            F.expr(
                f"""
                aggregate(sequence(0, {bits - 1}), cast(0 as bigint),
                  (acc, bit) -> acc + IF(
                     2 * size(filter(_hs, h -> (shiftright(h, bit) & 1) = 1)) > size(_hs),
                     shiftleft(cast(1 as bigint), bit), cast(0 as bigint)))
                """
            ),
        )
    )
    return fp.select(F.col("id").alias(id_col), "simhash")


def _star_edge_checksum(edges: DataFrame) -> tuple:
    """(count, hash-xor) fingerprint of an edge set — one aggregate, used as
    the fixpoint test of the star alternation (collision odds ~2^-64).
    bit_xor, not sum: summing 64-bit hashes overflows under ANSI mode."""
    row = edges.select(F.xxhash64("src", "dst").alias("_h")).agg(
        F.count("*").alias("n"), F.expr("bit_xor(_h)").alias("h")
    ).collect()[0]
    return (row["n"], row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Kiveris et al. large-star: every node connects its LARGER neighbors
    to the minimum of its neighborhood (including itself)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("_m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Kiveris et al. small-star: orient edges large -> small, then connect
    each node and its smaller neighbors to the neighborhood minimum."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = directed.groupBy("src").agg(F.min("dst").alias("_m"))
    j = directed.join(mins, "src")
    nbr_links = j.where(F.col("dst") != F.col("_m")).select(
        F.col("dst").alias("src"), F.col("_m").alias("dst")
    )
    self_links = j.select("src", F.col("_m").alias("dst"))
    return nbr_links.unionByName(self_links).distinct()


def dedup_components(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over near-dup pairs: the clustering step that
    turns pairwise matches (MinHash/Jaccard/cosine) into dedup groups.
    Returns ``(doc_id, component_id)`` with ``component_id`` = the smallest
    doc id in the component; with ``docs`` given, docs in no pair map to
    themselves (singletons), so the output covers the whole corpus.

    ``algorithm='label'`` (default): iterative min-label propagation — each
    round is one hash-shuffle on the node key (edges join labels ->
    per-node min -> merge), exiting on a converged round (changed-count
    aggregate == 0) or ``max_iter``. Near-dup components are small and
    dense (bounded diameter), so rounds ~ 2-4 in practice; a chain graph
    of diameter > ``max_iter`` warns (see below).

    ``algorithm='star'``: the large-star/small-star alternation (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — converges in
    O(log^2 n) rounds REGARDLESS of graph diameter, at the cost of two
    shuffles per round instead of one. The right choice when the pair
    graph can contain long chains. Fixpoint is detected by an edge-set
    (count, hash-sum) fingerprint, one aggregate per round.

    ``localCheckpoint`` cuts lineage per round in both algorithms so the
    plan does not grow with iterations.

    CONTRACT (r14): the input pair stream is consumed WITHOUT a
    deduplicating exchange, and the star path feeds single-orientation
    edges — any algorithm added here must therefore be insensitive to
    duplicate edges AND to edge orientation (both current algorithms are:
    per-node minima cannot change under duplicates, ``_large_star``
    symmetrizes internally, ``_small_star`` re-orients with
    greatest/least). An algorithm without that property must re-add its
    own ``.distinct()``/symmetrization over ``base``.
    """
    import warnings

    if algorithm not in ("label", "star"):
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    ca, cb = pair_cols
    base = pairs.select(F.col(ca).alias("src"), F.col(cb).alias("dst"))
    # r14 (guide §2.4): the pre-r14 shape ran `.distinct()` over the
    # symmetrized union — a full edge-stream Exchange + two-phase aggregate
    # that discovers nothing when the pairs are already unique (every
    # operator feeding this — minhash/jaccard/cosine pairs — emits distinct
    # pairs with id_a < id_b, so the two union legs are disjoint). Both
    # algorithms are duplicate-INSENSITIVE anyway: label propagation and the
    # star steps only take per-node minima (duplicates cannot change a min),
    # each star round ends in its own `.distinct()`, and a duplicate-bearing
    # initial edge set costs the star loop at most one extra round before
    # the checksum fixpoint — never a different output. The star path also
    # drops the orientation union entirely: `_large_star` symmetrizes
    # internally and `_small_star` re-orients with greatest/least, so a
    # single-orientation edge set halves the checkpointed rows AND the
    # first round's group/join volume. Label propagation keeps both
    # orientations (its labels table and dst->src min joins need every
    # node on the src side).
    # materialize once: every round joins edges, and without the cut each
    # round would recompute the entire upstream pair pipeline (MinHash,
    # banding, ...) from scratch
    if algorithm == "star":
        edges = base.localCheckpoint(eager=True)
    else:
        edges = base.unionByName(
            pairs.select(F.col(cb).alias("src"), F.col(ca).alias("dst"))
        ).localCheckpoint(eager=True)
    if algorithm == "star":
        e = edges
        prev = _star_edge_checksum(e)
        converged = False
        # Memory headroom for the per-round localCheckpoint (r7 VERDICT
        # item 7: 28M edges OOM'd an 8 GiB single JVM): size the stored
        # partition count by the CURRENT edge count (which the fixpoint
        # checksum already measured — no extra job), so each checkpointed
        # partition stays ~1M edges regardless of graph size, and nudge
        # both GCs each round so the PREVIOUS round's now-unreferenced
        # checkpoint blocks are actually released by ContextCleaner
        # instead of piling up across rounds. On a real cluster the same
        # sizing keeps per-executor checkpoint blocks bounded under
        # executor-memory pressure.
        rows_per_part = 1_000_000
        # sparkContext is a classic-mode handle (raises under Spark Connect,
        # ADVICE r8); it only feeds the GC nudge + a parallelism floor, so
        # fall back to a sane floor without it.
        try:
            sc = pairs.sparkSession.sparkContext
            min_parts = sc.defaultParallelism
        except Exception:
            sc = None
            min_parts = 32
        from pyspark import StorageLevel

        # Per-round storage decisions, recorded for operational telemetry
        # and so the 4M-edge regression test can assert the SERIALIZED
        # branch actually executed (r8 VERDICT item 6) — the one-shot 8 GiB
        # probe (scripts/star_memory_probe.py) stays the full-scale check.
        # Accumulated locally; published to LAST_STAR_RUN only on completion.
        run_stats: dict = {"rounds": 0, "levels": [], "repartitions": []}
        for _ in range(max_iter):
            n_edges = prev[0]
            stepped = _small_star(_large_star(e))
            level = None  # default: Disk+Memory DESERIALIZED (fast, fat)
            if n_edges > 4 * rows_per_part:
                # big graph: store the round's checkpoint SERIALIZED (a
                # (long, long) edge row deserialized is ~10x its serialized
                # bytes on the JVM heap — the difference between 28M edges
                # fitting an 8 GiB JVM and OOMing it), and resize so each
                # stored partition stays ~1M edges
                level = StorageLevel.MEMORY_AND_DISK
                if n_edges > rows_per_part * min_parts:
                    parts = int(min(8192, n_edges // rows_per_part + 1))
                    stepped = stepped.repartition(parts)
                    run_stats["repartitions"].append(parts)
            run_stats["rounds"] += 1
            run_stats["levels"].append(
                "serialized_mem_and_disk" if level is not None else "default"
            )
            e = stepped.localCheckpoint(eager=True, storageLevel=level)
            if n_edges > 4 * rows_per_part:
                import gc as _gc

                _gc.collect()
                # JVM GC nudge between rounds frees the PREVIOUS round's
                # dropped checkpoint blocks before the next one allocates.
                # `_jvm` is a private classic-mode attribute that does not
                # exist under Spark Connect (ADVICE r8) — degrade gracefully
                # there; the load-bearing fix is the SERIALIZED storage
                # level above, not this nudge.
                try:
                    if sc is not None:
                        sc._jvm.System.gc()
                except Exception:
                    pass
            cur = _star_edge_checksum(e)
            if cur == prev:
                converged = True
                break
            prev = cur
        if not converged:
            warnings.warn(
                f"dedup_components(algorithm='star') hit max_iter={max_iter} "
                "before the edge set stabilized — component ids may be "
                "unmerged upper bounds. Raise max_iter (rounds needed are "
                "O(log^2 n)).",
                RuntimeWarning,
                stacklevel=2,
            )
        # Atomic publish: a single name rebind, so readers only ever see a
        # complete run's snapshot (never a half-written mix of two runs).
        global LAST_STAR_RUN
        LAST_STAR_RUN = run_stats
        # fixpoint edges form disjoint stars centered on component minima
        out = (
            e.select(F.col("src").alias("node"), F.col("dst").alias("label"))
            .unionByName(
                e.select(F.col("dst").alias("node"), F.col("dst").alias("label"))
            )
            .groupBy("node")
            .agg(F.min("label").alias("component_id"))
            .select(F.col("node").alias(id_col), "component_id")
        )
        if docs is None:
            return out
        d = docs.select(F.col(id_col))
        return d.join(out, id_col, "left").select(
            F.col(id_col),
            F.coalesce("component_id", F.col(id_col)).alias("component_id"),
        )

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                "label",
                F.least("label", F.coalesce("nbr_label", "label")).alias("new_label"),
            )
        ).localCheckpoint(eager=True)
        changed = merged.where(F.col("new_label") != F.col("label")).count()
        labels = merged.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        # a chain-shaped graph of diameter > max_iter exits the loop still
        # merging — never hand back silently-unmerged component ids
        warnings.warn(
            f"dedup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component ids are unmerged "
            "upper bounds. Raise max_iter, or pass algorithm='star' "
            "(large-star/small-star, diameter-independent) if the pair "
            "graph has long chains.",
            RuntimeWarning,
            stacklevel=2,
        )
    out = labels.select(F.col("node").alias(id_col), F.col("label").alias("component_id"))
    if docs is None:
        return out
    d = docs.select(F.col(id_col))
    return d.join(out, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component_id", F.col(id_col)).alias("component_id"),
    )


# ------------------------------------------------- exact span-level dedup


def _token_windows(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Per-position k-token windows as ``(id, start, h)`` with 1-based
    ``start`` and ``h = xxhash64`` of the space-joined lowercase window.
    One row per window occurrence (NOT distinct — span dedup counts every
    occurrence, unlike the set-semantics shingles of ``_word_ngrams``)."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    wins = F.expr(
        f"""
        transform(sequence(1, size(_t) - {k} + 1),
                  i -> struct(CAST(i AS BIGINT) AS start,
                              xxhash64(array_join(slice(_t, i, {k}), ' ')) AS h))
        """
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") >= k)
        .select("id", F.explode(wins).alias("_w"))
        .select("id", F.col("_w.start").alias("start"), F.col("_w.h").alias("h"))
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans — the detection half of exact
    substring deduplication (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", at fixed k-token granularity instead of
    suffix-array-exact arbitrary lengths).

    A k-token window whose text occurs ``min_count`` or more times anywhere
    in the corpus (same doc included) is *duplicated*; per document,
    overlapping or exactly adjacent duplicated windows merge into maximal
    spans. Output: one row per maximal span,
    ``(doc_id, span_start, span_end, span_tokens, n_windows)`` with 1-based
    inclusive token positions.

    Scale shape: windows carry 8-byte xxhash64 keys (never window strings);
    the duplicate filter is one map-side-combinable aggregate, the
    occurrence join shuffles only hash keys, and the island merge is a lag
    window over *duplicated* occurrences only — the non-duplicated bulk of
    the corpus never reaches the per-doc sort."""
    w = _token_windows(docs, id_col, text_col, k)
    dup = (
        w.groupBy("h")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    occ = w.join(dup, "h").select("id", "start")
    win = Window.partitionBy("id").orderBy("start")
    isl = (
        occ.withColumn("_prev", F.lag("start").over(win))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("start") > F.col("_prev") + k), 1
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(win))
    )
    return (
        isl.groupBy("id", "_isl")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + F.lit(k - 1)).alias("span_end"),
            F.count("*").cast("bigint").alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("bigint")
            .alias("span_tokens"),
            "n_windows",
        )
    )


def strip_duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact span-level dedup with first-occurrence-wins semantics: every
    token covered by a duplicated k-token window whose earliest (minimal
    ``doc_id``) occurrence lives in ANOTHER document is dropped; the
    owning document keeps all its occurrences (including its own internal
    repeats — ownership is per window text, not per occurrence).

    Output is total over documents with >= 1 token — one row per doc,
    ``(doc_id, n_tokens, n_dropped, clean_md5)`` where ``clean_md5``
    checksums the kept tokens re-joined with single spaces (the empty
    string when everything was dropped), mirroring ``line_dedup``'s
    reassembly contract.

    Scale shape: two corpus scans (doc token arrays, window aggregate) and
    ONE data-sized join keyed by doc — the per-token stream is never
    exploded or shuffled. Covered positions are aggregated per doc from the
    FOREIGN duplicated occurrences only (rows proportional to the
    duplicated portion of the corpus, k positions flattened in array land),
    and the kept text is rebuilt in place with array_except over the
    position range, so the corpus token payload crosses the network at most
    once (not at all when the coverage side broadcasts)."""
    docs = ensure_min_parallelism(docs, id_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("_t")).where(
        F.size("_t") >= 1
    )
    w = _token_windows(docs, id_col, text_col, k)
    stats = (
        w.groupBy("h")
        .agg(F.count("*").alias("_c"), F.min("id").alias("_owner"))
        .where(F.col("_c") >= 2)
        .select("h", "_owner")
    )
    foreign = w.join(stats, "h").where(F.col("id") > F.col("_owner")).select("id", "start")
    cov = foreign.groupBy("id").agg(
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.collect_list("start"),
                    lambda s: F.sequence(s, s + F.lit(k - 1)),
                )
            )
        ).alias("_cov")
    )
    # every covered position is a valid token index (window starts satisfy
    # start + k - 1 <= n_tokens), so n_dropped = |cov| and the kept tokens
    # are the position range minus cov, in ascending order (array_except
    # preserves the first array's order).
    kept = F.transform(
        F.array_except(
            F.sequence(F.lit(1).cast("bigint"), F.size("_t").cast("bigint")),
            F.col("_cov"),
        ),
        lambda p: F.element_at(F.col("_t"), p.cast("int")),
    )
    return (
        base.join(cov, "id", "left")
        .withColumn(
            "_cov", F.coalesce(F.col("_cov"), F.expr("CAST(array() AS array<bigint>)"))
        )
        .select(
            F.col("id").alias(id_col),
            F.size("_t").cast("bigint").alias("n_tokens"),
            F.size("_cov").cast("bigint").alias("n_dropped"),
            F.md5(F.array_join(kept, " ")).alias("clean_md5"),
        )
    )


def span_contamination(
    docs: DataFrame,
    reference: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    broadcast_reference: bool = False,
) -> DataFrame:
    """Span-level contamination detector: for each document, how many of
    its k-token windows appear verbatim ANYWHERE in a reference corpus
    (the held-out-benchmark / already-trained-corpus overlap question, at
    the same window granularity as ``strip_duplicated_spans``).

    Output is total over docs with >= k tokens:
    ``(doc_id, n_windows, n_contaminated, frac)`` with ``frac`` rounded
    to 6 dp.

    ``docs`` may be a STREAMING DataFrame: the reference hash set is
    static, so the pipeline is one stream-static join (8-byte keys) plus a
    per-doc aggregation — batch and stream produce identical rows (see
    tests/test_streaming.py). ``broadcast_reference=True`` forces the
    reference set broadcast; by default Catalyst's size estimate decides
    (a web-scale reference degrades to a shuffle join automatically)."""
    ref = (
        _token_windows(reference, ref_id_col, ref_text_col, k)
        .select("h")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    if broadcast_reference:
        ref = F.broadcast(ref)
    w = _token_windows(docs, id_col, text_col, k).join(ref, "h", "left")
    return (
        w.groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(False)).cast("bigint")).alias(
                "n_contaminated"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_windows"), 6).alias("frac"),
        )
    )


# ------------------------------------------------- incremental dedup (r5c)

def minhash_signature_expr(
    text_col: str, n: int = 2, num_hashes: int = 32, seed: int = 42
):
    """PROJECTION-ONLY MinHash signature column (``array<long>``; null when
    the text has fewer than ``n`` tokens): the zero-shuffle twin of
    :func:`minhash_signatures` — identical shingles, hashes, and permutation
    family, but computed per row with array expressions instead of an
    explode + aggregate. This is what makes the incremental/streaming path
    append-safe: a stream of arriving documents gets signatures without any
    stateful aggregation. (Equality with the aggregate operator is pinned in
    tests.)"""
    import random

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(num_hashes)
    ]
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    grams = F.expr(
        f"""
        array_distinct(transform(
          sequence(1, greatest(0, size(filter(split({text_col}, '\\\\s+'),
                                              t -> length(t) > 0)) - {n - 1})),
          i -> array_join(slice(filter(split({text_col}, '\\\\s+'),
                                       t -> length(t) > 0), i, {n}), ' ')))
        """
    )
    harr = F.transform(
        grams,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % F.lit(MERSENNE_P),
    )
    # ONE fold over the shingle-hash array updating all num_hashes minima at
    # once: the md5 per shingle evaluates exactly once. (The naive
    # array(array_min(transform(harr, ...)) x num_hashes) form re-evaluates
    # harr — and its md5s — once PER PERMUTATION: measured 50s vs ~2s on
    # the sf0.1 incremental-dedup query.)
    ca = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in coeffs
        ]
    )
    init = F.array_repeat(F.lit(MERSENNE_P).cast("long"), num_hashes)
    sig = F.aggregate(
        harr,
        init,
        lambda acc, h: F.zip_with(
            acc, ca, lambda x, c: F.least(x, (h * c["a"] + c["b"]) % F.lit(MERSENNE_P))
        ),
    )
    return F.when(F.size(toks) >= n, sig)


def _band_struct_expr(sig_col: str, num_hashes: int, bands: int):
    rows = num_hashes // bands
    return F.expr(
        f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
        f"concat(cast(b as string), ':', "
        f"array_join(slice({sig_col}, b*{rows}+1, {rows}), ',')) as bucket))"
    )


def minhash_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Corpus-side LSH band index for incremental dedup: one row per
    ``(id, band, bucket)`` with the full signature attached. Build once
    offline, persist (e.g. ``partitionBy('band')``), and every arriving
    shard joins against it — the corpus is never re-scanned per shard."""
    # Batch context: the explode+aggregate operator is WholeStageCodegen'd
    # and ~3x faster than the interpreted higher-order-function projection
    # (HOF lambdas don't codegen); both produce identical signatures.
    base = minhash_signatures(corpus, id_col, text_col, n, num_hashes, seed)
    return base.select(
        "id",
        "signature",
        F.explode(_band_struct_expr("signature", num_hashes, bands)).alias("_b"),
    ).select("id", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"), "signature")


def near_dup_candidates_against(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Append-only near-dup matches of arriving documents against a
    prebuilt :func:`minhash_index`: ``(id, corpus_id, est_jaccard)``.
    Projection + explode + a new-side x index equi-join on (band, bucket)
    — no aggregation over the stream, so ``new_docs`` may be a STREAMING
    DataFrame (stream-static join; the production ingest-dedup shape).

    Batch output is distinct per (id, corpus_id). Streaming output may
    repeat a pair up to ``bands`` times (one per colliding band): a
    streaming ``dropDuplicates`` would carry UNBOUNDED state, so the
    bounded duplication is left to the consumer to collapse per
    micro-batch / in the sink."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    if new_docs.isStreaming:
        # append-safe projection signature (no stateful aggregation)
        signed = new_docs.select(
            F.col(id_col).alias("id"),
            minhash_signature_expr(text_col, n, num_hashes, seed).alias("_sig"),
        )
    else:
        # batch: the codegen'd explode+aggregate path (see minhash_index)
        signed = minhash_signatures(
            new_docs, id_col, text_col, n, num_hashes, seed
        ).select("id", F.col("signature").alias("_sig"))
    banded = (
        signed
        .where(F.col("_sig").isNotNull())
        .select(
            "id",
            "_sig",
            F.explode(_band_struct_expr("_sig", num_hashes, bands)).alias("_b"),
        )
        .select("id", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"), "_sig")
    )
    j = banded.join(corpus_index, ["band", "bucket"]).select(
        banded["id"].alias("id"),
        corpus_index["id"].alias("corpus_id"),
        banded["_sig"].alias("_sa"),
        corpus_index["signature"].alias("_sb"),
    )
    est = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)
    ) / F.lit(float(num_hashes))
    out = j.where(est >= threshold).select(
        "id", "corpus_id", F.round(est, 6).alias("est_jaccard")
    )
    if new_docs.isStreaming:
        # distinct over a stream is stateful with UNBOUNDED state (every
        # pair ever seen, forever) — the exact failure watermarked dedup
        # exists to prevent. A pair colliding in b bands appears at most b
        # times; consumers drop duplicates downstream (per micro-batch or
        # in the sink), which is bounded and honest.
        return out
    return out.dropDuplicates(["id", "corpus_id"])


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    seed: int = 42,
    corpus_index: DataFrame | None = None,
    corpus_digests: DataFrame | None = None,
) -> DataFrame:
    """Incremental dedup verdict for an arriving shard against an existing
    corpus — the corpus-update question every training-data pipeline asks
    per ingest batch. Per new document:

    - ``is_exact_dup``: its md5 content digest already exists in the corpus
      (distinct-digest left join — the corpus side reduces to 16-byte
      digests, the :func:`exact_dedup` scale contract);
    - ``near_dup_of`` / ``est_jaccard``: the best MinHash-LSH match at or
      above ``threshold`` (tie-break pinned ``(est DESC, corpus_id ASC)``;
      estimates are exact multiples of 1/num_hashes, so the rank is
      bit-deterministic), null when none.

    Pass a prebuilt ``corpus_index`` (:func:`minhash_index`) AND
    ``corpus_digests`` (distinct ``md5(text)`` values, e.g. persisted next
    to the index) to skip BOTH corpus passes — the persisted-index
    deployment where arriving shards never re-scan the corpus."""
    digests = (
        corpus_digests.select(F.col(corpus_digests.columns[0]).alias("_dg"))
        if corpus_digests is not None
        else corpus.select(F.md5(F.col(text_col)).alias("_dg")).distinct()
    )
    if corpus_index is None:
        corpus_index = minhash_index(
            corpus, id_col, text_col, n, num_hashes, bands, seed
        )
    cand = near_dup_candidates_against(
        new_docs, corpus_index, id_col, text_col, n, num_hashes, bands, threshold, seed
    )
    from pyspark.sql import Window as _W

    best = (
        cand.withColumn(
            "_rk",
            F.row_number().over(
                _W.partitionBy("id").orderBy(
                    F.col("est_jaccard").desc(), F.col("corpus_id").asc()
                )
            ),
        )
        .where(F.col("_rk") == 1)
        .select(
            F.col("id"),
            F.col("corpus_id").alias("near_dup_of"),
            "est_jaccard",
        )
    )
    out = (
        new_docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("_dg"))
        .join(digests.withColumn("_hit", F.lit(True)), "_dg", "left")
        .select("id", F.coalesce(F.col("_hit"), F.lit(False)).alias("is_exact_dup"))
        .join(best, "id", "left")
    )
    return out.select(
        F.col("id").alias(id_col), "is_exact_dup", "near_dup_of", "est_jaccard"
    )


def near_dup_components(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    seed: int = 42,
    algorithm: str = "star",
    exact_first: bool = True,
) -> DataFrame:
    """Corpus -> near-dup component labels, the end-to-end entry point.

    ``exact_first=True`` (the default since r8) runs the digest-collapse
    ordering (``near_dup_components_grouped``): collapse exact twins to one
    representative per content digest BEFORE LSH banding, so the candidate
    join never squares with the duplication factor — output proven identical
    to the direct composition (shared oracle + planted-twin parity tests),
    measured 62x faster at the 100x twin fixture. ``exact_first=False`` opts
    out to the direct ``minhash_dedup_pairs -> dedup_components`` pipeline
    (useful when the corpus is known exact-dup-free and the extra digest
    shuffle buys nothing)."""
    if exact_first:
        return near_dup_components_grouped(
            docs, id_col, text_col, n, num_hashes, bands, threshold, seed, algorithm
        )
    pairs = minhash_dedup_pairs(docs, id_col, text_col, n, num_hashes, bands, threshold, seed)
    return dedup_components(pairs, docs=docs, id_col=id_col, algorithm=algorithm)


def near_dup_components_grouped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    seed: int = 42,
    algorithm: str = "star",
) -> DataFrame:
    """Near-dup components with the EXACT-DEDUP-FIRST ordering — the
    production pipeline shape the r7 100x rehearsal measured into
    existence: running MinHash banding directly on a corpus with exact-
    twin groups explodes the candidate join by the SQUARE of the group
    size (measured: 100 twins per doc -> 85,228x the pairs, the whole
    join cost). Here the corpus first collapses to one representative per
    content digest (16-byte shuffle, the ``exact_dedup`` contract), LSH
    banding + components run over REPRESENTATIVES only, and members
    re-attach through their digest at the end.

    Output ``(doc_id, component_id)`` over the WHOLE corpus, with
    ``component_id`` = the smallest doc id in the component — IDENTICAL
    to ``dedup_components(minhash_dedup_pairs(docs), docs)`` for any
    ``threshold <= 1.0``: a MinHash signature is a pure function of the
    text, so every exact twin shares its representative's signature,
    every twin pair estimates jaccard 1.0 >= threshold (same component),
    and every cross-group pair has the same estimate through any of its
    members (same connectivity). Docs whose text yields NO shingles
    (fewer than ``n`` tokens, empty, or NULL) are forced singletons —
    the direct path gives them no pairs AT ALL, not even with exact
    twins, so collapsing them by digest would merge what the direct path
    leaves apart. The equality is pinned by a pytest parity test on a
    planted-twin corpus (including shingle-less twins); the 100x fixture
    runs ~2 orders of magnitude less join work."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    flagged = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col),
        # coalesce: size() of a NULL text is NULL, and NULL falls through
        # BOTH a `where(_sh)` and a `where(~_sh)` — the NULL-text doc
        # would silently vanish from the output instead of going the
        # singleton route
        F.coalesce(F.size(toks) >= n, F.lit(False)).alias("_sh"),
    )
    base = flagged.where("_sh").select("id", F.md5(F.col(text_col)).alias("_dg"))
    groups = base.groupBy("_dg").agg(F.min("id").alias("rep"))
    reps = (
        groups.join(
            docs.select(F.col(id_col).alias("rep"), F.col(text_col)), "rep"
        )
        # materialize: the rep table feeds signatures AND the member
        # re-attach; without the cut both legs re-derive the digest agg
        .localCheckpoint()
    )
    rep_pairs = minhash_dedup_pairs(
        reps, "rep", text_col, n, num_hashes, bands, threshold, seed
    )
    rep_comp = dedup_components(
        rep_pairs,
        docs=reps.select(F.col("rep").alias(id_col)),
        id_col=id_col,
        algorithm=algorithm,
    ).select(F.col(id_col).alias("rep"), F.col("component_id").alias("_rc"))
    # members inherit their representative's component; the component id
    # stays the smallest doc id in the component because representatives
    # are per-group minima and components are labeled by min rep
    attached = (
        base.join(reps.select("_dg", "rep"), "_dg")
        .join(rep_comp, "rep")
        .select(F.col("id").alias(id_col), F.col("_rc").alias("component_id"))
    )
    singletons = flagged.where(~F.col("_sh")).select(
        F.col("id").alias(id_col), F.col("id").alias("component_id")
    )
    return attached.unionByName(singletons)
