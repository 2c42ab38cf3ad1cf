"""Embedding clustering + SemDeDup (pipelines/clustering.py) and the bigram
LM scorer (pipelines/lm.py)."""

import numpy as np
import pytest

from fdi_flow_spark.pipelines.clustering import kmeans_embeddings, semantic_dedup_pairs
from fdi_flow_spark.pipelines.lm import lm_perplexity


def _blob_df(spark, seed=5, n_per=40, d=8, centers=((0,) * 8, (10,) * 8, (-10,) * 8)):
    rng = np.random.default_rng(seed)
    rows = []
    for ci, c in enumerate(centers):
        pts = rng.normal(0, 0.5, size=(n_per, d)) + np.array(c, dtype=float)
        for j, p in enumerate(pts):
            rows.append((ci * n_per + j, [float(v) for v in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), len(centers)


def _ref_lloyd(X, ids, k, n_iter):
    """NumPy twin of the pinned Lloyd semantics."""
    order = np.argsort(ids)
    cent = X[order[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - cent[None]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = X[a == c].mean(axis=0)
    d2 = ((X[:, None, :] - cent[None]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, np.sqrt(d2[np.arange(len(a)), a])


def test_kmeans_matches_numpy_lloyd_and_is_partition_invariant(spark):
    df, k = _blob_df(spark)
    pdf = df.toPandas().sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    ref_a, ref_d = _ref_lloyd(X, ids, k=k, n_iter=2)

    out = kmeans_embeddings(df, k=k, n_iter=2).toPandas().sort_values("vec_id")
    assert np.array_equal(out["cluster"].to_numpy(), ref_a)
    np.testing.assert_allclose(out["dist"].to_numpy(), np.round(ref_d, 6), atol=2e-6)

    # identical result on a different partitioning (determinism contract)
    out2 = kmeans_embeddings(df.repartition(7), k=k, n_iter=2).toPandas().sort_values("vec_id")
    assert np.array_equal(out["cluster"].to_numpy(), out2["cluster"].to_numpy())

    # well-separated blobs: every blob lands in one cluster
    blobs = np.repeat(np.arange(k), len(X) // k)
    for b in range(k):
        assert len(set(out["cluster"].to_numpy()[blobs == b])) == 1


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only two distinct locations: one init centroid never wins ->
    # its cluster goes empty and must keep the previous centroid (no NaN)
    rows = [(i, [0.0, 0.0]) for i in range(3)] + [(i, [5.0, 5.0]) for i in range(3, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_embeddings(df, k=3, n_iter=2).toPandas()
    assert not out["dist"].isna().any()
    assert set(out["cluster"]) <= {0, 1, 2}


def test_kmeans_k_exceeding_rows_raises(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_embeddings(df, k=5)


def test_semantic_dedup_pairs_within_cluster_only(spark):
    df, k = _blob_df(spark)
    pairs = semantic_dedup_pairs(df, k=k, n_iter=2, threshold=0.99).toPandas()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert (pairs["cosine"] >= 0.99).all()
    # blob members are near-parallel (mean >> noise) -> plenty of pairs,
    # and every pair stays inside one blob
    assert len(pairs) > 100
    blob = lambda i: i // 40  # noqa: E731
    assert (pairs["id_a"].map(blob) == pairs["id_b"].map(blob)).all()


# ------------------------------------------------------------------ LM (r5)


def test_lm_perplexity_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    # bigrams: (<s>,a) x3, (a,b) x2, (a,c) x1 ; c(<s>)=3, c(a)=3 ; V={a,b,c}=3
    lp_sa = math.log(3 + 1) - math.log(3 + 3)
    lp_ab = math.log(2 + 1) - math.log(3 + 3)
    lp_ac = math.log(1 + 1) - math.log(3 + 3)
    avg0 = (lp_sa + lp_ab) / 2
    avg2 = (lp_sa + lp_ac) / 2
    assert out[0]["n_bigrams"] == 2
    assert abs(out[0]["avg_logp"] - round(avg0, 6)) < 1e-9
    assert abs(out[2]["ppl"] - round(math.exp(-avg2), 4)) < 1e-9
    assert out[0]["avg_logp"] == out[1]["avg_logp"]
    # repeated fluent bigram scores better than the rarer one
    assert out[0]["ppl"] < out[2]["ppl"]


def test_lm_perplexity_empty_docs_absent_and_external_model(spark):
    docs = spark.createDataFrame(
        [(0, "x y z"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    out = lm_perplexity(docs).collect()
    assert {r["doc_id"] for r in out} == {0}

    # scoring under an external model: unseen bigrams back off to +1 / V
    import math

    model = spark.createDataFrame([(10, "p q"), (11, "p q")], "doc_id long, text string")
    scored = {r["doc_id"]: r for r in lm_perplexity(docs, model_docs=model).collect()}
    # model: c(<s>,p)=2, c(p,q)=2; c(<s>)=2, c(p)=2; V={p,q}=2
    # doc 0 bigrams (<s>,x),(x,y),(y,z) all unseen; contexts <s> seen, x/y unseen
    lp_sx = math.log(1) - math.log(2 + 2)
    lp_unseen = math.log(1) - math.log(0 + 2)
    want = (lp_sx + 2 * lp_unseen) / 3
    assert abs(scored[0]["avg_logp"] - round(want, 6)) < 1e-9


def test_kn_perplexity_hand_computed(spark):
    """Interpolated KN bigram against a fully hand-derived model: discount
    mass, continuation unigram with the +1 OOV floor, both seen arms."""
    import math

    from fdi_flow_spark.pipelines.lm import kn_perplexity

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in kn_perplexity(df, discount=0.75).collect()}
    # pair counts: (<s>,a)=3, (a,b)=2, (a,c)=1
    # c(<s>)=3 n1f(<s>)=1 ; c(a)=3 n1f(a)=2 ; npairs=3 ; V={a,b,c}=3
    # Pcont: n1b(a)=1, n1b(b)=1, n1b(c)=1 -> each (1+1)/(3+3+1)=2/7
    pc = 2.0 / 7.0
    p_sa = (3 - 0.75) / 3 + 0.75 * 1 / 3 * pc
    p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * pc
    p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * pc
    avg0 = (math.log(p_sa) + math.log(p_ab)) / 2
    avg2 = (math.log(p_sa) + math.log(p_ac)) / 2
    assert out[0]["n_bigrams"] == 2
    assert abs(out[0]["avg_logp"] - round(avg0, 6)) < 1e-9
    assert abs(out[2]["avg_logp"] - round(avg2, 6)) < 1e-9
    assert abs(out[2]["ppl"] - round(math.exp(-avg2), 4)) < 1e-9
    assert out[0]["ppl"] < out[2]["ppl"]


def test_kn_perplexity_backoff_arms_external_model(spark):
    """Unseen context -> pure continuation probability; unseen word ->
    the +1 OOV floor of the continuation distribution. Both arms exact."""
    import math

    from fdi_flow_spark.pipelines.lm import kn_perplexity

    model = spark.createDataFrame(
        [(10, "p q"), (11, "p q")], "doc_id long, text string"
    )
    docs = spark.createDataFrame([(0, "p q"), (1, "x y")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in kn_perplexity(docs, model_docs=model, discount=0.5).collect()
    }
    # model pairs: (<s>,p)=2, (p,q)=2 -> npairs=2, V={p,q}=2
    # Pcont(p) = (1+1)/(2+2+1) = 2/5 ; Pcont(q) = 2/5 ; Pcont(unseen) = 1/5
    # doc 0: both bigrams seen, contexts c=2, n1f=1
    p_sp = (2 - 0.5) / 2 + 0.5 * 1 / 2 * (2 / 5)
    p_pq = (2 - 0.5) / 2 + 0.5 * 1 / 2 * (2 / 5)
    want0 = (math.log(p_sp) + math.log(p_pq)) / 2
    # doc 1: (<s>,x): seen context <s>, unseen word x ->
    #        max(0-.5,0)/2 + .5*1/2 * 1/5 = 1/20
    # (x,y): unseen context -> Pcont(y) = 1/5
    want1 = (math.log(0.5 * 0.5 * 0.2) + math.log(0.2)) / 2
    assert abs(out[0]["avg_logp"] - round(want0, 6)) < 1e-9
    assert abs(out[1]["avg_logp"] - round(want1, 6)) < 1e-9
    # KN orders in-distribution text above OOV text
    assert out[0]["ppl"] < out[1]["ppl"]


def test_kn_discount_validation(spark):
    import pytest as _pt

    from fdi_flow_spark.pipelines.lm import kn_perplexity

    with _pt.raises(ValueError, match="discount"):
        kn_perplexity(None, discount=1.5)


# --------------------------------------------------- quantization/BM25 (r5)


def test_quantize_embeddings_bounds_and_roundtrip(spark):
    from fdi_flow_spark.pipelines.quantization import quantize_embeddings

    rng = np.random.default_rng(3)
    rows = [(i, [float(v) for v in rng.normal(0, 2, 16)]) for i in range(50)]
    rows.append((50, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, vec in rows:
        q, scale = np.array(out[i]["q"]), out[i]["scale"]
        assert np.abs(q).max() <= 127
        x = np.array(np.array(vec, dtype=np.float32), dtype=np.float64)
        if i == 50:
            assert scale == 0.0 and (q == 0).all()
        else:
            # reconstruction error bounded by half a quantization step
            assert np.abs(q * scale - x).max() <= scale / 2 + 1e-12
            # the max-|x| element hits full scale
            assert np.abs(q).max() == 127


def test_quantized_topk_recall_vs_exact(spark):
    """SQ8 cosine top-k must stay close to the float top-k on real
    embeddings: recall@5 >= 0.9 at sf0.001."""
    from fdi_flow_spark.pipelines.quantization import cosine_topk_quantized
    from fdi_flow_spark.pipelines.similarity import cosine_topk_bruteforce
    from fdi_flow_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.where(F.col("vec_id") % 25 == 0)
    exact = cosine_topk_bruteforce(qs, emb, k=5).toPandas()
    quant = cosine_topk_quantized(qs, emb, k=5).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    g = quant.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & g[q]) / 5 for q in e.index]
    assert np.mean(recalls) >= 0.9, recalls


def test_bm25_hand_computed(spark):
    import math

    from fdi_flow_spark.pipelines.text import bm25_rank

    docs = spark.createDataFrame(
        [(0, "cat dog cat"), (1, "dog bird"), (2, "fish fish fish fish")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_rank(docs, ["cat"], k1=1.2, b=0.75, top_n=3).collect()}
    # N=3, df(cat)=1, avgdl=(3+2+4)/3=3; doc0: tf=2, dl=3
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    s0 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    assert abs(out[0]["bm25"] - round(s0, 6)) < 1e-9
    assert out[0]["rank"] == 1
    assert out[1]["bm25"] == 0.0 and out[2]["bm25"] == 0.0
    # zero-score ties break by doc_id
    assert out[1]["rank"] == 2 and out[2]["rank"] == 3


def test_bm25_requires_terms(spark):
    from fdi_flow_spark.pipelines.text import bm25_rank

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        bm25_rank(docs, [])


def test_kn_conditional_distribution_sums_to_one(spark):
    """KN invariant: for every seen context v, P(.|v) sums EXACTLY to 1
    over the seen vocabulary plus one OOV outcome — the discount mass
    D*N1+(v,.)/c(v) is exactly what the continuation distribution
    redistributes ((npairs+V)/(npairs+V+1) seen + 1/(npairs+V+1) OOV)."""
    import math

    rows = [(i, t) for i, t in enumerate(["a b a c", "b a b", "c c a", "a b c a"])]
    # rebuild the count tables exactly as kn_perplexity derives them
    D = 0.75
    bigrams = []
    for _, t in rows:
        toks = ["<s>"] + t.split()
        bigrams += list(zip(toks, toks[1:]))
    from collections import Counter

    c12 = Counter(bigrams)
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (v, w), c in c12.items():
        c1[v] += c
        n1f[v] += 1
        n1b[w] += 1
    npairs = len(c12)
    V = len({w for _, w in c12})

    def pcont(w):
        return (n1b.get(w, 0) + 1) / (npairs + V + 1)

    vocab = sorted({w for _, w in c12})
    for v in c1:
        total = sum(
            max(c12.get((v, w), 0) - D, 0.0) / c1[v]
            + D * n1f[v] / c1[v] * pcont(w)
            for w in vocab
        )
        total += D * n1f[v] / c1[v] * pcont("<OOV>")  # one unseen outcome
        assert abs(total - 1.0) < 1e-12, (v, total)

    # and the Spark operator reproduces the same per-bigram log-probs
    from fdi_flow_spark.pipelines.lm import kn_perplexity

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in kn_perplexity(df, discount=D).collect()}

    def doc_avg(t):
        toks = ["<s>"] + t.split()
        lps = []
        for v, w in zip(toks, toks[1:]):
            p = max(c12.get((v, w), 0) - D, 0.0) / c1[v] + D * n1f[v] / c1[v] * pcont(w)
            lps.append(math.log(p))
        return sum(lps) / len(lps)

    for i, t in rows:
        assert abs(out[i]["avg_logp"] - round(doc_avg(t), 6)) < 1e-9


def test_kn3_perplexity_hand_computed(spark):
    """Order-3 KN against a fully hand-derived model: raw counts at the
    trigram level, continuation counts at the bigram level, continuation
    unigram with +1 OOV floor at the bottom."""
    import math

    from fdi_flow_spark.pipelines.lm import kn3_perplexity

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in kn3_perplexity(df, discount=0.75).collect()}
    # c123: (s,s,a)=2 (s,a,b)=2 (a,b,c)=1 (a,b,d)=1
    # c12: (s,s) 2/1 ; (s,a) 2/1 ; (a,b) 2/2   (total/n1f3)
    # cont2: (s,a)=1 (a,b)=1 (b,c)=1 (b,d)=1
    # c2ctx: s 1/1 ; a 1/1 ; b 2/2             (k2ctx/n1f2)
    # cont1: a=b=c=d=1 ; npairs=4 ; V=4 -> P1 = 2/9 each
    p1 = 2.0 / 9.0
    p2_sa = (1 - 0.75) / 1 + 0.75 * 1 / 1 * p1      # P2(a|s)
    p2_ab = (1 - 0.75) / 1 + 0.75 * 1 / 1 * p1      # P2(b|a)
    p2_bc = (1 - 0.75) / 2 + 0.75 * 2 / 2 * p1      # P2(c|b)
    p3_ssa = (2 - 0.75) / 2 + 0.75 * 1 / 2 * p2_sa
    p3_sab = (2 - 0.75) / 2 + 0.75 * 1 / 2 * p2_ab
    p3_abc = (1 - 0.75) / 2 + 0.75 * 2 / 2 * p2_bc
    want0 = (math.log(p3_ssa) + math.log(p3_sab) + math.log(p3_abc)) / 3
    assert out[0]["n_trigrams"] == 3
    assert abs(out[0]["avg_logp"] - round(want0, 6)) < 1e-9
    assert out[0]["avg_logp"] == out[1]["avg_logp"]  # symmetric corpus


def test_kn3_backoff_chain_all_three_layers(spark):
    """Scoring 'x b c' under the (a b c / a b d) model exercises every
    backoff layer: seen-context+unseen-word (trigram), unseen bigram
    context -> P1, unseen trigram context -> seen P2."""
    import math

    from fdi_flow_spark.pipelines.lm import kn3_perplexity

    model = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
    )
    docs = spark.createDataFrame([(9, "x b c")], "doc_id long, text string")
    out = kn3_perplexity(docs, model_docs=model, discount=0.75).collect()[0]
    p1 = 2.0 / 9.0
    p1_oov = 1.0 / 9.0
    # (s,s,x): (s,s) seen, x unseen at every level
    p2_sx = 0.0 + 0.75 * 1 / 1 * p1_oov
    p3_ssx = 0.0 + 0.75 * 1 / 2 * p2_sx
    # (s,x,b): trigram context (s,x) unseen -> P2(b|x); x unseen ctx -> P1(b)
    p3_sxb = p1
    # (x,b,c): trigram context (x,b) unseen -> P2(c|b) (seen)
    p2_bc = (1 - 0.75) / 2 + 0.75 * 2 / 2 * p1
    want = (math.log(p3_ssx) + math.log(p3_sxb) + math.log(p2_bc)) / 3
    assert out["n_trigrams"] == 3
    assert abs(out["avg_logp"] - round(want, 6)) < 1e-9


def test_perplexity_buckets_tertiles_and_tie_semantics(spark):
    """CCNet bucketing contract (r10): per-language exact tertile cuts on
    the rounded ppl, ties to the better bucket, languages cut
    independently, unscorable docs absent."""
    from fdi_flow_spark.pipelines.lm import perplexity_buckets

    # six distinct-ppl docs per language: buckets must split 2/2/2 with
    # every head ppl <= every middle ppl <= every tail ppl, per lang
    rows = []
    for li, lang in enumerate(("en", "de")):
        base = ["common common", "common filler", "filler filler",
                "rare1 rare2", "rare3 rare4 rare5", "rare6 rare7 rare8 rare9"]
        rows += [(li * 10 + i, f"{t} l{li}", lang) for i, t in enumerate(base)]
    rows.append((99, "   ", "en"))  # unscorable
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df).collect()
    assert all(r["doc_id"] != 99 for r in out)
    for lang in ("en", "de"):
        sub = sorted((r for r in out if r["lang"] == lang), key=lambda r: r["ppl"])
        assert len(sub) == 6
        labels = [r["bucket"] for r in sub]
        assert labels == ["head"] * 2 + ["middle"] * 2 + ["tail"] * 2, labels

    # tie at the cutoff: three docs, two with IDENTICAL text (equal ppl).
    # q(1/3) of [p, p, q] = p, so BOTH tied docs take 'head' (<= semantics)
    tie = spark.createDataFrame(
        [(1, "x y x y", "en"), (2, "x y x y", "en"), (3, "a b c d e", "en")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(tie).collect()}
    assert got[1] == got[2] == "head"


def test_perplexity_buckets_unknown_language_sentinel(spark):
    """Deployment-path contract (r11, per r10 ADVICE): an arriving doc
    whose language has NO row in the offline cutoffs table must be KEPT
    (left join) and labeled with the ``unknown`` sentinel bucket — never
    silently dropped from the stream. Known-language docs are unaffected."""
    from fdi_flow_spark.pipelines.lm import perplexity_buckets, perplexity_cutoffs

    ref = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(
            ["common common", "common filler", "filler filler",
             "rare1 rare2", "rare3 rare4 rare5", "rare6 rare7 rare8"]
        )],
        "doc_id long, text string, lang string",
    )
    cuts = perplexity_cutoffs(ref).localCheckpoint(eager=True)
    arrive = spark.createDataFrame(
        [(100, "common common", "en"), (101, "common filler", "fr")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in perplexity_buckets(arrive, model_docs=ref, cutoffs=cuts).collect()
    }
    assert set(got) == {100, 101}  # the fr doc is kept, not dropped
    assert got[101]["bucket"] == "unknown"
    assert got[101]["ppl"] is not None  # still scored against the static LM
    assert got[100]["bucket"] in ("head", "middle", "tail")


def test_embedding_outliers_flags_far_vector(spark):
    """Planted-outlier contract (r10b): a single far vector in a tight
    k=1 cloud must be the ONLY flagged row; every row is labeled with its
    cluster cutoff; flags compare against the ROUNDED cutoff."""
    import numpy as np

    from fdi_flow_spark.pipelines.clustering import embedding_outliers

    rng = np.random.default_rng(7)
    rows = [(i, (rng.normal(0, 0.1, 8) + 1.0).astype(float).tolist()) for i in range(20)]
    rows.append((99, [25.0] * 8))  # far from the cloud
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_outliers(df, k=1, n_iter=3, z=1.5).collect()}
    assert len(out) == 21
    assert out[99]["is_outlier"]
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1
    # labeled rows carry the shared k=1 cutoff and the flag is consistent
    cut = out[99]["cutoff"]
    for r in out.values():
        assert r["cutoff"] == cut
        assert r["is_outlier"] == (r["dist"] > cut)


def test_semantic_dedup_payload_crosses_one_exchange(spark):
    """r14 optimization pin: semantic_dedup_pairs attaches the cluster label
    with the zero-shuffle assignment projection (kmeans_fit centroids +
    _assign carrying the vector), NOT by re-scanning the source and
    equi-joining the embedding payload on id — the physical plan must hold
    no join at all (the only payload exchange is the groupBy(cluster)
    placement shuffle), and the pairs must match kmeans_embeddings + join
    semantics exactly (same centroids, same argmin)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 8).astype(float).tolist()) for i in range(60)]
    # plant two near-identical vectors so at least one pair crosses 0.95
    rows.append((100, rows[0][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup_pairs(df, k=3, n_iter=2, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert node not in plan, f"payload join leaked back into the plan:\n{plan}"

    got = {(r.id_a, r.id_b): (r.cluster, r.cosine) for r in out.collect()}
    # reference semantics: label via kmeans_embeddings, join, brute-force cosine
    assign = {
        r.vec_id: r.cluster
        for r in kmeans_embeddings(df, k=3, n_iter=2).collect()
    }
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    want = {}
    for a in sorted(vecs):
        for b in sorted(vecs):
            if a < b and assign[a] == assign[b]:
                va, vb = vecs[a], vecs[b]
                c = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12))
                if c >= 0.9:
                    want[(a, b)] = (assign[a], round(c, 6))
    assert set(got) == set(want)
    for key, (cl, cos) in want.items():
        assert got[key][0] == cl
        assert abs(got[key][1] - cos) < 1e-6
