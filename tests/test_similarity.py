"""Similarity-search pipeline tests: exact near-dup vs a NumPy golden, and
recall of the LSH-bucketed scale path against the exact result."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fdi_flow_spark.pipelines.similarity import (
    cosine_near_dup_lsh,
    cosine_near_dup_pairs,
)
from fdi_flow_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _golden_pairs(emb, threshold):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([list(map(float, r.embedding)) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and S[i, j] >= threshold:
                out.add((int(ids[i]), int(ids[j])))
    return out

def test_near_dup_exact_matches_numpy(spark, emb):
    golden = _golden_pairs(emb, 0.4)
    got = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()}
    assert got == golden
    assert len(golden) > 0  # fixture sanity: threshold chosen to be non-trivial


def test_near_dup_pairs_ordered_and_rounded(spark, emb):
    for r in cosine_near_dup_pairs(emb, threshold=0.4).collect():
        assert r.id_a < r.id_b
        assert r.cosine >= 0.4 - 1e-9
        assert r.cosine == round(r.cosine, 6)


def test_near_dup_lsh_recall_and_precision(spark, emb):
    exact = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()}
    approx = {
        (r.id_a, r.id_b) for r in cosine_near_dup_lsh(emb, threshold=0.4).collect()
    }
    # every approx pair is exactly verified -> subset of the exact result
    assert approx <= exact
    # recall with the default 4-plane/8-table family is ~0.75 in expectation;
    # assert a loose floor so seed drift can't flake the suite
    assert len(approx) >= 0.5 * len(exact)


def test_near_dup_empty_input(spark, emb):
    none = emb.where(F.col("vec_id") < 0)
    assert cosine_near_dup_pairs(none, threshold=0.4).count() == 0


def test_cosine_topk_lsh_recall(spark, emb):
    from fdi_flow_spark.pipelines.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    q = emb.where(F.col("vec_id") % 25 == 0)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(q, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in cosine_topk_lsh(q, emb, k=5).collect()
    }
    # retuned 4-plane x 8-table family measures ~0.74 recall@5 here; the
    # floor leaves margin so plane-count regressions fail but seed drift
    # cannot flake (the old 6x4 default measured 0.16 — well below)
    assert len(exact & approx) / len(exact) >= 0.5


def test_cosine_topk_ivf_recall(spark, emb):
    from fdi_flow_spark.pipelines.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    q = emb.where(F.col("vec_id") % 25 == 0)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(q, emb, k=5).collect()
    }
    approx_df = cosine_topk_ivf(q, emb, k=5, nlist=32, nprobe=8)
    approx = {(r.query_id, r.neighbor_id) for r in approx_df.collect()}
    # probing 8/32 cells scans ~25% of the corpus; spherical clusters put
    # true neighbors in the probed cells far more often than chance — the
    # floor leaves slack for sampling drift without letting a broken
    # assignment (random ~0.25 recall) pass
    assert len(exact & approx) / len(exact) >= 0.5
    # every returned cosine must be exact (rerank is exact scoring)
    joined = {r.query_id: r.rank for r in approx_df.collect()}
    assert all(1 <= rk <= 5 for rk in joined.values())


def _tie_fixture(spark):
    """Adversarial corpus: exact-duplicate vectors (score ties straddling the
    top-k boundary) plus a zero vector (norm clamp path). ids chosen so the
    tie-break (score, neighbor_id ASC) is observable."""
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0], 0),   # dup of 0
        (2, [1.0, 0.0, 0.0], 0),   # dup of 0
        (3, [1.0, 0.0, 0.0], 1),   # dup of 0
        (4, [1.0, 0.0, 0.0], 1),   # dup of 0 — 5-way tie > k
        (5, [0.0, 1.0, 0.0], 1),
        (6, [0.0, 0.0, 0.0], 2),   # zero-norm vector
        (7, [0.6, 0.8, 0.0], 2),
        (8, [-1.0, 0.0, 0.0], 2),
    ]
    return spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>, label long"
    )


def test_topk_tie_break_and_zero_norm_vs_duckdb(spark):
    """cosine_topk_bruteforce on a corpus with duplicate and zero-norm
    embeddings must match a DuckDB oracle that replays the documented
    semantics: norms clamped to 1e-12 (zero vector => cosine ~0, not NaN),
    ties ranked by (cosine DESC, neighbor_id ASC)."""
    import duckdb

    from fdi_flow_spark.pipelines.similarity import cosine_topk_bruteforce

    emb = _tie_fixture(spark)
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in cosine_topk_bruteforce(emb, emb, k=3).collect()
    )
    pdf = emb.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            n AS (SELECT vec_id, v,
                         GREATEST(SQRT(LIST_SUM(LIST_TRANSFORM(v, x -> x*x))), 1e-12) AS nrm
                  FROM e),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     LIST_DOT_PRODUCT(q.v, c.v) / (q.nrm * c.nrm) AS cos
              FROM n q, n c WHERE q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, neighbor_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
                   ROUND(cos, 6) AS cosine
            FROM ranked WHERE rank <= 3
            """
        ).fetchall()
    )
    con.close()
    assert got == want


def test_knn_tie_break_on_duplicates(spark):
    """knn_classify_exact with duplicate train vectors: distance ties must
    resolve by train id ASC, so the vote set (and thus the label) is the one
    the documented semantics pin — ids 0,1,2 (label 0) beat 3,4 (label 1)."""
    from fdi_flow_spark.pipelines.similarity import knn_classify_exact

    emb = _tie_fixture(spark)
    train = emb.where(F.col("vec_id") <= 5)
    test = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], schema="vec_id long, embedding array<double>"
    )
    got = knn_classify_exact(train, test, k=3).collect()
    assert len(got) == 1
    assert got[0].pred_label == 0  # neighbors {0,1,2} by id tie-break


def test_near_dup_zero_norm_no_nan(spark):
    """A zero vector must produce no NaN pairs (clamped cosine ~0 stays
    below any positive threshold)."""
    emb = _tie_fixture(spark)
    rows = cosine_near_dup_pairs(emb, threshold=0.4).collect()
    assert all(not np.isnan(r.cosine) for r in rows)
    assert all(6 not in (r.id_a, r.id_b) for r in rows)


def test_near_dup_collect_guard_raises(spark, emb):
    """strategy='broadcast' must refuse over-threshold corpora with a
    pointer at the scale paths instead of collecting to the driver."""
    with pytest.raises(ValueError, match="blocked"):
        cosine_near_dup_pairs(
            emb, threshold=0.4, max_collect_rows=10, strategy="broadcast"
        )


def test_near_dup_auto_falls_back_to_blocked(spark, emb):
    """strategy='auto' beyond the broadcast cap routes to the block-grid
    exact path — same pairs, no error (the cap is a switch, not a ceiling)."""
    golden = _golden_pairs(emb, 0.4)
    got = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(
            emb, threshold=0.4, max_collect_rows=10, rows_per_block=64
        ).collect()
    }
    assert got == golden


def test_near_dup_blocked_parity_with_broadcast(spark, emb):
    """The block-grid exact path is row-identical (ids AND rounded cosines)
    to the broadcast path, across block counts that force multi-block grids
    and a diagonal-only grid."""
    from fdi_flow_spark.pipelines.similarity import cosine_near_dup_blocked

    base = sorted(
        map(tuple, cosine_near_dup_pairs(emb, threshold=0.4, strategy="broadcast").collect())
    )
    for nb in (1, 7):
        got = sorted(
            map(tuple, cosine_near_dup_blocked(emb, threshold=0.4, n_blocks=nb).collect())
        )
        assert got == base, f"n_blocks={nb}"


def test_near_dup_blocked_zero_norm_and_empty(spark):
    """Blocked path: zero vectors clamp (no NaN pairs), empty corpus gives
    an empty result through the count-derived block path."""
    from fdi_flow_spark.pipelines.similarity import cosine_near_dup_blocked

    emb = _tie_fixture(spark)
    rows = cosine_near_dup_blocked(emb, threshold=0.4, n_blocks=3).collect()
    assert all(not np.isnan(r.cosine) for r in rows)
    assert all(6 not in (r.id_a, r.id_b) for r in rows)
    none = emb.where(F.col("vec_id") < 0)
    assert cosine_near_dup_blocked(none, threshold=0.4).count() == 0


def test_cosine_topk_blocked_parity_with_bruteforce(spark, emb):
    """r8: the bipartite block-grid top-k is row-identical (ranks, ids,
    rounded cosines) to the broadcast bruteforce across block sizes that
    force multi-block grids on both axes."""
    from fdi_flow_spark.pipelines.similarity import (
        cosine_topk_blocked,
        cosine_topk_bruteforce,
    )

    q = emb.where(F.col("vec_id") % 25 == 0)
    want = sorted(map(tuple, cosine_topk_bruteforce(q, emb, k=5).collect()))
    for rpb in (13, 1000):
        got = sorted(
            map(tuple, cosine_topk_blocked(q, emb, k=5, rows_per_block=rpb).collect())
        )
        assert got == want, f"rows_per_block={rpb}"


def test_knn_strategies_identical_and_auto_fallback(spark, emb):
    """r8: knn_classify_exact strategy='blocked' (bipartite grid, no driver
    collect of the test set) equals the broadcast path, for uniform AND
    distance weights; 'auto' beyond the cap falls back instead of raising;
    'broadcast' beyond the cap raises with a pointer."""
    from fdi_flow_spark.pipelines.similarity import knn_classify_exact

    tr = emb.where(F.col("vec_id") % 2 == 0)
    te = emb.where(F.col("vec_id") % 2 == 1)
    for w in ("uniform", "distance"):
        base = sorted(map(tuple, knn_classify_exact(tr, te, k=5, weights=w).collect()))
        blocked = sorted(
            map(
                tuple,
                knn_classify_exact(
                    tr, te, k=5, weights=w, strategy="blocked", rows_per_block=17
                ).collect(),
            )
        )
        assert blocked == base, w
    auto = sorted(
        map(tuple, knn_classify_exact(tr, te, k=5, max_collect_rows=10).collect())
    )
    assert auto == sorted(map(tuple, knn_classify_exact(tr, te, k=5).collect()))
    with pytest.raises(ValueError, match="blocked"):
        knn_classify_exact(tr, te, k=5, strategy="broadcast", max_collect_rows=10)


def test_bipartite_blocked_no_driver_materialization(spark, emb):
    """The bipartite grid must never pull rows to the driver on EITHER
    side: construction (incl. both count-based block sizings) runs with
    collect/toPandas/toLocalIterator forbidden."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from fdi_flow_spark.pipelines.similarity import (
        cosine_topk_blocked,
        cosine_topk_bruteforce,
    )

    def _forbidden(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization in bipartite path")

    q = emb.where(F.col("vec_id") % 25 == 0)
    with mock.patch.object(DataFrame, "collect", _forbidden), mock.patch.object(
        DataFrame, "toPandas", _forbidden
    ), mock.patch.object(DataFrame, "toLocalIterator", _forbidden):
        out = cosine_topk_blocked(q, emb, k=5, rows_per_block=64)
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(map(tuple, cosine_topk_bruteforce(q, emb, k=5).collect()))


def test_blocked_scorer_nan_candidates_rank_last(spark):
    """ADVICE r7: an l2-path candidate with NaN components must rank LAST,
    not poison the vectorized top-k threshold (np.partition picks NaN at the
    kk-th slot -> `<=` drops every candidate for the query in that batch)."""
    from fdi_flow_spark.pipelines.similarity import knn_classify_exact

    rows = [(i, [float(i), float(i)], i % 2) for i in range(8)]
    rows.append((100, [float("nan"), 1.0], 1))  # NaN train vector
    train = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    test = spark.createDataFrame(
        [(200, [0.5, 0.5]), (201, [7.0, 7.0])], "vec_id long, embedding array<double>"
    )
    out = knn_classify_exact(train, test, k=3)
    got = {r.vec_id: r.pred_label for r in out.collect()}
    # every query keeps its full finite neighborhood; the NaN row never wins
    assert set(got) == {200, 201}
    assert got[200] == 0  # neighbors 0,1,2 -> labels 0,1,0
    assert got[201] == 1  # neighbors 7,6,5 -> labels 1,0,1


def test_near_dup_blocked_no_driver_materialization(spark, emb):
    """The blocked path must never pull corpus rows to the driver: plan
    construction (including the count-based block sizing) runs with
    DataFrame.collect / toPandas / toLocalIterator forbidden."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from fdi_flow_spark.pipelines.similarity import cosine_near_dup_blocked

    def _forbidden(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization in blocked path")

    with mock.patch.object(DataFrame, "collect", _forbidden), mock.patch.object(
        DataFrame, "toPandas", _forbidden
    ), mock.patch.object(DataFrame, "toLocalIterator", _forbidden):
        out = cosine_near_dup_blocked(emb, threshold=0.4, rows_per_block=64)
    # executing the plan afterwards still yields the exact pairs
    assert {(r.id_a, r.id_b) for r in out.collect()} == _golden_pairs(emb, 0.4)


def test_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    from fdi_flow_spark.pipelines.similarity import (
        cosine_topk_ivf,
        ivf_build_index,
        ivf_query_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where("vec_id % 50 = 0")
    path = str(tmp_path / "ivf")
    ivf_build_index(emb, path, nlist=16, seed=42)
    got = ivf_query_index(queries, path, k=5, nprobe=4).collect()
    # same quantizer seed/params -> identical results to the in-flight index
    expect = cosine_topk_ivf(queries, emb, k=5, nlist=16, nprobe=4, seed=42).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
    # the probed read must be partition-pruned: the cell filter has to land
    # in the scan's PartitionFilters (inputFiles() ignores pruning, so
    # assert on the physical plan)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivf_query_index(queries, path, k=5, nprobe=4).explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("_cell" in l and "IN" in l.upper() for l in pf), plan


def test_collect_id_matrix_null_id_raises_and_shapes(spark):
    """r9 ADVICE: on the Arrow pull path a null id used to become NaN ->
    int64 garbage; it must raise. Also pin the happy-path reshape and the
    empty-input shape, since post-toArrow errors now propagate instead of
    silently re-running via collect."""
    from fdi_flow_spark.pipelines.similarity import _collect_id_matrix

    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    ids, M = _collect_id_matrix(ok, "vec_id", "embedding")
    assert ids.tolist() == [1, 2] and M.shape == (2, 2) and M[1, 0] == 3.0

    empty = ok.where("vec_id < 0")
    ids0, M0 = _collect_id_matrix(empty, "vec_id", "embedding")
    assert len(ids0) == 0 and M0.shape[0] == 0

    bad = spark.createDataFrame(
        [(None, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="null"):
        _collect_id_matrix(bad, "vec_id", "embedding")
