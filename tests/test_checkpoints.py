"""r15 (r14 VERDICT item 1): deterministic release of per-query
localCheckpoint blocks. The registry wrapper must (a) release the blocks a
query build checkpointed once the NEXT query builds, (b) never release
pinned app-lifetime artifacts (the prebuilt containment index, the shared
exact-dup member map), and (c) leave results bit-identical across the
release boundary."""

from __future__ import annotations

from fdi_flow_spark.core import checkpoints

SF = "/root/testdata/sf0.001"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _persistent(spark):
    return checkpoints._persistent_ids(spark)


def test_next_build_releases_previous_checkpoints(spark):
    from fdi_flow_spark.plans.registry import QUERIES

    # a checkpoint-heavy build: shingle-hash arrays (per-call) + the
    # pinned exact-dup member map
    _noop(QUERIES["ngram_jaccard_pairs"](spark, SF))
    after_heavy = _persistent(spark)
    stale_recorded = set(checkpoints._STATE["stale"])
    assert stale_recorded, "the build should have recorded per-call blocks"
    assert stale_recorded <= after_heavy

    pinned_live = checkpoints._STATE["pinned"] & after_heavy

    # building ANY other registry query must release exactly those blocks
    _noop(QUERIES["dedup_exact"](spark, SF))
    after_light = _persistent(spark)
    assert not (stale_recorded & after_light), (
        "previous build's per-call checkpoint blocks must be unpersisted "
        f"at the next build (leaked: {stale_recorded & after_light})"
    )
    # pinned ids that were live stay persistent
    assert pinned_live <= after_light


def test_results_identical_across_release_boundary(spark):
    from fdi_flow_spark.plans.registry import QUERIES

    first = {
        tuple(r) for r in QUERIES["ngram_jaccard_pairs"](spark, SF).collect()
    }
    _noop(QUERIES["dedup_exact"](spark, SF))  # triggers the release
    again = {
        tuple(r) for r in QUERIES["ngram_jaccard_pairs"](spark, SF).collect()
    }
    assert first == again


def test_pinned_prebuilt_index_survives_release(spark):
    from fdi_flow_spark.plans import registry
    from fdi_flow_spark.plans.registry import QUERIES

    rows1 = {
        tuple(r) for r in QUERIES["containment_probe_prebuilt"](spark, SF).collect()
    }
    app_id = spark.sparkContext.applicationId
    cached = registry._CONTAINMENT_INDEX_CACHE.get((app_id, SF))
    assert cached is not None
    # interleave another build (releases per-call blocks) ...
    _noop(QUERIES["dedup_exact"](spark, SF))
    # ... the cached artifacts' blocks must still be live: the cached
    # index DataFrame is lineage-truncated, so executing it would throw
    # if its blocks had been unpersisted
    index, hot = registry._CONTAINMENT_INDEX_CACHE[(app_id, SF)]
    assert index.count() >= 0 and hot.count() >= 0
    rows2 = {
        tuple(r) for r in QUERIES["containment_probe_prebuilt"](spark, SF).collect()
    }
    assert rows1 == rows2


def test_pinned_scope_excludes_from_stale(spark):
    from pyspark import StorageLevel

    df = spark.range(0, 1000).selectExpr("id", "id * 2 as v")
    with checkpoints.query_build_scope(spark):
        with checkpoints.pinned_scope(spark):
            pinned_df = df.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        unpinned_df = df.selectExpr("id", "v + 1 as v").localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
    assert unpinned_df.count() == 1000
    # the next build scope releases the unpinned block only
    with checkpoints.query_build_scope(spark):
        pass
    live = _persistent(spark)
    assert checkpoints._STATE["pinned"] & live, "pinned block must survive"
    assert pinned_df.count() == 1000
