"""End-to-end DEPLOYMENT-SHAPE curation over a streaming shard ingest
(r11, r10 VERDICT stretch item 8).

Phase 1 (OFFLINE, once per reference snapshot) fits every artifact:
  - corpus digest table            (exact-dedup flag; text.clean_docs first)
  - NB quality model               (quality_model.nb_quality_fit)
  - DSIR importance model          (selection.dsir_fit)
  - bigram LM + perplexity cutoffs (lm.perplexity_cutoffs; CCNet shape)
  - LSH band index                 (dedup.minhash_index)
  - k-means centroids              (clustering.kmeans_fit)

Phase 2 (ONLINE) runs arriving shards as Structured Streaming queries
against the STATIC artifacts — three parallel stream stages, which is how
a production ingest splits them (each stage is one stateful shape; see
curation.curation_deploy_score's docstring for why they cannot share a
single streaming aggregation):
  A. text scoring:   curation.curation_deploy_score — cleanup -> token
     gate -> dup flag -> NB + DSIR + LM perplexity in ONE aggregation ->
     head/middle/tail bucket vs the static cutoffs ('unknown' for
     languages the fit never saw).
  B. near-dup flag:  dedup.near_dup_candidates_against — stream-static
     join on the prebuilt band index, no stream-side aggregation.
  C. embedding legs: clustering.kmeans_assign over the shard's vectors
     (pure Arrow projection, append mode).
  D. containment probe: streaming.streaming_containment_probe — is the
     arriving doc mostly LIFTED from the corpus (subset-clone /
     contamination)? foreachBatch over the persisted containment index,
     batch_id-partition idempotent sink.

Every stage has a batch==stream parity test (tests/test_streaming.py);
the composed text stage is oracle-backed as the `curation_deploy`
registry query. Run:

    python examples/curation_deploy.py

Uses the driver-generated testdata at /root/testdata/sf0.001.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from fdi_flow_spark.core.session import get_spark

    spark = get_spark(app_name="fdi-flow-spark-curation-deploy", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    from fdi_flow_spark.pipelines.clustering import kmeans_assign, kmeans_fit
    from fdi_flow_spark.pipelines.curation import curation_deploy_score
    from fdi_flow_spark.pipelines.dedup import (
        containment_index,
        minhash_index,
        near_dup_candidates_against,
    )
    from fdi_flow_spark.streaming import streaming_containment_probe
    from fdi_flow_spark.pipelines.lm import perplexity_cutoffs
    from fdi_flow_spark.pipelines.quality_model import nb_quality_fit
    from fdi_flow_spark.pipelines.selection import dsir_fit
    from fdi_flow_spark.pipelines.text import clean_docs
    from fdi_flow_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")

    # ---------------- Phase 1: fit the offline artifacts on the snapshot
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    digests = (
        clean_docs(corpus.select("doc_id", "text"))
        .select(F.md5("text").alias("digest"))
        .distinct()
        .localCheckpoint()
    )
    nb_model = nb_quality_fit(
        corpus.withColumn("is_en", F.col("lang") == "en"), "is_en"
    ).localCheckpoint()
    dsir_model = dsir_fit(
        corpus, corpus.where(F.col("source") == "src0")
    ).localCheckpoint()
    cutoffs = perplexity_cutoffs(corpus).localCheckpoint()
    band_index = minhash_index(corpus).localCheckpoint()
    centroids = kmeans_fit(emb.where(F.col("vec_id") % 3 == 0), k=8)
    c_index, c_hot = containment_index(corpus)
    print(f"artifacts: {digests.count()} digests, {nb_model.count()} NB rows, "
          f"{dsir_model.count()} DSIR rows, {cutoffs.count()} lang cutoffs, "
          f"{band_index.count()} band-index rows, centroids {centroids.shape}, "
          f"containment index {c_index.count()} rows (+{c_hot.count()} hot)")

    # ---------------- Phase 2: stream the arriving shards against them
    root = tempfile.mkdtemp(prefix="curation_deploy_")
    try:
        shard_dir = os.path.join(root, "shards")
        vec_dir = os.path.join(root, "vecs")
        arriving = docs.where(F.col("doc_id") % 3 != 0).select(
            "doc_id", "text", "lang"
        )
        # two shard files -> two micro-batch triggers
        arriving.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(shard_dir)
        arriving.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(shard_dir)
        emb.where(F.col("vec_id") % 3 != 0).coalesce(1).write.parquet(vec_dir)

        shard = (
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(shard_dir)
        )
        vecs = spark.readStream.schema(emb.schema).parquet(vec_dir)

        # A. composed text scoring: one stateful aggregation, complete mode
        qa = (
            curation_deploy_score(
                shard, digests, nb_model, dsir_model, corpus, cutoffs
            )
            .writeStream.format("memory").queryName("deploy_scores")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        # B. near-dup flag vs the prebuilt LSH index: append, no state
        qb = (
            near_dup_candidates_against(shard, band_index)
            .writeStream.format("memory").queryName("deploy_neardup")
            .outputMode("append").trigger(availableNow=True).start()
        )
        # C. cluster assignment of the shard's embeddings: append
        qc = (
            kmeans_assign(vecs, centroids)
            .writeStream.format("memory").queryName("deploy_clusters")
            .outputMode("append").trigger(availableNow=True).start()
        )
        # D. containment probe vs the persisted index: foreachBatch with
        # a batch_id-partition idempotent parquet sink
        cidx_p = os.path.join(root, "c_index")
        chot_p = os.path.join(root, "c_hot")
        c_index.write.parquet(cidx_p)
        c_hot.write.parquet(chot_p)
        probe_out = os.path.join(root, "probe_out")
        qd = streaming_containment_probe(
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1).parquet(shard_dir)
            .select("doc_id", "text"),
            cidx_p, chot_p, probe_out,
        )
        for q in (qa, qb, qc, qd):
            q.awaitTermination(180)

        scores = spark.table("deploy_scores")
        print("\nA. text scoring (one row per surviving doc):")
        scores.orderBy("doc_id").show(5, truncate=False)
        print("bucket mix:", sorted(
            (r["bucket"], r["count"])
            for r in scores.groupBy("bucket").count().collect()
        ))
        nd = spark.table("deploy_neardup").dropDuplicates(["id", "corpus_id"])
        print(f"B. near-dup candidates vs index: {nd.count()} pairs")
        cl = spark.table("deploy_clusters")
        print("C. cluster sizes:", sorted(
            (r["cluster"], r["count"])
            for r in cl.groupBy("cluster").count().collect()
        ))
        try:
            probed = spark.read.parquet(probe_out)
            print(f"D. containment probe: {probed.count()} arriving->corpus "
                  f"subset-clone candidates")
        except Exception:
            print("D. containment probe: no matches emitted (empty sink)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
