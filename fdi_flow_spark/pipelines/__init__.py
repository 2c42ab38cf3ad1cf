from fdi_flow_spark.pipelines.clustering import kmeans_embeddings, semantic_dedup_pairs
from fdi_flow_spark.pipelines.curation import (
    hash_split,
    line_dedup,
    pii_redact,
    quota_sample,
    source_mix,
    token_pack,
)
from fdi_flow_spark.pipelines.lm import lm_perplexity
from fdi_flow_spark.pipelines.quantization import (
    cosine_topk_quantized,
    quantize_embeddings,
)
from fdi_flow_spark.pipelines.dedup import (
    dedup_components,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from fdi_flow_spark.pipelines.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_build_index,
    ivf_query_index,
    knn_classify_exact,
)
from fdi_flow_spark.pipelines.text import (
    document_fingerprint,
    language_id,
    text_quality,
    token_counts,
)

__all__ = [
    "dedup_components",
    "hash_split",
    "pii_redact",
    "quota_sample",
    "exact_dedup",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "knn_classify_exact",
    "text_quality",
    "language_id",
    "token_counts",
    "document_fingerprint",
    "kmeans_embeddings",
    "semantic_dedup_pairs",
    "line_dedup",
    "source_mix",
    "lm_perplexity",
    "quantize_embeddings",
    "cosine_topk_quantized",
]
