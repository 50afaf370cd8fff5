"""LLM-data-pipeline operators: dedup, similarity search, multimodal."""

from mora_spark.llm.cluster import connected_components
from mora_spark.llm.dedup import (
    build_minhash_index,
    dedup_increment,
    derive_minhash_params,
    exact_dedup,
    load_minhash_family,
    load_minhash_index,
    save_minhash_index,
    write_minhash_family,
    minhash_lsh_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash16,
)
from mora_spark.llm.multimodal import (
    extract_features,
    frame_sample,
    media_from_documents,
)
from mora_spark.llm.simsearch import (
    build_ivf_index,
    ivf_index_add,
    embedding_neardup_pairs,
    ivf_index_topk,
    load_ivf_index,
    save_ivf_index,
    ivf_topk,
    srp_topk,
    with_srp_bucket,
)

__all__ = [
    "connected_components",
    "build_minhash_index",
    "dedup_increment",
    "derive_minhash_params",
    "load_minhash_family",
    "load_minhash_index",
    "save_minhash_index",
    "write_minhash_family",
    "build_ivf_index",
    "ivf_index_add",
    "ivf_index_topk",
    "load_ivf_index",
    "save_ivf_index",
    "exact_dedup",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "simhash16",
    "extract_features",
    "frame_sample",
    "media_from_documents",
    "embedding_neardup_pairs",
    "ivf_topk",
    "srp_topk",
    "with_srp_bucket",
]
