"""Custom relational operators the reference lacks, built Spark-first.

Each operator is a composition of DataFrame primitives (the scalable path);
Pandas UDFs are used only where built-ins genuinely can't express the
semantics (see `multimodal.py`).
"""

from lakota_spark.operators.asof import asof_join
from lakota_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_dedup,
    minhash_signatures,
    shingle_table,
    simhash,
    simhash_pairs,
)
from lakota_spark.operators.clustering import cluster_topic_terms, kmeans_assign
from lakota_spark.operators.dedup import dedup_clusters
from lakota_spark.operators.index import with_global_index
from lakota_spark.operators.kv import last_wins, update_zerofill
from lakota_spark.operators.sampling import (
    contrastive_pairs,
    decontaminate,
    leakage_safe_split,
    pack_sequences,
    stratified_sample,
)
from lakota_spark.operators.similarity import cosine_topk, knn_join, lsh_ann, mmr_topk
from lakota_spark.operators.skew import salted_agg, salted_join
from lakota_spark.operators.text import (
    bm25_scores,
    lang_id,
    pii_scrub,
    pii_stats,
    text_stats,
    token_count_bpe,
)
from lakota_spark.operators.timeseries import gap_fill
from lakota_spark.operators.trigram import trigram_index, trigram_search

__all__ = [
    "asof_join",
    "bm25_scores",
    "contrastive_pairs",
    "cosine_topk",
    "mmr_topk",
    "decontaminate",
    "dedup_clusters",
    "exact_dedup",
    "gap_fill",
    "jaccard_pairs",
    "cluster_topic_terms",
    "kmeans_assign",
    "knn_join",
    "lang_id",
    "last_wins",
    "leakage_safe_split",
    "lsh_ann",
    "lsh_candidates",
    "minhash_dedup",
    "minhash_signatures",
    "pack_sequences",
    "pii_scrub",
    "pii_stats",
    "salted_agg",
    "salted_join",
    "shingle_table",
    "simhash",
    "simhash_pairs",
    "stratified_sample",
    "text_stats",
    "token_count_bpe",
    "trigram_index",
    "trigram_search",
    "update_zerofill",
    "with_global_index",
]
