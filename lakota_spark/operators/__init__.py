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
from lakota_spark.operators.index import with_global_index
from lakota_spark.operators.kv import last_wins, update_zerofill
from lakota_spark.operators.similarity import cosine_topk, knn_join, lsh_ann
from lakota_spark.operators.skew import salted_agg, salted_join
from lakota_spark.operators.text import lang_id, text_stats, token_count_bpe

__all__ = [
    "asof_join",
    "cosine_topk",
    "exact_dedup",
    "jaccard_pairs",
    "knn_join",
    "lang_id",
    "last_wins",
    "lsh_ann",
    "lsh_candidates",
    "minhash_dedup",
    "minhash_signatures",
    "salted_agg",
    "salted_join",
    "shingle_table",
    "simhash",
    "simhash_pairs",
    "text_stats",
    "token_count_bpe",
    "update_zerofill",
    "with_global_index",
]
