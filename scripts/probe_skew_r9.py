"""Round-9 skew probes (r8 judge ask #6): the round-8 samplers under
the REAL corpus shape — 90% of documents in one language.

1. `contrastive_pairs`: negatives come from ONE window over
   (lang, hash-bucket) shards. With n_buckets fixed at 64 and 90% of
   the corpus in one language, the giant language's shard is
   0.9·N/64 rows — the probe measures whether that shard becomes the
   task-skew bottleneck at ×1/×10/×100 and compares against a uniform
   5-language mix at the same N, plus the auto-scaled bucket count
   (`sampling.contrastive_buckets`).
2. `leakage_safe_split`: the split is a doc_id equi-join + per-row
   hash of cluster_id — structurally skew-free in lang (lang unused)
   but the probe feeds a HOT CLUSTER (one cluster holding half the
   mapped docs) to confirm the join key (doc_id, unique) not the
   cluster key carries the shuffle.

Methodology: replicate the sf0.01 documents corpus with fresh doc_ids
(text unchanged), re-tag lang per scenario, noop-sink each plan,
best-of-2. Results → NOTES.md probe table.

Usage: python scripts/probe_skew_r9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.functions import hash32  # noqa: E402
from lakota_spark.operators.sampling import (  # noqa: E402
    contrastive_buckets,
    contrastive_pairs,
    leakage_safe_split,
)
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(spark, k: int, skewed: bool):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(k).select(F.col("id").alias("_copy"))
    out = docs.crossJoin(copies).select(
        (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
        "source",
        "lang",
        "text",
    )
    if skewed:
        out = out.withColumn(
            "lang",
            F.when(
                F.pmod(hash32(F.col("doc_id").cast("string")), F.lit(10))
                < 9,
                F.lit("en"),
            ).otherwise(F.col("lang")),
        )
    return out.localCheckpoint(eager=True)


def timed(df, label):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s")
    return best


def main():
    spark = get_spark("probe-skew-r9")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 10, 100):
        for skewed in (False, True):
            docs = replicate(spark, k, skewed)
            n = docs.count()
            tag = "skew90" if skewed else "uniform"
            # tiny verified-pair relation (the realistic shape: pair
            # graph sparse next to the corpus)
            pairs = docs.select("doc_id").limit(2000).select(
                F.col("doc_id").alias("doc_a"),
                (F.col("doc_id") + 1).alias("doc_b"),
            )
            timed(
                contrastive_pairs(docs, pairs),
                f"contrastive k={k} {tag} n={n} buckets=64",
            )
            nb = contrastive_buckets(n)
            if nb != 64:
                timed(
                    contrastive_pairs(docs, pairs, n_buckets=nb),
                    f"contrastive k={k} {tag} n={n} buckets={nb} (auto)",
                )
            # hot cluster: half the mapped docs share cluster 0
            clusters = docs.select("doc_id").limit(max(n // 2, 1)).select(
                "doc_id",
                F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit(0))
                .otherwise(F.col("doc_id"))
                .alias("cluster_id"),
            )
            timed(
                leakage_safe_split(docs, clusters),
                f"leakage_split k={k} {tag} n={n} hot-cluster",
            )
            docs.unpersist()


if __name__ == "__main__":
    main()
