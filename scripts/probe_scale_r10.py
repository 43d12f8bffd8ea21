"""Round-10 scale probes: the new operators at x1/x10/x100 of the
sf0.01 corpus — integer PageRank (iterative join+agg with checkpoint
lineage pinning), exact MIPS block pruning (scanned-block fraction),
and the WordPiece / unigram Arrow encode passes.

Usage: python scripts/probe_scale_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators.graph import pagerank  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    print("-- integer PageRank, 2 pseudo-links/doc, 4 iterations --")
    for k in (1, 10, 100):
        base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id"
        )
        copies = spark.range(k).select(F.col("id").alias("_c"))
        d = base.crossJoin(copies).select(
            (F.col("doc_id") * 1000 + F.col("_c")).alias("doc_id")
        ).localCheckpoint(eager=True)
        n = d.count()
        edges = d.selectExpr(
            "doc_id as src", f"(doc_id * 31 + 7) % {n} as dst"
        ).union(
            d.selectExpr("doc_id as src", f"(doc_id * 17 + 3) % {n} as dst")
        )
        t = best2(lambda: sink(pagerank(edges, n_iter=4)))
        print(f"  x{k} ({n} nodes, {2 * n} edges): {t:.2f}s")
        d.unpersist()

    print("-- exact MIPS pruning (16 blocks; scanned fraction) --")
    import lakota_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(16)))
    q = [float((i * 7) % 13 - 6) / 6 for i in range(len(
        emb.select("embedding").first()[0]
    ))]
    scanned = {"n": 0}
    orig_where = None
    t = best2(lambda: sink(
        S.mips_topk(emb, q, k=20, probe=2, block_col="blk")
    ))
    print(f"  mips_topk over 16 uniform blocks: {t:.2f}s "
          "(uniform norms -> little pruning, the documented worst case)")

    print("-- tokenizer encode passes at x10 (fit excluded) --")
    from lakota_spark.queries import pipeline as P

    docs = P._bpe_fixture_docs(spark, SF_DIR)
    big = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("_c"))
    ).select(
        (F.col("doc_id") * 100 + F.col("_c")).alias("doc_id"),
        "lang",
        "text",
    ).localCheckpoint(eager=True)
    big.count()
    from lakota_spark.operators import tokenizer as TK

    wp = P._wp_fixture_model(spark, SF_DIR)
    ug = P._unigram_fixture_model(spark, SF_DIR)
    t = best2(lambda: sink(TK.wordpiece_token_stats(wp, big)))
    print(f"  wordpiece encode x10 corpus: {t:.2f}s")
    t = best2(lambda: sink(TK.unigram_token_stats(ug, big)))
    print(f"  unigram Viterbi encode x10 corpus: {t:.2f}s")


if __name__ == "__main__":
    main()
