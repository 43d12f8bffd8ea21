"""CDC chunking scale probe: cdc_chunks over the sf0.01 documents
corpus replicated x1/x10/x100 (doc_id re-keyed per replica), noop sink,
best-of-2.

Usage: python scripts/probe_cdc_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators.dedup import cdc_chunks  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


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
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    for mult in (1, 10, 100):
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * n0).alias("doc_id"),
                "text",
            )
            .repartition(32)
            .localCheckpoint()
        )
        out = cdc_chunks(corpus)
        t = best2(
            lambda: out.write.format("noop").mode("overwrite").save()
        )
        n_chunks = out.count()
        print(f"x{mult}: {n0 * mult} docs, {n_chunks} chunks, {t:.2f} s")


if __name__ == "__main__":
    main()
