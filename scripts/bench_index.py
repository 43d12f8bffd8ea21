"""A/B: inline search vs materialized-index search (trigram + BM25 tf).

The inline strategies win one-shot queries (one corpus scan); the
materialized index wins repeated queries (pruned posting lookups).
This measures both at $SPARK_GRAFT_SF_DIR so the claim in
operators/trigram.py / operators/text.py is backed by numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakota_spark.operators.trigram import trigram_index, trigram_search
from lakota_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakota-spark-bench-index")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm

    patterns = ["fast table", "merge batch", "window data", "spark order"]

    t0 = time.perf_counter()
    inline_counts = [
        trigram_search(docs, p).count() for p in patterns
    ]
    t_inline = time.perf_counter() - t0

    tmp = tempfile.mkdtemp(prefix="lakota-trgidx-")
    try:
        t0 = time.perf_counter()
        # partitioned by trigram first byte: searches prune to the probed
        # prefixes (stand-in for bucketed-by-trigram on a cluster)
        (
            trigram_index(docs)
            .withColumn("pfx", F.substring("trigram", 1, 1))
            .write.partitionBy("pfx")
            .parquet(f"file://{tmp}/idx")
        )
        t_build = time.perf_counter() - t0
        idx = spark.read.parquet(f"file://{tmp}/idx").select(
            "trigram", "doc_id"
        )
        t0 = time.perf_counter()
        indexed_counts = [
            trigram_search(docs, p, index=idx).count() for p in patterns
        ]
        t_indexed = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert inline_counts == indexed_counts, (inline_counts, indexed_counts)
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": len(patterns),
        "inline_s": round(t_inline, 3),
        "index_build_s": round(t_build, 3),
        "indexed_search_s": round(t_indexed, 3),
        "counts": inline_counts,
    }))


if __name__ == "__main__":
    main()
