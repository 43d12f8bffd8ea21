"""Scale probe for the round-8 `leakage_safe_split` query chain
(pairs -> connected components -> cluster-hash split -> report).

Replication suffixes EVERY token with the copy id (regexp), so replicas
of the same doc share ZERO shingles across copies: the near-dup cluster
structure is exactly k independent copies of the original corpus's, and
the expected scaling of the whole chain is ~linear in k (the quadratic
replica-clique shape is the pair pipeline's own probe, done in r5/r8;
this one isolates the components+split layers on a growing but
realistically-sparse dup graph).

Usage: python scripts/probe_leakage_split.py [k1 k2 ...] (default 1 10 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("leakage-split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from lakota_spark.operators import dedup as D
    from lakota_spark.operators.sampling import leakage_safe_split
    from lakota_spark.queries.pipeline import _docs

    base = _docs(spark, SF_DIR)
    n0 = base.count()
    for k in ks:
        copies = spark.range(k).select(F.col("id").alias("_copy"))
        # suffix EVERY token with the copy id: replicas share zero
        # shingles across copies, so the dup graph is k independent
        # copies of the original corpus's (linear-k expected scaling)
        docs = (
            base.crossJoin(copies)
            .select(
                (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
                "lang",
                F.expr(
                    "regexp_replace(text, '(\\\\S+)',"
                    " concat('$1_c', cast(_copy as string)))"
                ).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        best = None
        for _ in range(2 if k < 100 else 1):
            t0 = time.perf_counter()
            # same chain as the query, on the replicated corpus
            pairs = D.minhash_dedup(docs)
            clusters = D.dedup_clusters(pairs)
            split = leakage_safe_split(docs, clusters, val_pct=10)
            out = split.groupBy("split", "lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("cluster_id").alias("n_clusters"),
            )
            rows = out.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        n_val = sum(r.n_docs for r in rows if r.split == "val")
        n_tot = sum(r.n_docs for r in rows)
        print(
            f"k={k:4d} docs={n0 * k:8d}  chain {best:7.2f}s  "
            f"val_frac={n_val / n_tot:.3f}",
            flush=True,
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
