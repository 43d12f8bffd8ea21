"""10x/100x scale probes for the round-6 operators (r6 verdict ask #6):
contamination_overlap, dsir_importance, ccnet_buckets.

Methodology (the r5 span-clip probe's): replicate the sf0.01 documents
corpus with fresh doc_ids (text unchanged, so per-doc match/token rates
stay constant and runtime growth isolates corpus-size scaling), force
each plan through the noop sink, best-of-2. ccnet additionally runs a
SKEWED-lang variant (90% 'en' — the realistic one-giant-partition case
for the per-lang ntile window) against the natural distribution.

Usage: python scripts/probe_scale_r7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(docs, k: int, skew_en: bool = False):
    """k copies with unique doc_ids; optionally force a skewed lang mix
    (90% en) via a deterministic hash of the new id."""
    copies = docs.sparkSession.range(k).select(
        F.col("id").alias("_copy")
    )
    out = docs.crossJoin(copies).select(
        (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
        "text",
        "lang",
    )
    if skew_en:
        out = out.withColumn(
            "lang",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 9, F.lit("en")
            ).otherwise(F.col("lang")),
        )
    return out.localCheckpoint(eager=True)


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    spark = get_spark("probe-scale-r7")
    spark.sparkContext.setLogLevel("ERROR")
    from lakota_spark.operators.sampling import (
        contamination_overlap,
        importance_weights,
    )
    from lakota_spark.operators import text as T
    from lakota_spark.sources import read_parquet
    from pyspark.sql import Window

    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    bench = docs.where(F.col("doc_id") % 97 == 0).localCheckpoint(
        eager=True
    )
    base = docs.where(F.col("doc_id") % 97 != 0)

    def ccnet(corpus):
        scored = T.unigram_lm_scores(corpus).join(
            corpus.select("doc_id", "lang"), "doc_id"
        )
        w = Window.partitionBy("lang").orderBy(
            F.col("avg_logprob").desc(), "doc_id"
        )
        return (
            scored.withColumn("bucket", F.ntile(3).over(w).cast("long"))
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    print(f"base corpus: {base.count()} docs, bench: {bench.count()}")
    rows = []
    for k in (1, 10, 100):
        corpus = replicate(base, k)
        n = corpus.count()
        t_cont = timed(contamination_overlap(corpus, bench, n=4))
        t_dsir = timed(
            importance_weights(
                corpus, target_filter=(F.col("lang") == "en")
            )
        )
        t_ccnet = timed(ccnet(corpus))
        corpus_skew = replicate(base, k, skew_en=True)
        t_ccnet_skew = timed(ccnet(corpus_skew))
        rows.append((k, n, t_cont, t_dsir, t_ccnet, t_ccnet_skew))
        print(
            f"x{k:<3} ({n:>6} docs): contamination {t_cont:6.2f}s  "
            f"dsir {t_dsir:6.2f}s  ccnet {t_ccnet:6.2f}s  "
            f"ccnet-skew90 {t_ccnet_skew:6.2f}s"
        )
    r1, r100 = rows[0], rows[-1]
    for name, i in (
        ("contamination", 2),
        ("dsir", 3),
        ("ccnet", 4),
        ("ccnet-skew", 5),
    ):
        print(
            f"{name}: 100x data -> {r100[i] / r1[i]:.1f}x time "
            f"(linear would be <=100x incl. fixed overhead amortizing)"
        )


if __name__ == "__main__":
    main()
