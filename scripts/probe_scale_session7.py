"""10x/100x scale probes for the round-7 session-7 operators: the
learned quality classifier (12-iteration class-balanced GD fit,
score+confusion, Pareto sampling), the Stupid-Backoff bigram LM (its
bigram count relation grows with corpus — the interesting term), and
the power-iteration PCA fit + projection.

Methodology (the r5 span-clip probe's): replicate the sf0.01 documents
corpus with fresh doc_ids (text and the source-derived labels unchanged,
so class balance and per-doc token stats stay constant and runtime growth
isolates corpus-size scaling), force each plan through the noop sink (fit
is driver-terminated by construction, so it is wall-timed directly),
best-of-2.

Expected shapes: fit cost = n_iter × (one pass over the checkpointed
feature relation + two bounded collects) — linear in corpus with a large
fixed job-count term; score = one broadcast join + two partial-agg
groupBys — linear.

Usage: python scripts/probe_scale_session7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators import classifier as C  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(aug, k: int):
    copies = aug.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        aug.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            "y",
            "text",
        )
        .localCheckpoint(eager=True)
    )


def timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 2)


def main() -> None:
    spark = get_spark("probe-scale-s7")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("y"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("source") == "src0", F.lit(C.QUALITY_MARKER)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )

    print(f"corpus: {SF_DIR} x1/x10/x100")
    for k in (1, 10, 100):
        corp = replicate(aug, k)
        n = corp.count()

        t_fit0 = time.perf_counter()
        model = C.quality_classifier_fit(
            corp, "y", n_features=64, n_iter=12, lr=1.0 / 8192
        )
        t_fit = round(time.perf_counter() - t_fit0, 2)

        def run_score():
            (
                corp.select("doc_id", F.col("y").alias("label"))
                .join(C.quality_classifier_scores(model, corp), "doc_id")
                .groupBy("label", "pred")
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def run_pareto():
            scored = C.quality_classifier_scores(model, corp).select(
                "doc_id",
                C.fast_sigmoid(F.col("score_raw") * F.lit(8)).alias("prob"),
            )
            (
                C.pareto_quality_sample(scored)
                .groupBy("keep")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def run_bigram():
            from lakota_spark.operators.text import bigram_lm_scores

            bigram_lm_scores(corp).write.mode("overwrite").format(
                "noop"
            ).save()

        print(
            f"x{k:<3} docs={n:<7} fit12={t_fit:>7}s "
            f"score={timed(run_score):>6}s pareto={timed(run_pareto):>6}s "
            f"bigram={timed(run_bigram):>6}s"
        )
        corp.unpersist()

    # PCA: replicate embeddings (fresh vec_ids), fit + project
    from lakota_spark.operators.clustering import pca_power_fit, pca_project

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    for k in (1, 10, 100):
        copies = spark.range(k).select(F.col("id").alias("_copy"))
        e = (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") * 1000 + F.col("_copy")).alias("vec_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )
        n = e.count()
        t0 = time.perf_counter()
        mean, v = pca_power_fit(e, iters=2)
        t_fit = round(time.perf_counter() - t0, 2)

        def run_proj():
            pca_project(e, mean, v).write.mode("overwrite").format(
                "noop"
            ).save()

        print(
            f"x{k:<3} vecs={n:<7} pca_fit2={t_fit:>6}s "
            f"project={timed(run_proj):>6}s"
        )
        e.unpersist()


if __name__ == "__main__":
    main()
