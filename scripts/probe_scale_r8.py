"""Round-8 scale probes (r7 judge ask #7): the round-7 session-7
additions not yet probed at 100x —

1. `source_overlap_jaccard` under SKEWED group sizes: one giant dump
   holding ~95% of the docs vs uniform groups. The shingle equi-join's
   fan-out per shingle is bounded by n_groups^2, but a giant group's
   distinct-shingle relation dominates the explode+distinct; the probe
   checks the skew doesn't funnel a single task.
2. `hybrid_search_rrf` composition with n_runs > 2: the RRF fold is a
   union + one partial-agg groupBy, so cost should grow ~linearly in
   the number of runs, not in their product.
3. Post-fix `winnow_dup_pairs` at 10x/100x, plus the hot-bucket cap's
   coverage bound under the replicated corpus's Zipf-ish fingerprints:
   replication multiplies every fingerprint's bucket size by k, so the
   ≤1000 cap starts dropping boilerplate fingerprints — the probe
   reports how many distinct fingerprints (and what share of postings)
   the cap removes at each scale (the documented coverage trade).

Methodology: replicate the sf0.01 documents corpus with fresh doc_ids
(text unchanged), noop-sink each plan, best-of-2.

Usage: python scripts/probe_scale_r8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def replicate(docs, k: int):
    copies = docs.sparkSession.range(k).select(F.col("id").alias("_copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_copy")).alias("doc_id"),
            "source",
            "lang",
            "text",
        )
        .localCheckpoint(eager=True)
    )


def timed(df, label):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    spark = get_spark("probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    from lakota_spark.operators.dedup import group_shingle_overlap
    from lakota_spark.operators.similarity import rrf_fuse
    from lakota_spark.operators.text import winnow_dup_pairs
    from lakota_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).localCheckpoint(eager=True)
    n0 = docs.count()
    print(f"base corpus: {n0} docs")

    # ---- 1. source overlap: uniform vs one-giant-dump skew ----------
    for k in (10, 100):
        rep = replicate(docs, k)
        timed(
            group_shingle_overlap(rep),
            f"source_overlap uniform {k}x ({n0 * k} docs)",
        )
        # skew: 95% of docs relabeled into one giant source
        skewed = rep.withColumn(
            "source",
            F.when(F.col("doc_id") % 20 != 0, F.lit("giant-dump")).otherwise(
                F.col("source")
            ),
        )
        timed(
            group_shingle_overlap(skewed),
            f"source_overlap skewed-95% {k}x",
        )

    # ---- 2. RRF with n_runs > 2 -------------------------------------
    # synthetic runs: deterministic hash-ranked top-200 per run — the
    # probe measures the fold, not the upstream retrievers
    for n_runs in (2, 4, 8):
        runs = [
            docs.select(
                "doc_id",
                F.row_number()
                .over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.orderBy(F.xxhash64("doc_id", F.lit(i)))
                )
                .alias("rank"),
            ).limit(200)
            for i in range(n_runs)
        ]
        timed(rrf_fuse(runs), f"rrf_fuse n_runs={n_runs} (k=200)")

    # ---- 3. winnow_dup_pairs post-fix + cap coverage ----------------
    from lakota_spark.operators.text import _winnow_cols

    for k in (1, 10, 100):
        rep = docs if k == 1 else replicate(docs, k)
        timed(winnow_dup_pairs(rep), f"winnow_dup_pairs {k}x")
        # cap coverage: how much does the ≤1000 hot-bucket cap drop?
        _, fp = _winnow_cols("text", 5, 4)
        e = rep.select(F.explode(fp).alias("fp"))
        stats = (
            e.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("n_fps"),
                F.sum("n").alias("n_postings"),
                F.sum(F.when(F.col("n") > 1000, 1).otherwise(0)).alias(
                    "fps_capped"
                ),
                F.sum(F.when(F.col("n") > 1000, F.col("n"))).alias(
                    "postings_capped"
                ),
            )
            .collect()[0]
        )
        pc = stats["postings_capped"] or 0
        print(
            f"  cap coverage {k}x: {stats['fps_capped']}/{stats['n_fps']} "
            f"fingerprints capped, {pc}/{stats['n_postings']} postings "
            f"({100.0 * pc / stats['n_postings']:.1f}%) excluded",
            flush=True,
        )


if __name__ == "__main__":
    main()
