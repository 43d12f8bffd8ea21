"""Round-10 skew probe (r9 judge ask #1): sketch_stats under a HOT
event type — most rows in ONE group, so any per-group full-relation
window funnels the whole relation through one task.

Compares, on a replicated events relation where ~90% of rows share one
event_type:

1. OLD shape (r9): `row_number() OVER (PARTITION BY event_type ORDER BY
   h)` across the full distinct-user relation, and the same window over
   the 1/16 value sample for the median.
2. NEW shape (r10): `sampling.bottom_k_per_group` two-stage sub-shard
   bottom-k for the KMV hash + windowless exact count +
   `sampling.exact_group_median` distributed prefix-scan selection.

Methodology: replicate sf0.01 events x K with fresh event/user ids,
re-tag event_type 90/10, noop-sink each plan, best-of-2.
Results -> NOTES.md probe table.

Usage: python scripts/probe_skew_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.functions import hash32  # noqa: E402
from lakota_spark.operators.sampling import (  # noqa: E402
    bottom_k_per_group,
    exact_group_median,
)
from lakota_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K_KMV = 128


def replicate(spark, k: int):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(k).select(F.col("id").alias("_copy"))
    out = e.crossJoin(copies).select(
        (F.col("event_id") * 1000 + F.col("_copy")).alias("event_id"),
        (F.col("user_id") * 1000 + F.col("_copy")).alias("user_id"),
        "value",
    )
    # 90% of rows land in ONE hot event type
    return out.withColumn(
        "event_type",
        F.when(
            F.pmod(hash32(F.col("event_id").cast("string")), F.lit(10)) < 9,
            F.lit("hot"),
        ).otherwise(
            F.concat(F.lit("t"), (F.col("event_id") % 4).cast("string"))
        ),
    )


def uh_of(e):
    h = hash32(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
    return (
        e.select("event_type", h.alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("event_type", "h")
    )


def sample_of(e):
    return e.where(
        F.pmod(
            hash32(F.concat(F.lit("smp:"), F.col("event_id").cast("string"))),
            F.lit(16),
        )
        == 0
    ).select("event_type", "value")


def old_shape(e):
    uh = uh_of(e)
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = uh.withColumn("_rn", F.row_number().over(w))
    kmv = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_users"),
        F.max(F.when(F.col("_rn") == K_KMV, F.col("h"))).alias("_hk"),
    )
    sample = sample_of(e)
    ws = Window.partitionBy("event_type").orderBy("value", "event_type")
    counts = sample.groupBy("event_type").agg(F.count(F.lit(1)).alias("_sn"))
    med = (
        sample.withColumn("_rn", F.row_number().over(ws))
        .join(counts, "event_type")
        .where(F.col("_rn") == F.floor((F.col("_sn") + 1) / 2))
        .select("event_type", F.col("value").alias("sample_p50"))
    )
    return kmv.join(med, "event_type", "left")


def new_shape(e):
    uh = uh_of(e).localCheckpoint(eager=False)
    hk = (
        bottom_k_per_group(uh, K_KMV, "event_type", "h")
        .where(F.col("bottom_rank") == K_KMV)
        .select("event_type", F.col("h").alias("_hk"))
    )
    cnt = uh.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_users"))
    med = exact_group_median(sample_of(e), "event_type", "value").select(
        "event_type", F.col("median").alias("sample_p50")
    )
    return cnt.join(hk, "event_type", "left").join(med, "event_type", "left")


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(n, fn):
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return min(times)


def main():
    spark = get_spark()
    print(f"{'x':>4} {'rows':>12} {'old(win)':>9} {'new(shard)':>10}")
    for k in (10, 100, 1000):
        e = replicate(spark, k).localCheckpoint(eager=True)
        n = e.count()
        t_old = best_of(2, lambda: sink(old_shape(e)))
        t_new = best_of(2, lambda: sink(new_shape(e)))
        print(f"{k:>4} {n:>12} {t_old:>9.2f} {t_new:>10.2f}")
        e.unpersist()


if __name__ == "__main__":
    main()
