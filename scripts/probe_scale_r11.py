"""Round-11 scale probes (VERDICT r10 ask #7): the remaining r10
operators at x1/x10/x100 of the sf0.01 corpus with the same
flat-or-linear gauge the r7-r10 probes use — interval_join under a
FAT-TAIL interval distribution (1% of intervals 100x the mean length:
the multi-level grid must keep bucket rows at <= 2/interval instead of
degrading to length-proportional replication), temperature_resample,
priority_sample_per_group, and decayed_sum.

Usage: python scripts/probe_scale_r11.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.functions import hash32  # noqa: E402
from lakota_spark.operators.interval import interval_join  # noqa: E402
from lakota_spark.operators.sampling import (  # noqa: E402
    priority_sample_per_group,
    temperature_resample,
)
from lakota_spark.operators.timeseries import decayed_sum  # noqa: E402
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


def docs_x(spark, k: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source", F.length("text").alias("n_chars")
    )
    copies = spark.range(k).select(F.col("id").alias("_c"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * 1000 + F.col("_c")).alias("doc_id"),
            "lang", "source", "n_chars",
        )
        .localCheckpoint(eager=True)
    )


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    print("-- interval_join, FAT-TAIL lengths (1% of intervals 100x) --")
    for k in (1, 10, 100):
        n = 5000 * k
        base = spark.range(n).select(
            F.col("id").alias("iid"),
            (F.pmod(hash32(F.col("id").cast("string")), F.lit(1000_000)))
            .alias("s"),
        )
        fat = F.when(
            F.pmod(hash32(F.concat(F.lit("f:"), F.col("iid").cast("string"))),
                   F.lit(100)) == 0,
            F.lit(5000),
        ).otherwise(F.lit(50))
        left = base.select(
            "iid", "s", (F.col("s") + fat).alias("e")
        ).localCheckpoint(eager=True)
        right = base.select(
            (F.col("iid") + 10_000_000).alias("iid"),
            (F.col("s") + 25).alias("s"),
            (F.col("s") + 25 + fat).alias("e"),
        ).localCheckpoint(eager=True)
        t = best2(lambda: sink(
            interval_join(left, right, "s", "e", "s", "e")
        ))
        print(f"  x{k} ({n} x {n} intervals): {t:.2f}s")
        left.unpersist(); right.unpersist()

    print("-- temperature_resample (alpha=0.5, budget=n) --")
    for k in (1, 10, 100):
        d = docs_x(spark, k)
        t = best2(lambda: sink(temperature_resample(d, "lang")))
        print(f"  x{k} ({d.count()} docs): {t:.2f}s")
        d.unpersist()

    print("-- priority_sample_per_group (k=200 per source) --")
    for k in (1, 10, 100):
        d = docs_x(spark, k)
        t = best2(lambda: sink(
            priority_sample_per_group(d, 200, "source", F.col("n_chars"))
        ))
        print(f"  x{k} ({d.count()} docs): {t:.2f}s")
        d.unpersist()

    print("-- decayed_sum over events (horizon=30, per user) --")
    e0 = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts", F.round(F.col("value") * 100)
        .cast("long").alias("v100")
    )
    for k in (1, 10, 100):
        copies = spark.range(k).select(F.col("id").alias("_c"))
        e = e0.crossJoin(copies).select(
            (F.col("event_id") * 1000 + F.col("_c")).alias("event_id"),
            (F.col("user_id") * 1000 + F.col("_c")).alias("user_id"),
            "ts", "v100",
        ).localCheckpoint(eager=True)
        t = best2(lambda: sink(decayed_sum(
            e, "ts", "user_id", F.col("v100"), horizon=30, shift=30,
            tiebreak="event_id",
        )))
        print(f"  x{k} ({e.count()} events): {t:.2f}s")
        e.unpersist()


if __name__ == "__main__":
    main()
