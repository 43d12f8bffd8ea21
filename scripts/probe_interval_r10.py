"""Round-10 interval-join scale probe: the multi-level grid join vs the
naive inequality (nested-loop) formulation, plus the two stress regimes
the grid exists for — a fat-tailed length distribution (one giant
interval must not explode into millions of bucket rows) and a hot time
range (90% of intervals packed into 1% of the axis).

Usage: python scripts/probe_interval_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.operators.interval import interval_join  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return min(ts)


def mk_side(spark, n, span, mean_len, fat_tail=False, hot=False, seed=1):
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64(F.col("id") + seed) % span).alias("_h"),
    )
    start = F.abs(F.col("_h"))
    if hot:
        # 90% of rows land in the first 1% of the axis (shuffle-skew
        # stress; hot rows get length 1 so the OUTPUT stays linear —
        # a dense hot range with long intervals has quadratically many
        # true matches, which prices the answer, not the join)
        start = F.when(
            F.col("id") % 10 != 0, F.abs(F.col("_h")) % (span // 100)
        ).otherwise(F.abs(F.col("_h")))
    ln = (F.abs(F.xxhash64(F.col("id") * 31 + seed)) % (2 * mean_len)) + 1
    if hot:
        ln = F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(ln)
    if fat_tail:
        # 0.1% of intervals are 1000x longer — the regime that breaks
        # single-width bucketing
        ln = F.when(F.col("id") % 1000 == 0, ln * 1000).otherwise(ln)
    return df.select(
        "id", start.alias("s"), (start + ln).alias("e")
    )


def run(spark, n, span, mean_len, naive=False, **kw):
    left = mk_side(spark, n, span, mean_len, seed=1, **kw)
    right = (
        mk_side(spark, n, span, mean_len, seed=7, **kw)
        .withColumnRenamed("id", "rid")
        .withColumnRenamed("s", "rs")
        .withColumnRenamed("e", "re")
    )
    if naive:
        out = left.join(
            right, (F.col("s") < F.col("re")) & (F.col("rs") < F.col("e"))
        )
    else:
        out = interval_join(left, right, "s", "e", "rs", "re")
    return best2(lambda: sink(out.select(F.col("id"), F.col("rid"))))


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    span, mean_len = 2_600_000, 300  # ~sf0.01 events shape in seconds

    print("n=20k grid      :", round(run(spark, 20_000, span, mean_len), 2))
    print(
        "n=20k naive BNLJ:",
        round(run(spark, 20_000, span, mean_len, naive=True), 2),
    )
    print(
        "n=100k naive BNLJ:",
        round(run(spark, 100_000, span, mean_len, naive=True), 2),
    )
    for n in (100_000, 1_000_000):
        print(f"n={n} grid      :", round(run(spark, n, span, mean_len), 2))
    print(
        "n=1M fat-tail    :",
        round(run(spark, 1_000_000, span, mean_len, fat_tail=True), 2),
    )
    print(
        "n=1M hot-range   :",
        round(run(spark, 1_000_000, span, mean_len, hot=True), 2),
    )


if __name__ == "__main__":
    main()
