"""Round-10 data source probe: the `lakota` format vs the native engine
paths at the BASELINE bulk scale (5.26M rows) — full scan, 1%-range
pushdown read, and distributed append.

Usage: python scripts/probe_datasource_r10.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakota_spark.datasource import register  # noqa: E402
from lakota_spark.repo import Repo  # noqa: E402
from lakota_spark.schema import Schema  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

N = 5_260_000


def timed(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    return best, out


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    root = tempfile.mkdtemp(prefix="lakota-ds-probe-")
    repo = Repo(root, spark)
    repo.create_collection(Schema(ts="int*", value="float"), "p")
    s = repo.collection("p").series("x")
    src = spark.range(N).select(
        F.col("id").alias("ts"), (F.col("id") % 977 * 1.5).alias("value")
    )

    t, _ = timed(lambda: s.write(src, validate_sorted=False), n=1)
    print(f"Series.write bulk ({N} rows): {t:.2f}s")

    def ds_write():
        (
            src.selectExpr(f"ts + {N * 2} as ts", "value")
            .repartitionByRange(32, "ts")
            .write.format("lakota")
            .option("path", root)
            .option("table", "p/y" )
            .mode("append")
            .save()
        )

    t, _ = timed(ds_write, n=1)
    print(f"writer bulk append ({N} rows, 32 parts): {t:.2f}s")

    ds = (
        spark.read.format("lakota")
        .option("path", root)
        .option("table", "p/x")
    )
    t, n = timed(lambda: ds.load().count())
    print(f"datasource full count: {t:.2f}s ({n} rows)")
    t, n = timed(lambda: s.frame(sort=False).count())
    print(f"frame(sort=False) count: {t:.2f}s ({n} rows)")
    lo, hi = N // 2, N // 2 + N // 100
    t, n = timed(
        lambda: ds.load().where(
            (F.col("ts") >= lo) & (F.col("ts") < hi)
        ).count()
    )
    print(f"datasource 1%-range count: {t:.2f}s ({n} rows)")
    t, n = timed(
        lambda: s.frame(start=lo, stop=hi, closed="l", sort=False).count()
    )
    print(f"frame 1%-range count: {t:.2f}s ({n} rows)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
