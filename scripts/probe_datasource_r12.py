"""Round-12 probe: range_boundaries writer path at scale.

Question: does the pinned-boundary bucket split (hash repartition on a
bucket id + executor-side split — the shape streaming ingest is limited
to) cost anything vs the batch-only repartitionByRange path, and does
it stay range-disjoint at high bucket counts?

Run: python scripts/probe_datasource_r12.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from lakota_spark.datasource import register
from lakota_spark.repo import Repo
from lakota_spark.schema import Schema
from lakota_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe-ds-r12")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    n = 4_000_000
    buckets = 16
    width = n // buckets
    df = spark.range(n).select(
        F.col("id").alias("ts"), (F.col("id") * 1.5).alias("value")
    )
    boundaries = ",".join(str(i * width) for i in range(1, buckets))

    def write(tag, frame, **opts):
        root = tempfile.mkdtemp(prefix=f"probe-ds12-{tag}-")
        repo = Repo(root, spark)
        repo.create_collection(Schema(ts="int*", value="float"), "t")
        t0 = time.perf_counter()
        w = frame.write.format("lakota").option("path", root).option(
            "table", "t/x"
        )
        for k, v in opts.items():
            w = w.option(k, v)
        w.mode("append").save()
        dt = time.perf_counter() - t0
        s = repo.collection("t").series("x")
        segs = sorted((g.start, g.stop) for g in s.collection.snapshot().segments)
        disjoint = all(a[1] < b[0] for a, b in zip(segs, segs[1:]))
        rows = s.frame(sort=False).count()
        shutil.rmtree(root, ignore_errors=True)
        return dt, len(segs), disjoint, rows

    # warmup: JVM/codegen/writer machinery off the first measurement
    write("warm", df.where("ts < 100000").repartitionByRange(2, "ts"))

    # baseline: batch-only global range partitioning
    base = write("rbr", df.repartitionByRange(buckets, "ts"))
    # streaming-shaped: hash repartition on the bucket id + pinned split
    rb = write(
        "rb",
        df.repartition(buckets, F.expr(f"int(ts / {width})")),
        range_boundaries=boundaries,
    )
    # hot shape: all data in ONE bucket (skewed stream) still commits
    hot = write(
        "hot",
        df.where(f"ts < {width}").repartition(4, F.expr(f"int(ts / {width})")),
        range_boundaries=boundaries,
    )
    for tag, r in [("repartitionByRange", base), ("range_boundaries", rb),
                   ("hot-single-bucket", hot)]:
        dt, nseg, disjoint, rows = r
        print(f"{tag:20s} {dt:6.2f} s  segments={nseg:3d} "
              f"disjoint={disjoint} rows={rows}")


if __name__ == "__main__":
    main()
