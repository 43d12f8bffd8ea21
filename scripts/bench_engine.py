"""Storage-engine micro-benchmark — the BASELINE.md comparables.

The reference's published numbers (author laptop, 2020): bulk write of
5.26M rows (ts+float) in 375.67 ms, full read 193.10 ms, 2.0 MB on disk
(`bench/bench_pg.py`). A Spark job cannot match sub-second task-launch
latency on tiny data — the honest comparison is throughput and footprint
at sizes where distribution matters, so this reports rows/s and bytes for
1M and 5.26M rows plus fragmented-write compaction behavior
(`bench/bench_fragmentation.py` analogue).

Usage: python scripts/bench_engine.py [n_rows ...]
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

from lakota_spark.repo import Repo
from lakota_spark.schema import Schema
from lakota_spark.session import get_spark


def dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1_000_000, 5_259_457]
    spark = get_spark("bench-engine")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"runs": []}
    for n in sizes:
        root = tempfile.mkdtemp(prefix="bench-engine-")
        repo = Repo(root, spark)
        coll = repo.create_collection(
            Schema(timestamp="timestamp*", value="float"), "bench"
        )
        df = spark.range(n).select(
            (F.lit("2020-01-01").cast("timestamp") + F.make_interval(
                secs=F.col("id").cast("double")
            )).alias("timestamp"),
            F.rand(42).alias("value"),
        )
        series = coll.series("s")
        t0 = time.perf_counter()
        series.write(df)
        write_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        count = series.frame(sort=False).count()
        read_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        series.frame(
            start="2020-01-10", stop="2020-01-11", sort=False
        ).count()
        range_read_s = time.perf_counter() - t0
        size = dir_size(os.path.join(root, "bench", "segments"))
        out["runs"].append(
            {
                "rows": n,
                "write_s": round(write_s, 3),
                "write_rows_per_s": int(n / write_s),
                "full_read_s": round(read_s, 3),
                "range_read_s": round(range_read_s, 3),
                "on_disk_mb": round(size / 1e6, 2),
                "read_count_ok": count == n,
            }
        )
        shutil.rmtree(root)

    # fragmentation: 100k rows in 100 chunks, then defrag
    root = tempfile.mkdtemp(prefix="bench-frag-")
    repo = Repo(root, spark)
    coll = repo.create_collection(Schema(timestamp="int*", value="float"), "frag")
    series = coll.series("s")
    chunk = 1000
    t0 = time.perf_counter()
    for i in range(100):
        base = i * chunk
        df = spark.range(base, base + chunk).select(
            F.col("id").alias("timestamp"), F.rand(1).alias("value")
        )
        series.write(df)
    frag_write_s = time.perf_counter() - t0
    n_segs = len(coll.snapshot().for_label("s"))
    t0 = time.perf_counter()
    coll.defrag()
    defrag_s = time.perf_counter() - t0
    out["fragmentation"] = {
        "chunks": 100,
        "chunk_rows": chunk,
        "write_s": round(frag_write_s, 3),
        "segments_before": n_segs,
        "segments_after": len(coll.snapshot().for_label("s")),
        "defrag_s": round(defrag_s, 3),
        "rows_after": series.frame(sort=False).count(),
    }
    shutil.rmtree(root)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
