"""N-batch probe of the bucketed `streaming.NearDupIndex` (r7 judge ask
#2): fold B batches of fresh documents, timing each batch's GATE
(`filter` + count) as the index grows, with a compaction halfway.

What "done" looks like: per-batch gate latency stays flat-ish as the
landed index grows (the partition-pruned join reads only the probed
buckets — cost tracks batch size and probed-postings, not corpus
size), and the part-file count is bounded after compact().

Round 8 addition: compaction now also GROWS the bucket count with the
corpus (rows_per_bucket_target); pass a small target as argv[3] to watch
n_buckets double while the gate keeps answering (compact every
n_batches/4 instead of once).

Usage: python scripts/probe_neardup_index.py [n_batches] [batch_docs]
       [rows_per_bucket_target]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakota_spark.session import get_spark  # noqa: E402
from lakota_spark.streaming import NearDupIndex  # noqa: E402

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 500
RPB_TARGET = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000


def batch_df(spark, b: int):
    """BATCH_DOCS docs of unique-per-doc word soup (nothing dedups, so
    the index grows by the full batch every fold — worst case for gate
    cost) plus one near-dup of batch 0 (so the gate stays exercised)."""
    rows = [
        (
            b * 100_000 + i,
            " ".join(f"w{b}x{i}x{j}" for j in range(40)),
        )
        for i in range(BATCH_DOCS)
    ]
    rows.append((b * 100_000 + 99_999, " ".join(f"w0x0x{j}" for j in range(40))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    spark = get_spark("neardup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    path = "/tmp/lakota-neardup-probe"
    shutil.rmtree(path, ignore_errors=True)
    idx = NearDupIndex(spark, path, rows_per_bucket_target=RPB_TARGET)
    print(
        f"batches={N_BATCHES} batch_docs={BATCH_DOCS} "
        f"buckets={idx.n_buckets} rows/bucket target={RPB_TARGET}"
    )
    compact_every = max(2, N_BATCHES // 4)
    for b in range(N_BATCHES):
        df = batch_df(spark, b).localCheckpoint()
        t0 = time.perf_counter()
        kept = idx.filter(df).localCheckpoint()
        n_kept = kept.count()
        gate_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx.fold(kept)
        fold_s = time.perf_counter() - t0
        files = len(glob.glob(f"{path}/bucket=*/*.parquet"))
        note = ""
        if b and b % compact_every == 0:
            t0 = time.perf_counter()
            idx.compact()
            note = (
                f"  [compact {time.perf_counter() - t0:.2f}s -> "
                f"{len(glob.glob(f'{path}/bucket=*/*.parquet'))} files, "
                f"{idx.n_buckets} buckets]"
            )
        print(
            f"batch {b:3d}: gate {gate_s:6.2f}s fold {fold_s:6.2f}s "
            f"kept {n_kept:4d} files {files:5d}{note}",
            flush=True,
        )
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
