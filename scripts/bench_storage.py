"""Storage-engine benchmark against BASELINE.md's published numbers.

Replicates the reference's own micro-benchmarks on THIS engine:

* bulk: `bench/bench_pg.py:7-12` — 5,259,457 rows (5-minute timestamp
  grid 1970→2020, sin values), bulk write / full read / on-disk size.
  Reference: write 375.67 ms, read 193.10 ms (PostgreSQL: 83.74 s /
  10.03 s, 382 MB). NB the reference's "2.0 MB" disk figure cannot be
  lossless for this data — sin(arange) float64 measures ~42 MB of
  entropy under zstd/blosc alike (their `du -hs .lakota/` targeted the
  default repo dir while the bench wrote to `test-db/`); the honest
  yardstick is the PostgreSQL 382 MB row.
* fragmentation: `bench/bench_fragmentation.py:5-12` — 1M rows written
  in chunks of 500 / 5,000 / 50,000 / 500,000.
  Reference: 23.86 s/972 MB, 1.06 s/19 MB, 148.83 ms/3.5 MB,
  57.62 ms/3.4 MB.
* interchange: round-trip the 5.26M-row table through each non-parquet
  interchange format (orc, jsonl) — export + re-import timings, so the
  round-4 formats carry a measured cost, not just a correctness test.

Usage: python scripts/bench_storage.py [--compact]
  --compact  the per-round bench.py embeds this mode. Since the fmt-3
             delta changelog landed, the 500-row fragmentation rung is
             cheap enough to keep (12.8 s vs 28.4 s before); the jsonl
             round-trip runs on a 1M-row slice instead of the full
             5.26M table (text serialization is linear in rows — the
             reported per_mrow_s extrapolates: full-table cost ≈
             5.26 × the slice's).

Prints ONE JSON object with a ratio-to-reference for every comparable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BULK = 5_259_457
N_FRAG = 1_000_000
REF = {  # BASELINE.md values, seconds / MB
    "bulk_write_s": 0.37567,
    "bulk_read_s": 0.19310,
    "pg_write_s": 83.74,
    "pg_read_s": 10.03,
    "pg_disk_mb": 382.0,
    "frag": {500: 23.86, 5_000: 1.06, 50_000: 0.14883, 500_000: 0.05762},
    "frag_mb": {500: 972.0, 5_000: 19.0, 50_000: 3.5, 500_000: 3.4},
}


def dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def bench_df():
    import numpy as np
    import pandas as pd

    ts = pd.date_range("1970-01-01", "2020-01-01", freq="5min")
    return pd.DataFrame(
        {"timestamp": ts, "value": np.sin(np.arange(len(ts)))}
    )


#: calibration reference: the r6 judge-recorded `calib_seconds` for the
#: fixed 10⁹-row codegen aggregate. ratio_norm = ratio × (CALIB_BASE /
#: this session's calib) — a machine-speed-corrected BASELINE ratio, so
#: the frag gate reads code signal instead of VM luck (r6 ask #8).
CALIB_BASE = 0.314

#: r13 IO-sentinel base (VERDICT r12 #3, the second sentinel): best-of-6
#: solo run of bench.py's `_io_calib_trials` — 500k float64 rows written
#: as 50 lz4-parquet chunk files via pyarrow then read back — on the r13
#: machine in an uncontended window (samples 0.092-0.103 s). The frag
#: rungs are the same small-file pyarrow regime, so
#: ratio_norm_io = ratio × (IO_CALIB_BASE / io_calib) corrects them for
#: small-file-IO drift the CPU codegen sentinel cannot see (the r12
#: frag-500k 1.08↔1.73 "normalized" swing with zero code change).
IO_CALIB_BASE = 0.092


def run(
    spark,
    compact: bool = False,
    calib: float | None = None,
    io_calib: float | None = None,
) -> dict:
    from lakota_spark.repo import Repo
    from lakota_spark.schema import Schema

    out: dict = {}
    df = bench_df()
    assert len(df) == N_BULK
    # pre-touch: first-touch page faults on the fresh 80 MB belong to
    # data generation, not the engine write being measured
    df["value"].to_numpy().sum()

    # ---- bulk (bench_pg parity) -----------------------------------------
    root = tempfile.mkdtemp(prefix="bench-storage-")
    try:
        repo = Repo(root, spark)
        # best-of-3 like the query bench: single runs swing with machine
        # load and the FIRST write additionally pays allocator/page-cache
        # warmup (measured 0.46/0.52/0.44 for identical writes); each
        # trial writes a fresh collection
        write_s = read_count_s = read_pandas_s = None
        for trial in range(3):
            coll = repo.create_collection(
                Schema(timestamp="timestamp*", value="float"),
                f"bench{trial}",
            )
            series = coll.series("test")
            t0 = time.perf_counter()
            series.write(df)
            w = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = series.frame(sort=False).count()
            rc = time.perf_counter() - t0
            t0 = time.perf_counter()
            pdf = series.df(sort=False)
            rp = time.perf_counter() - t0
            write_s = w if write_s is None else min(write_s, w)
            read_count_s = (
                rc if read_count_s is None else min(read_count_s, rc)
            )
            read_pandas_s = (
                rp if read_pandas_s is None else min(read_pandas_s, rp)
            )
        # one copy of the data (trial 1's dir mirrors trial 0's segments
        # via content addressing inside its own collection; report the
        # per-collection size, not the doubled repo total)
        size_mb = dir_size(os.path.join(root, "bench0")) / 1e6
        out["bulk"] = {
            "rows": n,
            "write_s": round(write_s, 3),
            "read_count_s": round(read_count_s, 3),
            "read_pandas_s": round(read_pandas_s, 3),
            "rows_ok": n == N_BULK and len(pdf) == N_BULK,
            "on_disk_mb": round(size_mb, 1),
            "write_vs_ref": round(write_s / REF["bulk_write_s"], 2),
            "read_vs_ref": round(read_pandas_s / REF["bulk_read_s"], 2),
            "write_vs_pg": round(write_s / REF["pg_write_s"], 3),
            "read_vs_pg": round(read_pandas_s / REF["pg_read_s"], 3),
            "disk_vs_pg": round(size_mb / REF["pg_disk_mb"], 3),
        }

        # ---- bulk write, EXECUTOR path (the 100 TB shape) ----------------
        # The same 5.26M-row frame written from a DataFrame input:
        # distributed range sort + PAGE_LEN-capped parquet + sha1 job
        # (`series.py` single-pass executor branch — no stats pre-job
        # since round 7). The driver-local fast path above is a
        # small-data convenience; at cluster scale THIS is the only
        # write path, so it carries its own per-round number. Input is
        # materialized (localCheckpoint) before timing so the rung
        # measures the write path, not createDataFrame conversion.
        sdf = spark.createDataFrame(df).localCheckpoint(eager=True)
        exec_write_s = None
        for trial in range(3):
            coll_ex = repo.create_collection(
                Schema(timestamp="timestamp*", value="float"),
                f"benchex{trial}",
            )
            series_ex = coll_ex.series("test")
            t0 = time.perf_counter()
            series_ex.write(sdf)
            w = time.perf_counter() - t0
            exec_write_s = w if exec_write_s is None else min(exec_write_s, w)
        n_ex = series_ex.frame(sort=False).count()
        out["bulk_executor"] = {
            "rows": n_ex,
            "write_s": round(exec_write_s, 3),
            "rows_ok": n_ex == N_BULK,
            "mrows_per_s": round(N_BULK / exec_write_s / 1e6, 2),
            "vs_local_write": round(exec_write_s / write_s, 2),
        }

        # ---- interchange round-trip (round-4 formats) -------------------
        # compact mode: jsonl on a 1M-row slice (text serialization is
        # linear in rows; per_mrow_s extrapolates the full-table cost)
        n_jsonl = 1_000_000 if compact else N_BULK
        if compact:
            coll_jl = repo.create_collection(
                Schema(timestamp="timestamp*", value="float"), "benchjl"
            )
            coll_jl.series("test").write(df.iloc[:n_jsonl])
        src = {"orc": "bench0", "jsonl": "benchjl" if compact else "bench0"}
        n_src = {"orc": N_BULK, "jsonl": n_jsonl}
        inter = {}
        for fmt in ("orc", "jsonl"):
            exp_dir = os.path.join(root, f"export-{fmt}")
            t0 = time.perf_counter()
            repo.export_collection(src[fmt], exp_dir, fmt=fmt)
            export_s = time.perf_counter() - t0
            repo.create_collection(
                Schema(timestamp="timestamp*", value="float"),
                f"rt_{fmt}",
            )
            t0 = time.perf_counter()
            repo.import_series(
                f"rt_{fmt}",
                "test",
                os.path.join(exp_dir, "test"),
                fmt=fmt,
            )
            import_s = time.perf_counter() - t0
            n_rt = (
                repo.collection(f"rt_{fmt}")
                .series("test")
                .frame(sort=False)
                .count()
            )
            inter[fmt] = {
                "rows": n_src[fmt],
                "export_s": round(export_s, 3),
                "import_s": round(import_s, 3),
                "export_mb": round(dir_size(exp_dir) / 1e6, 1),
                "per_mrow_s": round(
                    (export_s + import_s) / (n_src[fmt] / 1e6), 3
                ),
                "rows_ok": n_rt == n_src[fmt],
            }
        out["interchange"] = inter
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # ---- fragmentation ladder (bench_fragmentation parity) --------------
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    values = np.arange(N_FRAG, dtype="int64")
    rng.shuffle(values)
    # the 500 rung stays in compact mode since the fmt-3 delta log made
    # appends O(new): it's the one BASELINE number that was ever above
    # the reference, so every round must re-measure it
    chunk_sizes = [500, 5_000, 50_000, 500_000]
    frag = {}
    for chunk in chunk_sizes:
        # the sub-second rungs (>=5k chunk) are a handful of ~50-100 ms
        # writes — a single sample swings +-30% with machine noise, so
        # they get the same best-of-3 discipline as the query bench; the
        # 500 rung is ~5 s of real work and stays single-trial
        trials = 1 if chunk == 500 else 3
        write_s = read_s = None
        disk_mb = 0.0
        rows_ok = False
        for _trial in range(trials):
            root = tempfile.mkdtemp(prefix="bench-frag-")
            try:
                repo = Repo(root, spark)
                coll = repo.create_collection(
                    Schema(timestamp="int*", value="float"), "frag"
                )
                series = coll.series("frag")
                t0 = time.perf_counter()
                for lo in range(0, N_FRAG, chunk):
                    series.write(
                        pd.DataFrame(
                            {
                                "timestamp": np.arange(lo, lo + chunk),
                                "value": values[lo : lo + chunk].astype(
                                    "float64"
                                ),
                            }
                        )
                    )
                w = time.perf_counter() - t0
                t0 = time.perf_counter()
                n = series.frame(sort=False).count()
                r = time.perf_counter() - t0
                rows_ok = rows_ok or n == N_FRAG
                disk_mb = dir_size(root) / 1e6
                write_s = w if write_s is None or w < write_s else write_s
                read_s = r if read_s is None or r < read_s else read_s
            finally:
                shutil.rmtree(root, ignore_errors=True)
        frag[str(chunk)] = {
            "write_s": round(write_s, 2),
            "read_s": round(read_s, 2),
            "rows_ok": rows_ok,
            "on_disk_mb": round(disk_mb, 1),
            "write_vs_ref": round(write_s / REF["frag"][chunk], 2),
            "disk_vs_ref_mb": REF["frag_mb"][chunk],
        }
        if calib:
            frag[str(chunk)]["write_vs_ref_norm"] = round(
                write_s * (CALIB_BASE / calib) / REF["frag"][chunk], 2
            )
        if io_calib:
            frag[str(chunk)]["write_vs_ref_norm_io"] = round(
                write_s * (IO_CALIB_BASE / io_calib) / REF["frag"][chunk],
                2,
            )
    out["fragmentation"] = frag
    return out


def main() -> None:
    from lakota_spark.session import get_spark

    compact = "--compact" in sys.argv
    spark = get_spark("bench-storage")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, compact=compact)))


if __name__ == "__main__":
    main()
