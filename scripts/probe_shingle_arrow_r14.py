"""Round-14 probe: Arrow shingle_table vs the expr explode+distinct,
measured through the FULL minhash chain (the consumer that matters —
minhash_dedup_pairs' dominant 17 s-executor stage is the shingle+
signature derivation).

MEASURED AND REJECTED (recorded in OPTIMIZATION_r14.md): bit-identical
at sf0.001 + sf0.01 (shingle relation and end-to-end pairs), but the
interleaved A/B through the minhash chain at sf0.1 was 1.06x (slower)
at 32 cores / 0.94x at 8 — fails the win-at-BOTH gate. The operator
keeps the expr implementation; the arrow variant lives INLINE here so
the experiment stays reproducible.

Usage: python scripts/probe_shingle_arrow_r14.py [--n 5] [--check]

--check collects both shingle relations AND both end-to-end pair outputs
at $SPARK_GRAFT_SF_DIR and asserts equality (run at sf0.001 + sf0.01).
Run with SPARK_GRAFT_CPUS=32 and =8 (keep gate: wins at BOTH).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lakota_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    check = "--check" in args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakota-probe-shingle")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from lakota_spark.operators import dedup as D
    from lakota_spark.operators.util import ensure_parallelism
    from lakota_spark.sources import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")

    def shingle_table_arrow(df, n=3):
        # per-doc set-dedup inside one Arrow batch: doc_id is in the
        # key, so per-doc distinct IS globally distinct and the global
        # .distinct() exchange disappears. Tokenizer mirrors the expr
        # chain bit-for-bit (0x20-only trim, Java ASCII \s, limit -1).
        def fold(batches):
            import re

            import pyarrow as pa

            ws = re.compile("[ \t\n\x0b\f\r]+")
            for b in batches:
                texts = b.column(1).to_pylist()
                idx, vals = [], []
                for i, t in enumerate(texts):
                    if t is None:
                        continue
                    toks = ws.split(t.strip(" "))
                    m = len(toks) - (n - 1)
                    if m < 1:
                        continue
                    ss = {
                        " ".join(toks[j : j + n]) for j in range(m)
                    }
                    idx.extend([i] * len(ss))
                    vals.extend(ss)
                yield pa.record_batch(
                    [
                        b.column(0).take(pa.array(idx, pa.int32())),
                        pa.array(vals, pa.string()),
                    ],
                    names=["doc_id", "shingle"],
                )

        base = ensure_parallelism(df)
        return base.select(F.col("doc_id"), F.col("text")).mapInArrow(
            fold, "doc_id long, shingle string"
        )

    def make_shingles(impl: str):
        if impl == "arrow":
            return shingle_table_arrow(docs, n=3)
        return D.shingle_table(docs, n=3)

    def chain(impl: str):
        sh = make_shingles(impl).localCheckpoint(eager=False)
        sigs = D.minhash_signatures(sh, 16)
        cands = D.lsh_candidates(sigs, 16, 4, max_bucket=None)
        return D.jaccard_pairs(sh, 0.5, candidates=cands)

    def run(impl: str) -> float:
        t0 = time.perf_counter()
        chain(impl).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run("expr")
    run("arrow")

    if check:
        e = sorted(
            tuple(r) for r in make_shingles("expr").collect()
        )
        a = sorted(
            tuple(r) for r in make_shingles("arrow").collect()
        )
        assert e == a, (len(e), len(a))
        pe = sorted(tuple(r) for r in chain("expr").collect())
        pa_ = sorted(tuple(r) for r in chain("arrow").collect())
        assert pe == pa_, (len(pe), len(pa_))
        print(
            f"CHECK OK: {len(e)} shingle rows + {len(pe)} pair rows "
            f"identical at {sf_dir}"
        )

    expr_t, arrow_t = [], []
    for _ in range(n):
        expr_t.append(run("expr"))
        arrow_t.append(run("arrow"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    print(
        f"cpus={cpus} sf={sf_dir} n={n} (full minhash chain)\n"
        f"expr : best={min(expr_t):.3f} trials="
        + ",".join(f"{t:.3f}" for t in expr_t)
        + f"\narrow: best={min(arrow_t):.3f} trials="
        + ",".join(f"{t:.3f}" for t in arrow_t)
        + f"\nratio arrow/expr = {min(arrow_t) / min(expr_t):.3f}"
    )


if __name__ == "__main__":
    main()
