"""Round-14 probe: winnow_dup_pairs with the Arrow fingerprint-table
fold vs the zip_with expression chain, interleaved A/B in one session.

Usage: python scripts/probe_winnow_pairs_r14.py [--n 5] [--check]
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
    spark = get_spark("lakota-probe-winnow-pairs")
    spark.sparkContext.setLogLevel("ERROR")

    from lakota_spark.operators.text import winnow_dup_pairs
    from lakota_spark.operators.util import ensure_parallelism
    from lakota_spark.sources import read_parquet

    docs = ensure_parallelism(
        read_parquet(spark, f"{sf_dir}/documents.parquet")
    )

    def run(impl: str) -> float:
        t0 = time.perf_counter()
        winnow_dup_pairs(docs, impl=impl).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    run("expr")
    run("arrow")

    if check:
        e = sorted(
            tuple(r) for r in winnow_dup_pairs(docs).collect()
        )
        a = sorted(
            tuple(r)
            for r in winnow_dup_pairs(docs, impl="arrow").collect()
        )
        assert e == a, (len(e), len(a))
        print(f"CHECK OK: {len(e)} pair rows identical at {sf_dir}")

    expr_t, arrow_t = [], []
    for _ in range(n):
        expr_t.append(run("expr"))
        arrow_t.append(run("arrow"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    print(
        f"cpus={cpus} sf={sf_dir} n={n}\n"
        f"expr : best={min(expr_t):.3f} trials="
        + ",".join(f"{t:.3f}" for t in expr_t)
        + f"\narrow: best={min(arrow_t):.3f} trials="
        + ",".join(f"{t:.3f}" for t in arrow_t)
        + f"\nratio arrow/expr = {min(arrow_t) / min(expr_t):.3f}"
    )


if __name__ == "__main__":
    main()
