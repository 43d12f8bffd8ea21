"""Round-14 probe (VERDICT r13 #5): settle the compute-bound family with
a measurement — bit-exact `mapInArrow` winnow fold vs the Catalyst
expression chain, interleaved A/B in ONE warm session.

Usage: python scripts/probe_winnow_arrow_r14.py [--n 5] [--check]

--check additionally collects both implementations over the corpus at
$SPARK_GRAFT_SF_DIR and asserts row-for-row equality (the oracle-exactness
gate; run it at sf0.001 AND sf0.01).

Run with SPARK_GRAFT_CPUS=32 and =8: the keep gate is winning at BOTH
(the 8-core run approximates the per-core-throughput regime at scale).
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
    spark = get_spark("lakota-probe-winnow")
    spark.sparkContext.setLogLevel("ERROR")

    from lakota_spark.operators.text import winnow_fingerprints
    from lakota_spark.operators.util import ensure_parallelism
    from lakota_spark.sources import read_parquet

    docs = ensure_parallelism(
        read_parquet(spark, f"{sf_dir}/documents.parquet")
    )

    def run(impl: str) -> float:
        t0 = time.perf_counter()
        winnow_fingerprints(docs, impl=impl).write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    # warmup both graphs (JVM codegen + Python worker pool)
    run("expr")
    run("arrow")

    if check:
        e = sorted(
            tuple(r) for r in winnow_fingerprints(docs).collect()
        )
        a = sorted(
            tuple(r)
            for r in winnow_fingerprints(docs, impl="arrow").collect()
        )
        assert len(e) == len(a), (len(e), len(a))
        bad = [(x, y) for x, y in zip(e, a) if x != y]
        assert not bad, bad[:5]
        print(f"CHECK OK: {len(e)} rows bit-identical at {sf_dir}")

    expr_t, arrow_t = [], []
    for _ in range(n):  # interleaved, same session
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
