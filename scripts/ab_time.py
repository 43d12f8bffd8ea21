"""Best-of-N single-rung timer for A/B optimization work (round 13).

Usage: python scripts/ab_time.py <query> [query ...] [--n 3]

Same methodology as bench.py (warmup tpch_q1, noop sink, best-of-N) but
scoped to the named rungs so an edit can be measured in ~seconds instead
of a full suite run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lakota_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakota-ab-time")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["tpch_q1"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for name in args:
        fn = qs[name]
        trials = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            trials.append(time.perf_counter() - t0)
        print(
            f"{name}: best={min(trials):.3f} trials="
            + ",".join(f"{t:.3f}" for t in trials)
        )


if __name__ == "__main__":
    main()
