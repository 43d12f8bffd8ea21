"""KV zone-map pruning probe (VERDICT r12 #8): is an append-heavy KV
read segment-bound, and what does shadowing-aware pruning recover?

Builds a registry-shaped KV series — N commits of range-disjoint key
buckets (the append-heavy shape: new ids arrive, old ids are never
rewritten) plus a small hot-key overlap tail — then runs a selective
value mask and reports, for the SAME read, segments scheduled and wall
time with the round-13 `zonemap.prune_kv` active vs forced off.

Expected shape: disjoint segments shadow nothing, so nearly all
mask-failing buckets drop before any parquet bytes move; only the
hot-key overlap chain (the rows that can actually shadow) stays. At
100 TB this is the difference between touching every registry segment
on every selective scan and touching the few that can matter.

Usage: python scripts/probe_kv_zonemap.py [--commits 120]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=120)
    ap.add_argument("--rows-per-commit", type=int, default=2000)
    args = ap.parse_args()

    from lakota_spark import zonemap
    from lakota_spark.repo import Repo
    from lakota_spark.schema import Schema
    from lakota_spark.session import get_spark
    from lakota_spark.sexpr import to_filter_plan

    spark = get_spark("probe-kv-zonemap")
    spark.sparkContext.setLogLevel("ERROR")
    repo = Repo(tempfile.mkdtemp(prefix="probe-kvz-"), spark)
    coll = repo.create_collection(
        Schema.kv_schema(k="int*", v="int"), "reg"
    )
    srs = coll.series("x")
    n = args.rows_per_commit
    # disjoint buckets: commit c owns keys [c*n, (c+1)*n), values == c
    for c in range(args.commits):
        srs.write({
            "k": list(range(c * n, (c + 1) * n)),
            "v": [c] * n,
        })
    # hot-key tail: 3 commits rewriting the same small range (these
    # SHADOW and must never prune)
    for r in range(3):
        srs.write({"k": list(range(0, 50)), "v": [1000 + r] * 50})

    mask = f"(>= self.v {args.commits - 2})"  # matches 2 buckets + tail
    plan = to_filter_plan(mask)[0]
    segs = srs.segments()
    kept = zonemap.prune_kv(segs, plan)

    def timed_read():
        t0 = time.perf_counter()
        rows = srs.frame(mask=mask, sort=False).count()
        return rows, round(time.perf_counter() - t0, 3)

    timed_read()  # warm
    rows_pruned, secs_pruned = timed_read()

    orig = zonemap.prune_kv
    zonemap.prune_kv = lambda s, p: s
    try:
        timed_read()  # warm
        rows_full, secs_full = timed_read()
    finally:
        zonemap.prune_kv = orig

    out = {
        "commits": args.commits,
        "segments_total": len(segs),
        "segments_after_prune": len(kept),
        "read_s_pruned": secs_pruned,
        "read_s_unpruned": secs_full,
        "speedup": round(secs_full / max(secs_pruned, 1e-9), 2),
        "rows_match": rows_pruned == rows_full,
    }

    # pure-registry scenario: NO hot-key tail, so the queried set is
    # pairwise disjoint and the r13 dedup skip applies — the read plan
    # must carry no Window/Exchange at all, pricing the second half of
    # the feature (prune + no-dedup raw scan vs full scan + window)
    coll2 = repo.create_collection(
        Schema.kv_schema(k="int*", v="int"), "reg2"
    )
    s2 = coll2.series("x")
    for c in range(args.commits):
        s2.write({
            "k": list(range(c * n, (c + 1) * n)),
            "v": [c] * n,
        })

    def timed2():
        t0 = time.perf_counter()
        rows = s2.frame(mask=mask, sort=False).count()
        return rows, round(time.perf_counter() - t0, 3)

    from lakota_spark.series import _physical_plan_str

    plan = _physical_plan_str(s2.frame(mask=mask, sort=False))
    timed2()
    rows2, secs2 = timed2()
    zonemap.prune_kv = lambda s, p: s
    pd2 = zonemap.pairwise_disjoint
    zonemap.pairwise_disjoint = lambda s: False  # force dedup plan
    try:
        timed2()
        rows2_full, secs2_full = timed2()
    finally:
        zonemap.prune_kv = orig
        zonemap.pairwise_disjoint = pd2
    out["registry_no_window_plan"] = (
        "Window" not in plan and "Exchange" not in plan
    )
    out["registry_read_s_fast"] = secs2
    out["registry_read_s_dedup_unpruned"] = secs2_full
    out["registry_speedup"] = round(secs2_full / max(secs2, 1e-9), 2)
    out["registry_rows_match"] = rows2 == rows2_full
    print(json.dumps(out))
    ok = out["rows_match"] and out["registry_rows_match"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
