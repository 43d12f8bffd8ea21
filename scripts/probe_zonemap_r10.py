"""Zone-map pruning probe: a fragmented series (200 segments, disjoint
value ranges per segment) read with a mask that matches one segment —
with zone maps consulted vs ignored (prune disabled).  Measures the
frame() wall time and the pandas df() path.

Usage: python scripts/probe_zonemap_r10.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakota_spark import zonemap  # noqa: E402
from lakota_spark.repo import Repo  # noqa: E402
from lakota_spark.schema import Schema  # noqa: E402
from lakota_spark.session import get_spark  # noqa: E402

N_SEGS = 200
ROWS_PER_SEG = 5_000


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakota-zmprobe-")
    repo = Repo(f"file://{root}")
    clc = repo.create_collection(Schema(i="int*", v="int"), "zp")
    srs = clc.series("s")
    for seg in range(N_SEGS):
        base = seg * ROWS_PER_SEG
        srs.write({
            "i": list(range(base, base + ROWS_PER_SEG)),
            "v": [seg * 1000 + (j % 1000) for j in range(ROWS_PER_SEG)],
        })
    mask = "(and (>= self.v 100000) (< self.v 101000))"  # seg 100 only

    def spark_read():
        srs.frame(mask=mask).write.format("noop").mode("overwrite").save()

    def pandas_read():
        srs.df(mask=mask)

    t_frame = best2(spark_read)
    t_df = best2(pandas_read)

    real_prune = zonemap.prune
    try:
        zonemap.prune = lambda segs, plan: segs  # disable
        t_frame_off = best2(spark_read)
        t_df_off = best2(pandas_read)
    finally:
        zonemap.prune = real_prune

    n_live = len(srs.segments())
    n_kept = len(zonemap.prune(srs.segments(), None))  # sanity: no plan
    print(f"segments: {n_live} (no-plan prune keeps {n_kept})")
    print(f"frame(mask) zonemap ON : {t_frame:.3f} s")
    print(f"frame(mask) zonemap OFF: {t_frame_off:.3f} s")
    print(f"df(mask)    zonemap ON : {t_df:.3f} s")
    print(f"df(mask)    zonemap OFF: {t_df_off:.3f} s")


if __name__ == "__main__":
    main()
