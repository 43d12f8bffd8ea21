"""Scale probe for the streaming span gate (VERDICT r5 ask #8).

Measures per-micro-batch wall time of `streaming_span_clip` (static
flags) and the fold cost of `SpanFlagTracker` at 1x and 10x corpus
size, holding the batch size fixed — the question is whether
micro-batch latency grows with the LANDED corpus (it must not: the
batch side is a pruned equi-join against the materialized flags, and
the gate keeps no cross-trigger state).

Usage: python scripts/probe_stream_span.py [n_docs_base]
Prints a JSON line per scale with per-batch timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = "all rights reserved subscribe to our newsletter for daily updates today"


def corpus_rows(n: int, seed_tag: str):
    # unique filler + shared boilerplate: flags derive from the boiler
    return [
        (
            i,
            f"{seed_tag} doc {i} " + " ".join(f"tok{i}x{j}" for j in range(40)) + " " + BOILER,
        )
        for i in range(n)
    ]


def main() -> None:
    from lakota_spark.operators.dedup import (
        SpanFlagTracker,
        clip_spans_vs_flags,
        flagged_shingle_table,
    )
    from lakota_spark.session import get_spark

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batch_rows = 200
    n_batches = 5
    spark = get_spark("probe-stream-span")
    spark.sparkContext.setLogLevel("ERROR")

    for scale in (1, 10):
        n = n_base * scale
        corpus = spark.createDataFrame(
            corpus_rows(n, f"s{scale}"), "doc_id long, text string"
        )
        t0 = time.perf_counter()
        flags = flagged_shingle_table(corpus, tiers=((4, 8), (6, 2)))
        flags = flags.localCheckpoint()  # materialized, as the gate requires
        n_flags = flags.count()
        build_s = time.perf_counter() - t0

        # per-batch clip latency against the materialized flags (the
        # foreachBatch body), batch size FIXED while corpus grows
        batch_times = []
        for b in range(n_batches):
            batch = spark.createDataFrame(
                corpus_rows(batch_rows, f"batch{b}"),
                "doc_id long, text string",
            )
            t0 = time.perf_counter()
            clip_spans_vs_flags(batch, flags).write.mode(
                "overwrite"
            ).format("noop").save()
            batch_times.append(round(time.perf_counter() - t0, 3))

        # tracker fold cost at this corpus size (counts relation rewrite)
        tmp = tempfile.mkdtemp(prefix="probe-flags-")
        try:
            tracker = SpanFlagTracker(spark, tmp, tiers=((4, 8), (6, 2)))
            tracker.seed(corpus)
            batch = spark.createDataFrame(
                corpus_rows(batch_rows, "fold"), "doc_id long, text string"
            )
            t0 = time.perf_counter()
            tracker.fold(batch)
            fold_s = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        print(
            json.dumps(
                {
                    "scale": scale,
                    "corpus_docs": n,
                    "n_flags": n_flags,
                    "flags_build_s": round(build_s, 3),
                    "batch_rows": batch_rows,
                    "per_batch_s": batch_times,
                    "tracker_fold_s": fold_s,
                }
            )
        )


if __name__ == "__main__":
    main()
