"""Streaming-source admission-control soak (VERDICT r12 #6).

The catch-up scenario at depth: a continuous-trigger stream (lakota
source -> lakota sink, ``maxRevisionsPerBatch`` small) falls behind a
200-revision backlog written while it runs, and must drain it in
BOUNDED steps while three maintenance actors race it:

- the sink's ``maintain_every`` squashes/defrags between microbatches,
- a gc loop runs with a lowered staging_timeout (staging-grace path),
- an ARCHIVER loop runs `maybe_archive(keep=8)` on the SOURCE
  changelog — so the offsets the reader resolves migrate into
  ``_archive/`` mid-stream (the r12 unit pins never reached this
  depth; archived revisions must stay resolvable or the stream dies).

Asserted invariants (printed as one JSON line, non-zero exit on any
violation):

1. **monotonic offsets** — every sealed offset's position in the
   source changelog's linearized order strictly increases;
2. **bounded batches** — every sealed advance after the first is
   <= maxRevisionsPerBatch revisions (the first batch of a run is
   unbounded by API construction: the r13 trace shows Spark seals it
   via latestOffset BEFORE initialOffset, so no marker can exist yet —
   see LakotaStreamReader's docstring);
3. **depth** — the drain took >= 20 microbatches (a snowballed
   catch-up would take ~1);
4. **exactness** — sink rows == source rows, value-for-value;
5. **hygiene** — no orphaned ``_tmp-`` staging dirs, no gc/archiver
   exceptions.

Usage::

    python scripts/soak_stream_admission.py [--revisions 200]
        [--max-revs 10] [--trace]   # --trace records the reader's
                                    # protocol call sequence via
                                    # $LAKOTA_STREAM_TRACE
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--revisions", type=int, default=200)
    ap.add_argument("--max-revs", type=int, default=10)
    ap.add_argument("--rows-per-rev", type=int, default=5)
    ap.add_argument("--trigger-ms", type=int, default=300)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    if args.trace:
        trace_path = os.path.join(
            tempfile.mkdtemp(prefix="soak-trace-"), "calls.log"
        )
        os.environ["LAKOTA_STREAM_TRACE"] = trace_path

    from lakota_spark.datasource import register
    from lakota_spark.repo import Repo
    from lakota_spark.schema import Schema
    from lakota_spark.session import get_spark

    spark = get_spark("soak-stream-admission")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    root = tempfile.mkdtemp(prefix="soak-admission-")
    repo = Repo(root, spark)
    src_coll = repo.create_collection(
        Schema(ts="int*", value="float"), "src"
    )
    src = src_coll.series("x")
    # one seed revision: batch 0 (unbounded by construction) drains it
    src.write({"ts": [0, 1], "value": [0.0, 1.0]})
    repo.create_collection(Schema(ts="int*", value="float"), "sink")
    ckpt = tempfile.mkdtemp(prefix="soak-admission-ckpt-")

    errs: list = []
    stop = threading.Event()

    def gc_loop():
        try:
            while not stop.is_set():
                repo.gc(timeout=600.0, staging_timeout=30.0)
        except Exception as exc:  # noqa: BLE001
            errs.append(("gc", repr(exc)))

    def archive_loop():
        try:
            while not stop.is_set():
                src_coll.changelog.maybe_archive(keep=8)
                time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errs.append(("archive", repr(exc)))

    q = (
        spark.readStream.format("lakota")
        .option("path", root)
        .option("table", "src/x")
        .option("startingOffsets", "earliest")
        .option("maxRevisionsPerBatch", str(args.max_revs))
        .load()
        .writeStream.format("lakota")
        .option("path", root)
        .option("table", "sink/x")
        .option("maintain_every", "5")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=f"{args.trigger_ms} milliseconds")
        .start()
    )
    threads = [
        threading.Thread(target=gc_loop),
        threading.Thread(target=archive_loop),
    ]
    for t in threads:
        t.start()

    t0 = time.time()
    try:
        # wait for batch 0 (unbounded by construction) to drain the
        # seed revision FIRST — the admission marker only exists after
        # a sealed batch, so a backlog written before the first seal
        # would legally snowball into batch 0 and prove nothing
        seed_deadline = time.time() + 120
        while time.time() < seed_deadline:
            try:
                if (
                    repo.collection("sink").series("x")
                    .frame(sort=False).count() >= 2
                ):
                    break
            except Exception:  # noqa: BLE001 — sink not created yet
                pass
            time.sleep(0.2)
        else:
            raise AssertionError("stream never drained the seed batch")
        # build the standing backlog WHILE the stream runs: writes
        # outpace the bounded drain, so the reader falls ~revisions
        # behind and must catch up in <=max_revs steps
        for r in range(1, args.revisions + 1):
            lo = r * 10
            src.write({
                "ts": list(range(lo, lo + args.rows_per_rev)),
                "value": [float(lo + i) for i in range(args.rows_per_rev)],
            })
        total_rows = src.frame(sort=False).count()
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                if (
                    repo.collection("sink").series("x")
                    .frame(sort=False).count() == total_rows
                ):
                    break
            except Exception:  # noqa: BLE001 — sink not created yet
                pass
            time.sleep(0.5)
        else:
            raise AssertionError("sink never drained the backlog")
    finally:
        q.stop()
        stop.set()
        for t in threads:
            t.join()
    wall = round(time.time() - t0, 1)

    # ---- invariants -----------------------------------------------------
    out: dict = {"revisions": args.revisions, "max_revs": args.max_revs,
                 "wall_s": wall}
    violations: list[str] = []

    # offsets: sealed batch ends from Spark's own WAL, in batch order
    pos = {
        r.child: i for i, r in enumerate(src_coll.changelog.log())
    }
    seq = []
    odir = os.path.join(ckpt, "offsets")
    for f in sorted(os.listdir(odir), key=lambda s: int(s)
                    if s.isdigit() else -1):
        if not f.isdigit():
            continue
        lines = open(os.path.join(odir, f)).read().splitlines()
        rev = json.loads(lines[-1]).get("rev")
        if rev:
            seq.append((int(f), pos.get(rev, -2)))
    out["n_batches"] = len(seq)
    positions = [p for _, p in seq]
    if -2 in positions:
        violations.append("sealed offset not found in source changelog")
    if any(b <= a for a, b in zip(positions, positions[1:])):
        violations.append(f"offsets not strictly monotonic: {positions}")
    advances = [b - a for a, b in zip(positions, positions[1:])]
    out["max_advance_after_first"] = max(advances) if advances else 0
    if any(a > args.max_revs for a in advances):
        violations.append(
            f"batch advanced past maxRevisionsPerBatch: {advances}"
        )
    if len(seq) < 20:
        violations.append(f"drain took only {len(seq)} microbatches")

    # exactness
    want = sorted(tuple(r) for r in src.frame(sort=False).collect())
    got = sorted(
        tuple(r)
        for r in repo.collection("sink").series("x")
        .frame(sort=False).collect()
    )
    out["rows"] = len(got)
    if got != want:
        violations.append(
            f"sink rows diverge: {len(got)} vs {len(want)}"
        )

    # hygiene
    leftovers = [
        p for p in repo.fs.ls("sink/segments") if p.startswith("_tmp-")
    ]
    if leftovers:
        violations.append(f"staging leftovers: {leftovers}")
    if errs:
        violations.append(f"maintenance errors: {errs}")
    from lakota_spark.changelog import ARCHIVE_DIR

    try:
        arch = repo.fs.ls(
            f"{src_coll.changelog.prefix}/{ARCHIVE_DIR}"
        )
    except Exception:  # noqa: BLE001 — no archive dir created
        arch = []
    out["archived_revisions"] = len(arch)
    if not arch:
        violations.append(
            "archiver never fired — the soak must exercise archived-"
            "offset resolution (lower keep or raise --revisions)"
        )
    out["violations"] = violations
    if args.trace:
        out["trace"] = os.environ["LAKOTA_STREAM_TRACE"]
    print(json.dumps(out))
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
