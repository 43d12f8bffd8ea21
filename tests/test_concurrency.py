"""Concurrent-writer semantics (reference `tests/concurrent_test.py`):
racing writers fork the changelog; merge() recovers every write."""

import threading

from lakota_spark.schema import Schema


def test_concurrent_writers_fork_and_merge(repo):
    coll = repo.create_collection(Schema(ts="int*", value="float"), "c")
    coll.series("base").write({"ts": [0], "value": [0.0]})
    errs = []

    def writer(i):
        try:
            (repo.collection("c") / f"s{i}").write(
                {"ts": [1], "value": [float(i)]}
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    coll.merge()
    assert len(coll.changelog.leaves()) == 1
    # no write may be lost, regardless of how many forks the race produced
    assert set(coll.ls()) == {"base", *{f"s{i}" for i in range(8)}}
    # every series reads back its own value
    for i in range(8):
        vals = [r.value for r in (coll / f"s{i}").frame().collect()]
        assert vals == [float(i)]


def test_gc_spares_segment_landing_mid_scan(repo):
    # ADVICE r1 ordering invariant: gc lists the segments dir BEFORE
    # scanning revisions. A segment+commit landing between those two
    # steps is invisible to the listing — so gc must leave it alone
    # (the reversed order would see the segment, miss its commit, and
    # soft-delete live data; with timeout=0 a second pass would destroy
    # it).
    from lakota_spark.schema import Schema

    coll = repo.create_collection(Schema(ts="int*", value="float"), "race")
    s = coll.series("s")
    s.write({"ts": [1], "value": [1.0]})
    seg_prefix = coll.seg_prefix
    fs = repo.fs
    orig_ls = fs.ls
    state = {"fired": False}

    def ls_hook(rel, **kw):
        listing = orig_ls(rel, **kw)
        if rel == seg_prefix and not state["fired"]:
            state["fired"] = True
            # concurrent writer lands segment + commit AFTER the listing
            # was taken but BEFORE the revision scan
            coll.series("s").write({"ts": [50], "value": [50.0]})
        return listing

    fs.ls = ls_hook
    try:
        stats = repo.gc(timeout=0.0)
    finally:
        fs.ls = orig_ls
    assert state["fired"]
    assert stats["soft"] == 0 and stats["hard"] == 0
    got = [(r.ts, r.value) for r in s.frame().collect()]
    assert got == [(1, 1.0), (50, 50.0)]  # nothing lost
    # a later gc (with everything committed) still finds no garbage
    assert repo.gc(timeout=0.0) == {"soft": 0, "hard": 0, "resurrected": 0}


def test_concurrent_same_series_disjoint_ranges(repo):
    # reference `tests/concurrent_test.py:31-57`: parallel workers ingest
    # disjoint index ranges of ONE series, merge, then range-reads see
    # every row exactly once
    coll = repo.create_collection(Schema(ts="int*", value="float"), "ingest")
    errs = []

    def writer(i):
        try:
            lo = i * 100
            (repo.collection("ingest") / "big").write(
                {"ts": list(range(lo, lo + 100)),
                 "value": [float(i)] * 100}
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    coll.merge()
    assert len(coll.changelog.leaves()) == 1
    s = coll / "big"
    assert len(s) == 600
    # range-read inside one worker's span
    part = s.frame(start=250, stop=350, closed="l").collect()
    assert len(part) == 100
    assert {r.value for r in part} == {2.0, 3.0}


def test_chaos_writes_defrag_gc_merge(repo):
    # the riskiest interleaving in one pot: racing writers on DISJOINT
    # ranges of one series while another thread defrags and a third runs
    # soft GC. Invariant: after the dust settles + merge, every committed
    # row is present exactly once and a fresh read matches.
    coll = repo.create_collection(Schema(ts="int*", value="float"), "chaos")
    s = coll.series("x")
    s.write({"ts": [0], "value": [0.0]})
    errs = []
    stop = threading.Event()

    def writer(i):
        try:
            base = (i + 1) * 1000
            for j in range(3):
                (repo.collection("chaos") / "x").write(
                    {"ts": [base + j], "value": [float(base + j)]}
                )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def maintainer():
        try:
            while not stop.is_set():
                c = repo.collection("chaos")
                c.merge()
                c.defrag()
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def collector():
        try:
            while not stop.is_set():
                repo.gc()  # soft pass; 600 s grace spares young segments
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    writers = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    m = threading.Thread(target=maintainer)
    g = threading.Thread(target=collector)
    m.start(); g.start()
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    m.join(); g.join()
    assert not errs, errs
    coll = repo.collection("chaos")
    coll.merge()
    rows = sorted((r.ts, r.value) for r in (coll / "x").frame().collect())
    expect = sorted(
        [(0, 0.0)]
        + [((i + 1) * 1000 + j, float((i + 1) * 1000 + j))
           for i in range(4) for j in range(3)]
    )
    assert rows == expect


def test_writers_race_archiver(repo):
    """Round-7 archive vs concurrent writers: one thread hammers
    appends while another repeatedly forces archive passes with a tiny
    keep window. No write may be lost; the final log must linearize
    identically from a cold instance (manifest fast path == full
    relisting), and mid-race readers must never see a shrunken head."""
    import pandas as pd

    from lakota_spark.changelog import Changelog
    from lakota_spark.repo import Repo

    coll = repo.create_collection(Schema(ts="int*", value="float"), "arc")
    series = coll.series("s")
    series.write({"ts": [0], "value": [0.0]})
    errs = []
    stop = threading.Event()

    def archiver():
        try:
            while not stop.is_set():
                coll.changelog.maybe_archive(keep=8)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    N = 300
    arch_t = threading.Thread(target=archiver)
    arch_t.start()
    try:
        for i in range(1, N):
            series.write(
                pd.DataFrame(
                    {"ts": [i], "value": [float(i)]}
                )
            )
    finally:
        stop.set()
        arch_t.join()
    assert not errs
    # every append landed and is readable
    vals = sorted(r.ts for r in series.frame().collect())
    assert vals == list(range(N))
    # cold fast-path linearization == from-scratch full linearization
    cold = Repo(repo.root if hasattr(repo, "root") else repo.uri, repo.spark)
    got = cold.collection("arc")
    fast = [r.child for r in got.changelog.log()]
    fresh = Changelog(got.changelog.fs, got.changelog.prefix)
    full = [r.child for r in fresh._linearize(fresh.revisions())]
    assert fast == full
    assert got.series("s").frame(sort=False).count() == N


def test_trim_races_writers_and_archiver(repo):
    """Round-7 trim vs archive coherence under REAL interleaving (the
    planted end-state tests live in test_archive.py): one thread
    appends, one forces archive passes with a tiny keep window, one
    runs retention trims. Readers racing a history REWRITE may
    legitimately fail mid-flight (trim deletes revision files a
    concurrent snapshot walk might still need) — the contract under
    test is that the SYSTEM converges: the archiver never crashes or
    wedges, and after the dust settles a cold instance linearizes
    consistently (fast path == full relisting), new writes land, and
    reads work."""
    import time

    import pandas as pd

    from lakota_spark.changelog import Changelog
    from lakota_spark.repo import Repo

    coll = repo.create_collection(Schema(ts="int*", value="float"), "tra")
    series = coll.series("s")
    series.write({"ts": [0], "value": [0.0]})
    arch_errs, trim_errs, write_errs = [], [], []
    stop = threading.Event()

    def archiver():
        while not stop.is_set():
            try:
                coll.changelog.maybe_archive(keep=4)
            except Exception as exc:  # noqa: BLE001
                arch_errs.append(exc)
                return

    def trimmer():
        while not stop.is_set():
            try:
                repo.collection("tra").trim(before=time.time() - 0.2)
            except FileNotFoundError:
                pass  # racing a concurrent archiver/writer mid-walk
            except Exception as exc:  # noqa: BLE001
                trim_errs.append(exc)
                return
            time.sleep(0.05)

    threads = [
        threading.Thread(target=archiver),
        threading.Thread(target=trimmer),
    ]
    for t in threads:
        t.start()
    try:
        for i in range(1, 120):
            try:
                series.write({"ts": [i], "value": [float(i)]})
            except FileNotFoundError:
                pass  # leaf-snapshot walk raced a trim deletion
            except Exception as exc:  # noqa: BLE001
                write_errs.append(exc)
                break
    finally:
        stop.set()
        for t in threads:
            t.join()
    # the archiver must never crash (move-source-deleted tolerance) and
    # nothing else may fail in an unexpected way
    assert not arch_errs, arch_errs
    assert not trim_errs, trim_errs
    assert not write_errs, write_errs
    # convergence: cold instance reads a consistent history
    cold = Repo(repo.root if hasattr(repo, "root") else repo.uri, repo.spark)
    got = cold.collection("tra")
    fast = [r.child for r in got.changelog.log()]
    fresh = Changelog(got.changelog.fs, got.changelog.prefix)
    full = [r.child for r in fresh._linearize(fresh.revisions())]
    assert fast == full
    # the system still works: a fresh write + archive pass + read
    gs = got.series("s")
    gs.write({"ts": [10_000], "value": [1.0]})
    got.changelog.maybe_archive(keep=4)
    vals = [r.ts for r in gs.frame().collect()]
    assert 10_000 in vals


def test_stream_sink_races_gc_and_maintain(spark, repo):
    """Round 12 (VERDICT r11 #7): the native streaming SINK races a
    gc loop with a deliberately-lowered staging_timeout while
    maintain_every squashes/defrags between microbatches. The r11
    staging-grace fix is pinned statically elsewhere (a 2h-old _tmp-
    dir survives the default gc); this exercises the LIVE interleaving:
    no batch may be lost, every committed row must read back exactly
    once, and no staging dir may leak once the stream is done."""
    import tempfile

    from lakota_spark.datasource import register

    register(spark)
    src_coll = repo.create_collection(
        Schema(ts="int*", value="float", tag="str"), "ssrc"
    )
    src = src_coll.series("x")
    src.write({
        "ts": list(range(100)),
        "value": [float(i) for i in range(100)],
        "tag": ["s"] * 100,
    })
    repo.create_collection(
        Schema(ts="int*", value="float", tag="str"), "ssink"
    )
    ckpt = tempfile.mkdtemp(prefix="lakota-chaos-ckpt-")
    errs: list = []
    stop = threading.Event()

    def collector():
        # staging_timeout 30 s: far below the 6 h default but safely
        # above any microbatch's write->commit window here, so an
        # IN-FLIGHT batch's staging must survive while crashed
        # leftovers would age out; the soft/hard segment passes run at
        # full speed against the sink's commits and maintain's rewrites
        try:
            while not stop.is_set():
                repo.gc(timeout=600.0, staging_timeout=30.0)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def run_stream():
        q = (
            spark.readStream.format("lakota")
            .option("path", repo.root)
            .option("table", "ssrc/x")
            .option("startingOffsets", "earliest")
            .load()
            .writeStream.format("lakota")
            .option("path", repo.root)
            .option("table", "ssink/x")
            .option("maintain_every", "1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    g = threading.Thread(target=collector)
    g.start()
    try:
        run_stream()
        for lo in (1000, 2000, 3000):
            src.write({
                "ts": [lo, lo + 1],
                "value": [float(lo), float(lo + 1)],
                "tag": ["n", "n"],
            })
            run_stream()
    finally:
        stop.set()
        g.join()
    assert not errs, errs
    out = repo.collection("ssink").series("x")
    want = sorted(tuple(r) for r in src.frame(sort=False).collect())
    got = sorted(tuple(r) for r in out.frame(sort=False).collect())
    assert got == want
    # no orphaned staging dirs behind the finished stream
    leftovers = [
        p for p in repo.fs.ls("ssink/segments") if p.startswith("_tmp-")
    ]
    assert leftovers == []


def test_stream_admission_catchup_soak(spark, repo):
    """Round 13 (VERDICT r12 #6): the catch-up scenario at depth. A
    continuous-trigger stream with maxRevisionsPerBatch=2 falls behind
    an 80-revision backlog written while it runs and must drain it over
    >=20 BOUNDED microbatches — while the sink's maintain_every
    squashes, a gc loop runs with lowered staging_timeout, and an
    archiver loop migrates the SOURCE changelog into _archive/ under
    the reader (sealed offsets must stay resolvable mid-move). Pins:
    strictly monotonic sealed offsets, per-batch advance <= 2 after
    the (structurally unbounded) first batch, exact totals, archive
    actually fired, no staging leftovers. The 200-revision version
    lives in scripts/soak_stream_admission.py."""
    import json
    import os
    import tempfile
    import time

    from lakota_spark.changelog import ARCHIVE_DIR
    from lakota_spark.datasource import register

    register(spark)
    src_coll = repo.create_collection(
        Schema(ts="int*", value="float"), "asrc"
    )
    src = src_coll.series("x")
    src.write({"ts": [0, 1], "value": [0.0, 1.0]})
    repo.create_collection(Schema(ts="int*", value="float"), "asink")
    ckpt = tempfile.mkdtemp(prefix="lakota-admission-ckpt-")
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
                src_coll.changelog.maybe_archive(keep=0)
                time.sleep(0.05)
        except Exception as exc:  # noqa: BLE001
            errs.append(("archive", repr(exc)))

    def sink_count():
        try:
            return (
                repo.collection("asink").series("x")
                .frame(sort=False).count()
            )
        except Exception:  # noqa: BLE001 — sink not created yet
            return -1

    q = (
        spark.readStream.format("lakota")
        .option("path", repo.root)
        .option("table", "asrc/x")
        .option("startingOffsets", "earliest")
        .option("maxRevisionsPerBatch", "2")
        .load()
        .writeStream.format("lakota")
        .option("path", repo.root)
        .option("table", "asink/x")
        .option("maintain_every", "5")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    threads = [
        threading.Thread(target=gc_loop),
        threading.Thread(target=archive_loop),
    ]
    for t in threads:
        t.start()
    try:
        # batch 0 (unbounded by construction — see LakotaStreamReader)
        # drains the seed; the backlog must land AFTER the first seal
        # or it legally snowballs into batch 0
        deadline = time.time() + 120
        while time.time() < deadline and sink_count() < 2:
            time.sleep(0.2)
        assert sink_count() >= 2, "stream never drained the seed batch"
        # 80 revisions: enough to cross maybe_archive's hot-count
        # threshold (max(keep+64, 4*sqrt(total))) mid-drain
        for r in range(1, 81):
            lo = r * 10
            src.write({
                "ts": [lo, lo + 1], "value": [float(lo), float(lo + 1)],
            })
        total = src.frame(sort=False).count()
        deadline = time.time() + 300
        while time.time() < deadline and sink_count() != total:
            time.sleep(0.3)
        assert sink_count() == total, "sink never drained the backlog"
    finally:
        q.stop()
        stop.set()
        for t in threads:
            t.join()
    assert not errs, errs
    # sealed offsets from Spark's WAL: monotonic, bounded advances
    pos = {r.child: i for i, r in enumerate(src_coll.changelog.log())}
    positions = []
    odir = os.path.join(ckpt, "offsets")
    for f in sorted(
        os.listdir(odir), key=lambda s: int(s) if s.isdigit() else -1
    ):
        if not f.isdigit():
            continue
        rev = json.loads(
            open(os.path.join(odir, f)).read().splitlines()[-1]
        ).get("rev")
        if rev:
            assert rev in pos, f"sealed offset {rev} left the changelog"
            positions.append(pos[rev])
    assert len(positions) >= 20, (
        f"drain took only {len(positions)} microbatches"
    )
    assert all(b > a for a, b in zip(positions, positions[1:])), positions
    advances = [b - a for a, b in zip(positions, positions[1:])]
    assert max(advances) <= 2, advances
    # the archiver really moved source history under the reader
    arch = repo.fs.ls(f"{src_coll.changelog.prefix}/{ARCHIVE_DIR}")
    assert arch, "archiver never fired during the soak"
    # exactness + hygiene
    want = sorted(tuple(r) for r in src.frame(sort=False).collect())
    got = sorted(
        tuple(r)
        for r in repo.collection("asink").series("x")
        .frame(sort=False).collect()
    )
    assert got == want
    leftovers = [
        p for p in repo.fs.ls("asink/segments") if p.startswith("_tmp-")
    ]
    assert leftovers == []
