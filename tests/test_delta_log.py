"""Fmt-3 checkpoint + delta changelog format.

The reference's changelog writes the FULL segment table per revision
(`lakota/changelog.py:27-61`); this engine writes delta entries between
periodic checkpoints so appends cost O(new) instead of O(table) — the
100×-append scale path. These tests pin the format's invariants:
checkpoint cadence, cold-replay equality with the writer's cached
snapshot, time travel through delta chains, trim re-parenting of delta
survivors, merge over delta branches, and GC/pull path discovery from
raw payloads.
"""

import json

import pytest

from lakota_spark.changelog import CHECKPOINT_EVERY, Revision
from lakota_spark.commit import Snapshot, payload_paths
from lakota_spark.schema import Schema


def _write_n(series, n, rows_per=2, start=0):
    for i in range(n):
        base = start + i * rows_per
        series.write(
            {
                "ts": list(range(base, base + rows_per)),
                "value": [float(x) for x in range(base, base + rows_per)],
            }
        )


def _payloads(coll):
    """(kind, payload) per revision in linearized order."""
    out = []
    for rev in coll.changelog.log():
        p = rev.read()
        out.append(("delta" if p.get("kind") == "delta" else "ckpt", p))
    return out


@pytest.fixture()
def coll(repo):
    return repo.create_collection(Schema(ts="int*", value="float"), "dl")


def test_delta_log_storage_matrix(any_repo):
    # the fmt-3 log is backend-agnostic: delta chains resolve and trim
    # converts orphans identically over file, HTTP, and memory backends
    import time

    coll = any_repo.create_collection(Schema(ts="int*", value="float"), "dlm")
    s = coll.series("s")
    _write_n(s, 5)
    assert coll.changelog.leaf().read().get("kind") == "delta"
    time.sleep(0.01)
    cutoff = time.time()
    time.sleep(0.01)
    _write_n(s, 3, start=10)
    Revision._PAYLOADS.clear()
    cold = any_repo.collection("dlm")
    assert cold.snapshot().length("s") == 16
    coll.trim(before=cutoff)
    Revision._PAYLOADS.clear()
    cold2 = any_repo.collection("dlm")
    assert list(cold2.series("s").df()["ts"]) == list(range(10)) + list(
        range(10, 16)
    )


def test_checkpoint_cadence_and_payload_shape(coll):
    s = coll.series("s")
    n = CHECKPOINT_EVERY + 3
    _write_n(s, n)
    kinds = [k for k, _ in _payloads(coll)]
    # root is a checkpoint, then CHECKPOINT_EVERY-1 deltas, then a
    # checkpoint again, then deltas
    assert kinds[0] == "ckpt"
    assert kinds[1:CHECKPOINT_EVERY] == ["delta"] * (CHECKPOINT_EVERY - 1)
    assert kinds[CHECKPOINT_EVERY] == "ckpt"
    assert kinds[CHECKPOINT_EVERY + 1 :] == ["delta"] * 2
    # delta payloads carry ONLY the new segments — no table snapshot
    for k, p in _payloads(coll):
        if k == "delta":
            assert "segments" not in p
            assert len(p["delta"]) == 1
            assert p["ckpt_dist"] >= 1


def test_cold_resolution_matches_writer_cache(repo, coll):
    s = coll.series("s")
    _write_n(s, 7)
    warm = coll.snapshot()
    assert warm.segments  # sanity
    # a FRESH collection instance with cleared payload memos must replay
    # the delta chain to the identical table (bounds, seq, clip markers)
    Revision._PAYLOADS.clear()
    cold_coll = repo.collection("dl")
    cold = cold_coll.snapshot()
    assert [s.to_dict(coll.schema) for s in cold.segments] == [
        s.to_dict(coll.schema) for s in warm.segments
    ]
    assert cold.max_seq == warm.max_seq


def test_cold_resolution_after_overlay_clipping(repo, coll):
    # overlapping writes exercise replay through overlay(): clipped
    # pieces (narrowed bounds + clip marker) must replay identically
    s = coll.series("s")
    s.write({"ts": [0, 1, 2, 3, 4, 5], "value": [0.0] * 6})
    s.write({"ts": [2, 3], "value": [9.0, 9.0]})  # clips the middle
    s.write({"ts": [5, 6], "value": [7.0, 7.0]})  # clips the tail
    warm = coll.snapshot()
    Revision._PAYLOADS.clear()
    cold_coll = repo.collection("dl")
    cold = cold_coll.snapshot()
    assert [s.to_dict(coll.schema) for s in cold.segments] == [
        s.to_dict(coll.schema) for s in warm.segments
    ]
    df = cold_coll.series("s").df()
    assert list(df["value"]) == [0.0, 0.0, 9.0, 9.0, 0.0, 7.0, 7.0]


def test_from_payload_refuses_delta(coll):
    s = coll.series("s")
    _write_n(s, 2)
    leaf = coll.changelog.leaf()
    assert leaf.read().get("kind") == "delta"
    with pytest.raises(ValueError):
        Snapshot.from_payload(leaf.read(), coll.schema)


def test_time_travel_at_delta_revision(repo, coll):
    import time

    s = coll.series("s")
    stamps = []
    for i in range(5):
        _write_n(s, 1, start=i * 2)
        time.sleep(0.002)
        stamps.append(time.time())
    # before= lands on delta revisions; each resolves to i+1 writes
    for i, ts in enumerate(stamps):
        snap = coll.snapshot(before=ts)
        assert snap.length("s") == (i + 1) * 2
    # and cold (no caches) too
    Revision._PAYLOADS.clear()
    cold = repo.collection("dl")
    assert cold.snapshot(before=stamps[2]).length("s") == 6


def test_trim_cutoff_reparents_delta_survivor(repo, coll):
    import time

    s = coll.series("s")
    _write_n(s, 3)  # old history
    time.sleep(0.01)
    cutoff = time.time()
    time.sleep(0.01)
    _write_n(s, 3, start=6)  # survivors: delta revisions
    # the first survivor's parent dies with the cutoff → it must be
    # materialized as a checkpoint, not replayed against the new root
    coll.trim(before=cutoff)
    Revision._PAYLOADS.clear()
    cold = repo.collection("dl")
    df = cold.series("s").df()
    assert list(df["ts"]) == list(range(12))
    # history above the cutoff is still reachable: time travel to just
    # after the 4th write sees 8 rows
    revs = cold.changelog.log()
    assert len(revs) >= 4  # new root + 3 surviving revisions
    # every surviving revision resolves cleanly
    for rev in revs:
        assert cold._snapshot_at(rev).length("s") % 2 == 0


def test_merge_over_delta_branches(repo, coll):
    # fork from a DELTA head: branch A writes through the normal path,
    # branch B is a raced delta commit parented on the captured leaf —
    # merge must replay both branches' deltas onto the resolved base
    s = coll.series("s")
    _write_n(s, 3)
    leaf = coll.changelog.leaf()
    assert leaf.read().get("kind") == "delta"
    s.write({"ts": [100, 101], "value": [1.0, 1.0]})  # branch A
    # branch B: write through the normal path (lands after A), then
    # re-home the delta revision onto the captured pre-A leaf — the same
    # shape a raced concurrent writer would produce
    b = repo.collection("dl")
    b.series("s").write({"ts": [200, 201], "value": [2.0, 2.0]})
    b_leaf = b.changelog.leaf()
    b_payload = dict(b_leaf.read())
    coll.fs.remove_file(b_leaf.rel)
    b_payload["ckpt_dist"] = int(leaf.read().get("ckpt_dist", 0)) + 1
    coll.changelog._log_cache = None
    coll.changelog.commit(b_payload, parents=[leaf.child], force=True)
    assert len(coll.changelog.leaves()) == 2
    coll.merge()
    assert len(coll.changelog.leaves()) == 1
    # merge commit is a checkpoint (multi-parent ⇒ never a delta)
    merged = coll.changelog.leaf()
    assert merged.read().get("kind") != "delta"
    Revision._PAYLOADS.clear()
    cold = repo.collection("dl")
    ts = list(cold.series("s").df()["ts"])
    assert ts == [0, 1, 2, 3, 4, 5, 100, 101, 200, 201]


def test_payload_paths_covers_delta_only_segments(coll):
    s = coll.series("s")
    _write_n(s, 5)
    union = set()
    for rev in coll.changelog.revisions():
        union |= payload_paths(rev.read())
    live = coll.snapshot().paths()
    assert live <= union
    assert len(union) == 5  # one content-addressed dir per write


def test_gc_keeps_delta_referenced_segments(repo, coll):
    s = coll.series("s")
    _write_n(s, 4)
    stats = repo.gc(timeout=600)
    assert stats["soft"] == 0  # nothing referenced only by deltas got GC'd
    Revision._PAYLOADS.clear()
    df = repo.collection("dl").series("s").df()
    assert len(df) == 8


def test_pull_and_shallow_pull_delta_chain(repo, spark, tmp_path):
    from lakota_spark.repo import Repo

    coll = repo.create_collection(Schema(ts="int*", value="float"), "dl2")
    _write_n(coll.series("s"), 6)
    other = Repo(str(tmp_path / "replica"), spark)
    dst = other.create_collection(Schema(ts="int*", value="float"), "dl2")
    n = dst.pull(coll)
    assert n == 6
    Revision._PAYLOADS.clear()
    assert list(dst.series("s").df()["ts"]) == list(range(12))
    # shallow: leaf is a delta — must resolve on the source side
    other2 = Repo(str(tmp_path / "shallow"), spark)
    dst2 = other2.create_collection(Schema(ts="int*", value="float"), "dl2")
    dst2.pull(coll, shallow=True)
    assert len(dst2.changelog.revisions()) == 1
    leaf = dst2.changelog.leaf()
    assert leaf.read().get("kind") != "delta"
    assert list(dst2.series("s").df()["ts"]) == list(range(12))


def test_maintenance_noop_does_not_mint_revisions(coll):
    s = coll.series("s")
    _write_n(s, 3)
    n = len(coll.changelog.revisions())
    coll.delete_series("missing-label")
    coll.rename_series("also-missing", "whatever")
    assert len(coll.changelog.revisions()) == n


def test_double_write_noop_survives_delta_head(coll):
    s = coll.series("s")
    payload = {"ts": [0, 1, 2], "value": [1.0, 2.0, 3.0]}
    s.write(payload)
    s.write({"ts": [10, 11], "value": [1.0, 1.0]})  # head is now a delta
    n = len(coll.changelog.revisions())
    s.write({"ts": [10, 11], "value": [1.0, 1.0]})  # identical re-write
    assert len(coll.changelog.revisions()) == n


def test_adaptive_checkpoint_cadence(repo, coll, monkeypatch):
    # the cadence grows with the table so amortized checkpoint bytes per
    # commit stay constant; resolution is cadence-agnostic
    import lakota_spark.changelog as cl

    monkeypatch.setattr(cl, "CHECKPOINT_EVERY", 4)
    monkeypatch.setattr(cl, "CHECKPOINT_MAX", 8)
    monkeypatch.setattr(cl, "SEGS_PER_CKPT", 1)
    s = coll.series("s")
    # phase 1: repeated overwrites of the same interval — the table
    # stays at ~1 segment, so the cadence sits at the floor (4)
    for i in range(13):
        s.write({"ts": [0, 1], "value": [float(i), float(i + 1)]})
    # phase 2: appends — the table grows past the cap threshold and the
    # cadence widens to CHECKPOINT_MAX (8)
    _write_n(s, 40, start=100)
    kinds = [k for k, _ in _payloads(coll)]
    ckpt_pos = [i for i, k in enumerate(kinds) if k == "ckpt"]
    gaps = [b - a for a, b in zip(ckpt_pos, ckpt_pos[1:])]
    assert gaps[0] == 4      # small table: floor cadence
    assert gaps[-1] == 8     # grown table: capped cadence
    assert all(4 <= g <= 8 for g in gaps)
    # cold resolution still exact across the variable spacing
    Revision._PAYLOADS.clear()
    cold = repo.collection("dl")
    assert cold.snapshot().length("s") == 82  # 2 overwritten + 80 appended
    assert [x.to_dict(coll.schema) for x in cold.snapshot().segments] == [
        x.to_dict(coll.schema) for x in coll.snapshot().segments
    ]


def test_same_ms_identical_payload_commits_get_distinct_children():
    # child ids are {hextime}-{sha1(payload)}: identical payloads at
    # different chain positions inside one wall-clock millisecond must
    # NOT collide (a collision fabricates a two-parent merge node and
    # cold replay diverges — caught by the Hypothesis suite when the
    # r7 commit path got fast enough). hexts() is monotonic in-process.
    import time as time_mod
    import uuid

    import lakota_spark.changelog as cl
    from lakota_spark.fsio import MemFS, open_fs

    uri = f"memory://samems-{uuid.uuid4().hex}"
    fs = open_fs(uri)
    log = cl.Changelog(fs, "log")
    frozen = time_mod.time()
    orig = cl.time.time
    cl.time.time = lambda: frozen  # freeze the wall clock
    try:
        a = log.commit({"delta": [], "kind": "delta"}, force=True)
        b = log.commit(
            {"delta": [], "kind": "delta"}, parents=[a.child], force=True
        )
        c = log.commit(
            {"delta": [], "kind": "delta"}, parents=[b.child], force=True
        )
        assert len({a.child, b.child, c.child}) == 3
        lin = [r.child for r in log.log()]
        assert lin == [a.child, b.child, c.child]
    finally:
        cl.time.time = orig
        MemFS._STORES.pop(uri, None)
