"""Changelog history archive (round 7): old revision files move behind
a ``_manifest-*`` cursor into ``_archive/`` so the per-commit listing is
O(recent window) — with FULL history intact: cold readers, time travel,
merge, pull and trim must all see archived revisions.

The flat-append claim itself is probed in NOTES (10k appends); these
tests pin the correctness surface.
"""

import numpy as np
import pandas as pd
import pytest

from lakota_spark.changelog import ARCHIVE_DIR, Changelog
from lakota_spark.repo import Repo
from lakota_spark.schema import Schema

N_COMMITS = 220  # enough checkpoints to cross the archive threshold
CHUNK = 20


@pytest.fixture()
def archived_repo(spark, tmp_path):
    root = str(tmp_path / "arch-repo")
    repo = Repo(root, spark)
    coll = repo.create_collection(
        Schema(timestamp="int*", value="float"), "c"
    )
    series = coll.series("s")
    for c in range(N_COMMITS):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    return root, repo, coll


def _layout(coll):
    fs, prefix = coll.changelog.fs, coll.changelog.prefix
    hot = [
        f
        for f in fs.ls(prefix)
        if f.endswith(".json") and not f.startswith("_manifest")
    ]
    manifests = [f for f in fs.ls(prefix) if f.startswith("_manifest")]
    arch = fs.ls(f"{prefix}/{ARCHIVE_DIR}")
    return hot, manifests, arch


def test_archive_triggers_and_bounds_hot(archived_repo):
    _, _, coll = archived_repo
    hot, manifests, arch = _layout(coll)
    assert len(manifests) == 1
    assert len(arch) > 0
    assert len(hot) + len(arch) == N_COMMITS
    # hot stays bounded by threshold (keep+64=128 at this size) plus one
    # checkpoint cadence (32) of slack — archives run at checkpoints
    assert len(hot) <= 160


def test_cold_reader_sees_full_history(spark, archived_repo):
    root, _, coll = archived_repo
    n = coll.series("s").frame(sort=False).count()
    assert n == N_COMMITS * CHUNK
    cold = Repo(root, spark).collection("c")
    assert cold.series("s").frame(sort=False).count() == N_COMMITS * CHUNK
    # the manifest fast path must equal a from-scratch full linearization
    fast = [r.child for r in cold.changelog.log()]
    fresh = Changelog(cold.changelog.fs, cold.changelog.prefix)
    full = [r.child for r in fresh._linearize(fresh.revisions())]
    assert fast == full
    assert len(fast) == N_COMMITS


def test_time_travel_into_archived_region(spark, archived_repo):
    root, _, coll = archived_repo
    log = coll.changelog.log()
    mid = log[N_COMMITS // 2]
    cold = Repo(root, spark).collection("c")
    snap = cold.snapshot(before=mid.epoch + 0.0005)
    rows = sum(s.length for s in snap.for_label("s"))
    assert rows == (N_COMMITS // 2 + 1) * CHUNK


def test_trim_across_archive_boundary_cold_reader(spark, archived_repo):
    root, _, coll = archived_repo
    log = coll.changelog.log()
    cutoff = log[N_COMMITS - 50].epoch
    coll.trim(before=cutoff)
    # manifest cursor dropped; survivors (some still physically in
    # _archive) must stay visible to a COLD instance
    _, manifests, _ = _layout(coll)
    assert manifests == []
    cold = Repo(root, spark).collection("c")
    assert (
        cold.series("s").frame(sort=False).count() == N_COMMITS * CHUNK
    )
    # appends + a fresh archive cycle work after the reset
    series = cold.series("s")
    for c in range(N_COMMITS, N_COMMITS + 100):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    again = Repo(root, spark).collection("c")
    assert (
        again.series("s").frame(sort=False).count()
        == (N_COMMITS + 100) * CHUNK
    )


def test_stale_parent_branch_falls_back_and_merges(spark, archived_repo):
    """A writer committing onto a parent that has since been ARCHIVED
    (interior attachment) must not lose data: the fast path declines,
    the full linearization sees both branches, merge reconciles."""
    root, _, coll = archived_repo
    log = coll.changelog.log()
    stale_parent = log[N_COMMITS // 2]
    # hand-commit a branch off the archived interior revision
    payload = {"fmt": 3, "kind": "delta", "ckpt_dist": 1, "delta": []}
    branch = coll.changelog.commit(
        payload, parents=[stale_parent.child], force=True
    )
    assert branch is not None
    cold = Repo(root, spark).collection("c")
    full_log = cold.changelog.log()
    assert {r.child for r in full_log} >= {branch.child, log[-1].child}
    leaves = cold.changelog.leaves()
    assert len(leaves) == 2
    cold.merge()
    merged = Repo(root, spark).collection("c")
    assert merged.series("s").frame(sort=False).count() == N_COMMITS * CHUNK
    assert len(merged.changelog.leaves()) == 1


def test_pull_replicates_archived_history(spark, archived_repo, tmp_path):
    root, repo, coll = archived_repo
    dst_root = str(tmp_path / "replica")
    dst = Repo(dst_root, spark)
    dst.pull(repo)
    got = dst.collection("c")
    assert got.series("s").frame(sort=False).count() == N_COMMITS * CHUNK
    assert len(got.changelog.log()) == N_COMMITS
    # hot/archive placement preserved: the replica must not dump the
    # archived history into its hot directory
    src_hot, _, src_arch = _layout(coll)
    dst_hot, dst_manifests, dst_arch = _layout(got)
    assert sorted(dst_hot) == sorted(src_hot)
    assert sorted(dst_arch) == sorted(src_arch)
    # pull publishes its own cursor over the copied archive (archive
    # files without a hot-listing manifest would be invisible to peers
    # with a cached no-archive probe) — and the cursor must be VALID so
    # the fast log path works immediately
    assert len(dst_manifests) == 1
    cl = Changelog(got.changelog.fs, got.changelog.prefix)
    chain = cl._chain_for(dst_manifests[0])
    assert chain is not None and len(chain) == len(dst_arch)


def test_pull_flips_stale_peer_with_cached_no_archive_probe(
    spark, archived_repo, tmp_path
):
    # A long-lived Changelog on the DESTINATION that probed
    # exists(_archive)=False before the pull must still converge to the
    # pulled history: the manifest published by pull() appears in its
    # hot listing and flips _maybe_archived, otherwise the pulled hot
    # revisions (parents in the invisible archive) linearize as
    # detached and the peer stays pinned to its stale leaf forever.
    root, repo, coll = archived_repo
    dst_root = str(tmp_path / "replica2")
    dst = Repo(dst_root, spark)
    # peer opens the (empty) destination collection path and caches the
    # no-archive probe before any history exists
    dst_probe = Repo(dst_root, spark)
    dst.pull(repo)  # creates the collection + archived files
    got = dst.collection("c")
    peer = Changelog(got.changelog.fs, got.changelog.prefix)
    assert peer._archived_possible() in (True, False)  # cold: probes
    # simulate the stale cached state explicitly: a peer that probed
    # before the pull
    peer._maybe_archived = False
    log = peer.log()
    assert len(log) == N_COMMITS  # manifest in hot listing flipped it
    assert log[-1].child == coll.changelog.leaf().child
    del dst_probe


# --- retention trim / maintain(keep=) ------------------------------------


def test_trim_cutoff_retains_time_travel_window(spark, tmp_path):
    """trim(before=cutoff) re-roots at the CUTOFF-TIME state with a
    pinned hextime, so ``before=t`` for t inside the retained window
    still resolves to the state as of t (round-7 semantic: previously
    the replacement root carried a now-epoch and window queries came
    back empty)."""
    import time

    repo = Repo(str(tmp_path / "tt"), spark)
    coll = repo.create_collection(Schema(ts="int*", value="float"), "c")
    series = coll.series("s")
    epochs = []
    for c in range(30):
        series.write(
            pd.DataFrame(
                {"ts": np.arange(c * 10, c * 10 + 10),
                 "value": np.zeros(10)}
            )
        )
        epochs.append(coll.changelog.leaf().epoch)
    time.sleep(0.002)
    cutoff = epochs[20] + 0.0005  # keep the last ~9 revisions
    coll.trim(before=cutoff)
    # head: full data
    assert coll.series("s").frame(sort=False).count() == 300
    # inside the window: exact historical state (as of revision 25)
    cold = Repo(str(tmp_path / "tt"), spark).collection("c")
    snap = cold.snapshot(before=epochs[25] + 0.0005)
    assert sum(s.length for s in snap.for_label("s")) == 260
    # between cutoff and first survivor: the cutoff state
    snap0 = cold.snapshot(before=cutoff)
    assert sum(s.length for s in snap0.for_label("s")) == 210
    # before the cutoff: history is gone
    assert cold.snapshot(before=epochs[5]).for_label("s") == []
    # idempotent: same cutoff -> same content-addressed root, no growth
    n_revs = len(cold.changelog.revisions())
    coll.trim(before=cutoff)
    assert len(coll.changelog.revisions()) == n_revs


def test_maintain_keep_retains_window(spark, tmp_path):
    import datetime as dt
    import time

    repo = Repo(str(tmp_path / "mk"), spark)
    coll = repo.create_collection(Schema(ts="int*", value="float"), "c")
    series = coll.series("s")
    epochs = []
    for c in range(40):
        series.write(
            pd.DataFrame(
                {"ts": np.arange(c * 10, c * 10 + 10),
                 "value": np.zeros(10)}
            )
        )
        epochs.append(coll.changelog.leaf().epoch)
    mid_epoch = epochs[20]
    time.sleep(0.05)
    out = coll.maintain(
        max_revisions=10,
        max_segments=None,
        keep=dt.timedelta(seconds=time.time() - mid_epoch + 0.001),
    )
    assert out["action"] == "squash"
    # the squash ran through trim(cutoff): revisions after the cutoff
    # survive, so a window query still time-travels
    assert coll.series("s").frame(sort=False).count() == 400
    later = coll.changelog.log()
    assert len(later) > 1  # not a single collapsed root
    cold = Repo(str(tmp_path / "mk"), spark).collection("c")
    # time travel to a retained revision's exact epoch: state as of
    # revision 25 (queries floor to the retention cutoff state below
    # the first survivor). NB: maintain squashes via defrag-then-trim,
    # so intermediate revisions reflect the defragged layout; row
    # counts remain exact
    snap = cold.snapshot(before=epochs[25] + 0.0005)
    assert sum(s.length for s in snap.for_label("s")) == 260


def test_archive_on_memfs_backend(spark):
    """The archive verbs (makedirs/move/atomic manifest) must work on
    every fsio backend — drive the whole cycle on MemFS with the
    no-Spark stub collection (delta-log-property pattern)."""
    import uuid

    import lakota_spark.changelog as cl
    from lakota_spark.collection import Collection
    from lakota_spark.commit import Segment
    from lakota_spark.fsio import MemFS, open_fs

    uri = f"memory://arch-{uuid.uuid4().hex}"
    fs = open_fs(uri)

    class _StubRepo:
        def __init__(self, f):
            self.fs = f
            self.spark = None

    coll = Collection(_StubRepo(fs), "c", Schema(ts="int*", value="float"))
    n = 260
    for i in range(n):
        coll.apply_segments(
            [
                Segment(
                    label="s",
                    start=(i * 10,),
                    stop=(i * 10 + 9,),
                    path=f"sha-{i}",
                    length=10,
                )
            ]
        )
    hot = [
        f
        for f in fs.ls(coll.changelog.prefix)
        if f.endswith(".json") and not f.startswith("_manifest")
    ]
    arch = fs.ls(f"{coll.changelog.prefix}/{ARCHIVE_DIR}")
    assert len(arch) > 0 and len(hot) + len(arch) == n
    # cold instance resolves the full table through the manifest
    cold = Collection(_StubRepo(fs), "c", Schema(ts="int*", value="float"))
    snap = cold.snapshot()
    assert sum(s.length for s in snap.for_label("s")) == n * 10
    assert len(cold.changelog.log()) == n
    MemFS._STORES.pop(uri, None)


# --- trim vs concurrent archive pass (race end-states) --------------------


def test_trim_purges_doomed_copy_raced_into_archive(spark, tmp_path):
    # End-state of the race: a concurrent writer's maybe_archive() moves
    # a doomed revision hot -> _archive between trim's listing and its
    # remove_file (which no-ops on the missing hot path). Simulated by
    # COPYING a doomed file into _archive before the trim: the first
    # deletion pass removes the hot copy only, and the second
    # basename-keyed pass must purge the archived copy — otherwise it
    # survives with its parent chain deleted and (sharing a child id
    # with a re-parented survivor edge) inflates that child's merge
    # edge-count, vanishing the survivor from linearization.
    root = str(tmp_path / "race-repo")
    repo = Repo(root, spark)
    coll = repo.create_collection(
        Schema(timestamp="int*", value="float"), "c"
    )
    series = coll.series("s")
    for c in range(8):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    cl = coll.changelog
    log = cl.log()
    cutoff = log[4].epoch
    doomed = log[2]  # strictly below the cutoff
    arch = f"{cl.prefix}/{ARCHIVE_DIR}"
    cl.fs.makedirs(arch)
    cl.fs.write_bytes_atomic(
        f"{arch}/{doomed.basename}", cl.fs.read_bytes(doomed.rel)
    )
    coll.trim(before=cutoff)
    assert doomed.basename not in cl.fs.ls(arch, sort=False)
    cold = Repo(root, spark).collection("c")
    assert cold.series("s").frame(sort=False).count() == 8 * CHUNK
    # full history below the cutoff is gone, retained window readable
    assert len(cold.changelog.log()) >= 8 - 4


def test_maybe_archive_skips_unreachable_strays(spark, tmp_path):
    # ONE stray (unreachable revision file — e.g. left by a racing trim,
    # or a mid-pull child whose parents haven't landed) must not disable
    # archiving forever: the reachable prefix still archives and the
    # stray stays in place.
    root = str(tmp_path / "stray-repo")
    repo = Repo(root, spark)
    coll = repo.create_collection(
        Schema(timestamp="int*", value="float"), "c"
    )
    series = coll.series("s")
    for c in range(N_COMMITS):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    cl = coll.changelog
    hot, manifests, arch = _layout(coll)
    assert len(arch) > 0  # archiving worked before the stray
    # plant a stray: a revision file whose parent never existed
    real = next(f for f in hot if not f.startswith("_"))
    child_id = real.split(".")[1]
    stray_name = f"{'f' * 11}-{'0' * 40}.{child_id}.json"
    cl.fs.write_bytes_atomic(
        f"{cl.prefix}/{stray_name}", cl.fs.read_bytes(f"{cl.prefix}/{real}")
    )
    cl2 = Changelog(cl.fs, cl.prefix)
    n_before = len(cl2.log())
    # force passes until the hot window would normally archive again
    for c in range(N_COMMITS, N_COMMITS + 120):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    _, _, arch_after = _layout(coll)
    assert len(arch_after) > len(arch)  # archiving continued past the stray
    assert stray_name not in arch_after  # stray never baked into archive
    cold = Changelog(cl.fs, cl.prefix)
    assert len(cold.log()) == n_before + 120


def test_trim_purges_raced_copy_of_reparented_edge(spark, tmp_path):
    # The raced hot->_archive move can hit a file trim RE-PARENTS (not
    # just one it dooms): the stale archived old-parent edge then gives
    # the re-parented child TWO parent edges, one unreachable, so the
    # survivor (and all its descendants) vanish from linearization.
    # The second purge pass must cover every removed edge basename.
    root = str(tmp_path / "race-repo2")
    repo = Repo(root, spark)
    coll = repo.create_collection(
        Schema(timestamp="int*", value="float"), "c"
    )
    series = coll.series("s")
    for c in range(8):
        lo = c * CHUNK
        series.write(
            pd.DataFrame(
                {
                    "timestamp": np.arange(lo, lo + CHUNK),
                    "value": np.arange(lo, lo + CHUNK, dtype="f8"),
                }
            )
        )
    cl = coll.changelog
    log = cl.log()
    cutoff = log[4].epoch
    orphan = log[4]  # first survivor: parent below the cutoff
    arch = f"{cl.prefix}/{ARCHIVE_DIR}"
    cl.fs.makedirs(arch)
    cl.fs.write_bytes_atomic(
        f"{arch}/{orphan.basename}", cl.fs.read_bytes(orphan.rel)
    )
    coll.trim(before=cutoff)
    assert orphan.basename not in cl.fs.ls(arch, sort=False)
    cold = Repo(root, spark).collection("c")
    # the re-parented survivor chain is fully visible
    assert cold.series("s").frame(sort=False).count() == 8 * CHUNK
    assert cold.changelog.leaf().child == log[-1].child
