"""Property-based check of the changelog history archive (round 7).

Random interleavings of appends (including duplicate payloads),
forced archive passes, stale-parent branch commits, merges and trims —
after EVERY operation the manifest fast path must linearize exactly
like a from-scratch full hot+archive relisting, and the head snapshot
must resolve. Runs on MemFS with the no-Spark stub collection (the
delta-log-property pattern)."""

import uuid

from hypothesis import given, settings
from hypothesis import strategies as st

import lakota_spark.changelog as cl
from lakota_spark.changelog import Changelog
from lakota_spark.collection import Collection
from lakota_spark.commit import Segment
from lakota_spark.schema import Schema


class _StubRepo:
    def __init__(self, fs):
        self.fs = fs
        self.spark = None


ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 30)),
        st.tuples(st.just("archive"), st.integers(2, 6)),  # keep
        st.tuples(st.just("branch"), st.integers(0, 100)),  # stale depth %
        st.tuples(st.just("merge"), st.just(0)),
        st.tuples(st.just("trim"), st.integers(0, 100)),  # cutoff pos %
    ),
    min_size=3,
    max_size=18,
)


def _check_consistency(coll):
    fast = [r.child for r in coll.changelog.log()]
    fresh = Changelog(coll.changelog.fs, coll.changelog.prefix)
    full = [r.child for r in fresh._linearize(fresh.revisions())]
    assert fast == full, "fast-path linearization diverged from relist"
    if fast:
        # head must resolve through checkpoints/deltas without error
        coll._snap_cache = None
        snap = coll.snapshot()
        assert snap is not None


@settings(max_examples=60, deadline=None)
@given(ops=ops_strategy)
def test_archive_fastpath_equals_relist_under_chaos(ops):
    from lakota_spark.fsio import MemFS, open_fs

    uri = f"memory://archprop-{uuid.uuid4().hex}"
    fs = open_fs(uri)
    old = (cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT)
    cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT = 3, 6, 2
    try:
        coll = Collection(
            _StubRepo(fs), "c", Schema(ts="int*", value="float")
        )
        i = 0
        for kind, arg in ops:
            log = coll.changelog.log()
            if kind == "append":
                lo = arg * 10
                coll.apply_segments(
                    [
                        Segment(
                            label="s",
                            start=(lo,),
                            stop=(lo + 9,),
                            path=f"sha-{i}",
                            length=10,
                        )
                    ]
                )
                i += 1
            elif kind == "archive":
                coll.changelog.maybe_archive(keep=arg)
            elif kind == "branch" and log:
                # commit onto a STALE parent (possibly archived interior)
                parent = log[arg * (len(log) - 1) // 100]
                seg = Segment(
                    label="s",
                    start=(i * 10,),
                    stop=(i * 10 + 9,),
                    path=f"sha-b{i}",
                    length=10,
                )
                payload = {
                    "fmt": 3,
                    "segments": [seg.to_dict(coll.schema)],
                    "max_seq": 1,
                    "delta": [seg.to_dict(coll.schema)],
                }
                coll.changelog.commit(
                    payload, parents=[parent.child], force=True
                )
                i += 1
            elif kind == "merge":
                if len(coll.changelog.leaves()) > 1:
                    coll.merge()
            elif kind == "trim" and log:
                cutoff = log[arg * (len(log) - 1) // 100].epoch + 0.0005
                coll.trim(before=cutoff)
            coll._snap_cache = None
            _check_consistency(coll)
        # cold instance agrees at the end
        cold = Collection(
            _StubRepo(fs), "c", Schema(ts="int*", value="float")
        )
        _check_consistency(cold)
        assert [r.child for r in cold.changelog.log()] == [
            r.child for r in coll.changelog.log()
        ]
    finally:
        cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT = old
        MemFS._STORES.pop(uri, None)
