"""Property-based check of the fmt-3 checkpoint+delta changelog.

Drives the REAL commit machinery (Collection._commit → Changelog →
payload files on MemFS) with random write/overwrite/delete sequences at
random checkpoint cadences — no Spark, no parquet: segments carry fake
content addresses, which is all the log ever stores. Invariants:

1. Cold resolution (fresh Collection, cleared payload memos) replays to
   a table bit-identical to the writer's incrementally-overlaid cache.
2. `_snapshot_at` on EVERY intermediate revision equals the table the
   writer held right after that commit (time-travel correctness at
   arbitrary points of the delta chain, across checkpoint boundaries).
"""

import shutil
import tempfile
import uuid

from hypothesis import given, settings
from hypothesis import strategies as st

import lakota_spark.changelog as cl
from lakota_spark.changelog import Revision
from lakota_spark.collection import Collection
from lakota_spark.commit import Segment
from lakota_spark.schema import Schema


class _StubRepo:
    def __init__(self, fs):
        self.fs = fs
        self.spark = None


def _mk_coll(fs):
    return Collection(
        _StubRepo(fs), "c", Schema(ts="int*", value="float")
    )


ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["write", "delete"]),
        st.integers(0, 20),                    # lo
        st.integers(0, 20),                    # width
        st.sampled_from(["b", "l", "r", "n"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(
    ops=ops_strategy,
    every=st.integers(2, 6),
    cap=st.integers(6, 10),
)
def test_cold_replay_equals_writer_state_at_any_cadence(ops, every, cap):
    from lakota_spark.fsio import open_fs

    uri = f"memory://dlp-{uuid.uuid4().hex}"
    fs = open_fs(uri)
    old = (cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT)
    cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT = every, cap, 2
    try:
        coll = _mk_coll(fs)
        history = []  # (revision child id, table dicts at that commit)
        for i, (kind, lo, width, closed) in enumerate(ops):
            hi = lo + width
            from lakota_spark.series import CLOSED

            lo_c, hi_c = CLOSED[closed]
            seg = Segment(
                label="s",
                start=(lo,),
                stop=(hi,),
                start_closed=lo_c,
                stop_closed=hi_c,
                path=None if kind == "delete" else f"sha-{i}",
                length=0 if kind == "delete" else width + 1,
            )
            rev = coll.apply_segments([seg])
            if rev is not None:
                snap = coll.snapshot()
                history.append(
                    (
                        rev.child,
                        [s.to_dict(coll.schema) for s in snap.segments],
                    )
                )
        if not history:
            return
        # (1) cold full replay == writer cache
        Revision._PAYLOADS.clear()
        cold = _mk_coll(fs)
        got = [s.to_dict(cold.schema) for s in cold.snapshot().segments]
        assert got == history[-1][1]
        # (2) every intermediate revision resolves to the table the
        # writer held right after committing it
        by_child = {r.child: r for r in cold.changelog.log()}
        for child, want in history:
            Revision._PAYLOADS.clear()
            snap_i = cold._snapshot_at(by_child[child])
            assert [
                s.to_dict(cold.schema) for s in snap_i.segments
            ] == want, f"divergence at revision {child[:20]}"
    finally:
        cl.CHECKPOINT_EVERY, cl.CHECKPOINT_MAX, cl.SEGS_PER_CKPT = old
        from lakota_spark.fsio import MemFS

        MemFS._STORES.pop(uri, None)
