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
