"""Interval overlap join: differential battery vs the naive cartesian
formulation, explosion bounds, and the no-nested-loop plan contract."""

import random

from pyspark.sql import functions as F

from lakota_spark.operators.interval import (
    _explode_intervals,
    _n_levels,
    interval_join,
    overlap_length,
)
from lakota_spark.plans import join_strategies


def _naive_pairs(lrows, rrows, keyed=False):
    """Ground truth: all-pairs filter on the half-open overlap test."""
    out = set()
    for lid, lk, ls, le in lrows:
        for rid, rk, rs, re_ in rrows:
            if keyed and lk != rk:
                continue
            # nonempty intersection (the textbook ls<re & rs<le form is
            # only equivalent when both intervals are nonempty)
            if max(ls, rs) < min(le, re_):
                out.add((lid, rid))
    return out


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(i, k, s, e) for i, k, s, e in rows],
        f"{prefix}id long, k string, {prefix}s long, {prefix}e long",
    )


def _rand_rows(rng, n, span, max_len, n_keys=3):
    rows = []
    for i in range(n):
        s = rng.randrange(-span // 4, span)
        ln = rng.choice([0, 1, rng.randrange(1, max_len)])
        rows.append((i, f"k{rng.randrange(n_keys)}", s, s + ln))
    return rows


def test_interval_join_differential(spark):
    rng = random.Random(20260816)
    for trial, (n, span, max_len) in enumerate(
        [(120, 1000, 40), (120, 1000, 900), (60, 50, 8)]
    ):
        lrows = _rand_rows(rng, n, span, max_len)
        rrows = _rand_rows(rng, n, span, max_len)
        # one pathological giant interval spanning everything
        lrows.append((n, "k0", -span, span * 2))
        left, right = _mk(spark, lrows, "l"), _mk(spark, rrows, "r")
        for base in (None, 1, 7, span * 4):
            got = {
                (r.lid, r.rid)
                for r in interval_join(
                    left, right, "ls", "le", "rs", "re",
                    base_width=base,
                ).collect()
            }
            assert got == _naive_pairs(lrows, rrows), (trial, base)


def test_interval_join_keyed_and_left(spark):
    rng = random.Random(7)
    lrows = _rand_rows(rng, 80, 500, 60)
    rrows = _rand_rows(rng, 80, 500, 60)
    left, right = _mk(spark, lrows, "l"), _mk(spark, rrows, "r")

    keyed = interval_join(
        left, right, "ls", "le", "rs", "re", on="k"
    )
    got = {(r.lid, r.rid) for r in keyed.collect()}
    assert got == _naive_pairs(lrows, rrows, keyed=True)

    out = interval_join(
        left, right, "ls", "le", "rs", "re", on="k", how="left"
    )
    rowlist = out.collect()
    pairs = {(r.lid, r.rid) for r in rowlist if r.rid is not None}
    assert pairs == _naive_pairs(lrows, rrows, keyed=True)
    matched_lids = {p[0] for p in pairs}
    null_lids = {r.lid for r in rowlist if r.rid is None}
    assert null_lids == {i for i, *_ in lrows} - matched_lids
    # exactly one null row per unmatched left row
    assert sum(1 for r in rowlist if r.rid is None) == len(null_lids)


def test_interval_join_exact_multiplicity(spark):
    """Each overlapping pair appears EXACTLY once (branch disjointness +
    one-level-per-interval), including at equal starts."""
    left = _mk(spark, [(0, "a", 10, 20), (1, "a", 10, 20)], "l")
    right = _mk(
        spark, [(0, "a", 10, 20), (1, "a", 5, 11), (2, "a", 19, 30)], "r"
    )
    out = interval_join(left, right, "ls", "le", "rs", "re").collect()
    counts = {}
    for r in out:
        counts[(r.lid, r.rid)] = counts.get((r.lid, r.rid), 0) + 1
    assert counts == {
        (lid, rid): 1 for lid in (0, 1) for rid in (0, 1, 2)
    }


def test_interval_touching_and_empty(spark):
    # half-open: [0,10) and [10,20) do NOT overlap; empty [5,5) never does
    left = _mk(spark, [(0, "a", 0, 10), (1, "a", 5, 5)], "l")
    right = _mk(spark, [(0, "a", 10, 20), (1, "a", 0, 100)], "r")
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "ls", "le", "rs", "re"
        ).collect()
    }
    assert got == {(0, 1)}


def test_explosion_bound(spark):
    """An interval costs <=2 grid rows at its own level no matter how
    long it is — the property that kills the naive bucket blow-up."""
    rows = [(0, "a", 0, 5), (1, "a", 3, 3_000_000), (2, "a", -50, 51)]
    df = _mk(spark, rows, "l")
    levels = _n_levels(4, 3_000_000)
    exploded = _explode_intervals(df, "ls", "le", 4, levels)
    per_row = {
        r["lid"]: r["n"]
        for r in exploded.groupBy("lid").agg(F.count("*").alias("n"))
        .collect()
    }
    assert all(n <= 2 for n in per_row.values()), per_row


def test_interval_join_plan_is_equi(spark):
    rng = random.Random(3)
    left = _mk(spark, _rand_rows(rng, 50, 300, 30), "l")
    right = _mk(spark, _rand_rows(rng, 50, 300, 30), "r")
    out = interval_join(
        left, right, "ls", "le", "rs", "re", base_width=8, levels=6
    )
    strats = join_strategies(out)
    assert strats, "expected join operators in the plan"
    assert not any(
        s in ("BroadcastNestedLoopJoin", "CartesianProduct")
        for s in strats
    ), strats


def test_overlap_length_column(spark):
    left = _mk(spark, [(0, "a", 0, 10)], "l")
    right = _mk(spark, [(0, "a", 5, 30), (1, "a", 20, 25)], "r")
    out = interval_join(
        left, right, "ls", "le", "rs", "re"
    ).withColumn("ov", overlap_length("ls", "le", "rs", "re"))
    got = {r.rid: r.ov for r in out.collect()}
    assert got == {0: 5}


def test_point_in_interval_join(spark):
    from lakota_spark.operators.interval import point_in_interval_join

    pts = spark.createDataFrame(
        [(0, 5), (1, 10), (2, 19), (3, 20), (4, 55)],
        "pid long, p long",
    )
    ivs = spark.createDataFrame(
        [(0, 10, 20), (1, 0, 6), (2, 18, 60)], "iid long, s long, e long"
    )
    out = point_in_interval_join(pts, ivs, "p", "s", "e")
    got = {(r.pid, r.iid) for r in out.collect()}
    # half-open: p=20 not in [10,20); p=19 in both [10,20) and [18,60)
    assert got == {(0, 1), (1, 0), (2, 0), (2, 2), (3, 2), (4, 2)}
    assert "_pt_end" not in out.columns


def test_interval_join_hypothesis(spark):
    """Hypothesis differential: random interval sets (incl. empty /
    unit / giant spans, negative coords) across random base widths —
    the grid join must equal the all-pairs ground truth with
    exactly-once multiplicity."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ivs = st.lists(
        st.tuples(
            st.integers(-100, 1000),
            st.integers(0, 400),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=25, deadline=None)
    @given(ivs, ivs, st.sampled_from([1, 3, 50, 2000]))
    def go(lraw, rraw, base):
        lrows = [(i, "k", s, s + ln) for i, (s, ln) in enumerate(lraw)]
        rrows = [(i, "k", s, s + ln) for i, (s, ln) in enumerate(rraw)]
        left, right = _mk(spark, lrows, "l"), _mk(spark, rrows, "r")
        got = [
            (r.lid, r.rid)
            for r in interval_join(
                left, right, "ls", "le", "rs", "re", base_width=base
            ).collect()
        ]
        assert len(got) == len(set(got))  # exactly-once
        assert set(got) == _naive_pairs(lrows, rrows)

    go()
