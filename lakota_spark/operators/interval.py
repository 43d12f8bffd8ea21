"""Interval overlap join — equi-join shaped, multi-level bucketed.

Spark has no native interval join: the naive formulation

    l.join(r, (l.start < r.end) & (r.start < l.end))

has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin (or a
CartesianProduct), which is O(|L|*|R|) and dies at scale. The scalable
formulation used here is the hierarchical-grid scheme (the same family
as Databricks' range-join binning and interval-tree gridding):

1.  Two intervals overlap (half-open, ``[s, e)``) iff the later start
    lies inside the other interval.  That splits every overlapping pair
    into exactly one of two disjoint branches:

      * branch A: ``l.start <= r.start  < l.end``  (r's start inside l)
      * branch B: ``r.start  < l.start  < r.end``  (l's start inside r)

    Each branch is a POINT-in-interval probe, so only the interval side
    needs bucket coverage; the point side contributes a single bucket
    per grid level.

2.  Multi-level grid: level ``j`` has bucket width ``base * 2**j``.
    Every interval is assigned to the single smallest level whose width
    covers its length, so it spans AT MOST TWO buckets there (bounded
    explosion — a pathological month-long interval in a corpus of
    second-long ones costs 2 rows, not 2.6M).  A probe point joins each
    level at its one covering bucket, costing ``n_levels ~=
    log2(max_len / base)`` rows — bounded by the data's dynamic range,
    not its size.

3.  Join on ``on + [level, bucket]`` — a plain equi-join (sort-merge or
    broadcast; AQE skew-split applies) — then apply the exact branch
    predicate.  Multiplicity is exactly one row per overlapping pair per
    branch: an interval lives at ONE level, its <=2 buckets are
    distinct, and the probe point maps to ONE bucket at that level.

Cost at 100 TB: 2 equi-joins of ~2|L| x ~L|R| rows (L = #levels, tiny),
shuffled on (keys, level, bucket) — never a nested loop.  Hot buckets
(many intervals anchored in one time range) spread over levels and are
further split by AQE; ``base`` tunes granularity (default: derived from
the observed length distribution with one bounded agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LVL, _BKT = "_iv_lvl", "_iv_bkt"
_MAX_LEVELS = 48  # base << 48 stays far inside int64 for sane bases


def _n_levels(base: int, max_len: int) -> int:
    """Smallest L with ``base * 2**(L-1) >= max_len`` (min 1)."""
    lvl = 1
    while base << (lvl - 1) < max_len and lvl < _MAX_LEVELS:
        lvl += 1
    return lvl


def _width(base: int, lvl):
    """``base << lvl`` with a Column shift count (F.shiftleft only takes
    a literal): pow(2.0, j) is exact in double for j <= 48."""
    return F.lit(base).cast("long") * F.pow(F.lit(2.0), lvl).cast("long")


def _level_expr(length, base: int, n_levels: int):
    """Smallest j with ``length <= base << j`` — exact chained CASE
    (no float log2: off-by-one at exact powers of two is a correctness
    bug here, because the <=2-buckets-per-interval bound depends on it).
    """
    expr = F.lit(n_levels - 1)
    for j in range(n_levels - 2, -1, -1):
        expr = F.when(length <= F.lit(base << j), F.lit(j)).otherwise(expr)
    return expr


def _explode_intervals(
    df: DataFrame, start: str, end: str, base: int, n_levels: int
) -> DataFrame:
    """One row per (interval, covered level-bucket) at the interval's
    own level.  <= 2 rows per input row by construction."""
    s, e = F.col(start), F.col(end)
    length = F.greatest(e - s, F.lit(1))
    lvl = _level_expr(length, base, n_levels)
    width = _width(base, lvl)
    first = F.floor(s / width)
    last = F.greatest(F.floor((e - 1) / width), first)
    return (
        df.withColumn(_LVL, lvl.cast("int"))
        .withColumn(_BKT, F.explode(F.sequence(first, last)))
    )


def _explode_points(
    df: DataFrame, point: str, base: int, n_levels: int
) -> DataFrame:
    """One row per (point, level): the point's single covering bucket at
    every level — the probe side of the grid."""
    lvl = F.explode(F.array(*[F.lit(j) for j in range(n_levels)]))
    out = df.withColumn(_LVL, lvl)
    return out.withColumn(
        _BKT, F.floor(F.col(point) / _width(base, F.col(_LVL)))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | str | None = None,
    base_width: int | None = None,
    levels: int | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """All pairs whose half-open intervals ``[left_start, left_end)`` /
    ``[right_start, right_end)`` overlap, optionally also matching the
    ``on`` equi-keys.  Bound columns must be integral (cast timestamps
    to epoch seconds/micros first) with ``|value| < 2**52``: bucket ids
    are ``floor(v / width)`` in double, which is EXACT below 2**52
    (a misround needs ``width * bucket > 2**53 > |v|``, impossible) and
    covers epoch micros beyond year 2100.

    ``how='inner'`` emits overlapping pairs; ``how='left'`` also keeps
    left rows with no overlap (right payload null).  Right columns that
    collide with left names are renamed with ``suffix``.

    ``base_width`` is the level-0 bucket width (default: the smaller
    side's mean interval length, one bounded agg job); ``levels``
    overrides the derived level count (one more bounded agg when left
    unset).  Both derivations collect a single row.
    """
    on = [on] if isinstance(on, str) else list(on or [])
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    rename = {
        c: c + suffix
        for c in right.columns
        if c in left.columns and c not in on
    }
    right = right.select(
        *on,
        *[
            F.col(c).alias(rename.get(c, c))
            for c in right.columns
            if c not in on
        ],
    )
    r_start, r_end = (rename.get(c, c) for c in (right_start, right_end))
    left_cols = [c for c in left.columns]
    right_cols = [c for c in right.columns if c not in on]

    if base_width is None or levels is None:
        stats = (
            left.select(
                (F.col(left_end) - F.col(left_start)).alias("len")
            )
            .unionByName(
                right.select((F.col(r_end) - F.col(r_start)).alias("len"))
            )
            .agg(
                F.max("len").alias("max_len"),
                F.avg("len").alias("avg_len"),
            )
            .first()
        )
        max_len = max(int(stats["max_len"] or 1), 1)
        if base_width is None:
            base_width = max(int(stats["avg_len"] or 1), 1)
        if levels is None:
            levels = _n_levels(base_width, max_len)
    base_width = max(int(base_width), 1)
    levels = max(int(levels), 1)

    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(r_start), F.col(r_end)
    keys = on + [_LVL, _BKT]

    # Branch A: r's start inside l  (l.start <= r.start < l.end)
    a = (
        _explode_intervals(left, left_start, left_end, base_width, levels)
        .join(_explode_points(right, r_start, base_width, levels), keys)
        .where((ls <= rs) & (rs < le) & (rs < re_))
    )
    # Branch B: l's start strictly inside r  (r.start < l.start < r.end)
    b = (
        _explode_points(left, left_start, base_width, levels)
        .join(
            _explode_intervals(right, r_start, r_end, base_width, levels),
            keys,
        )
        .where((rs < ls) & (ls < re_) & (ls < le))
    )
    out_cols = on + [c for c in left_cols if c not in on] + right_cols
    matched = a.select(*out_cols).unionByName(b.select(*out_cols))

    if how == "left":
        # Whether a left row matches depends ONLY on (on, bounds) — rows
        # sharing them match identically — so the anti-join key is just
        # that tuple (payload columns may be map/array-typed, which
        # Spark refuses as join keys anyway).
        probe = on + [left_start, left_end]
        missing = left.join(
            matched.select(*probe).distinct(), probe, "left_anti"
        )
        for c in right_cols:
            missing = missing.withColumn(
                c, F.lit(None).cast(matched.schema[c].dataType)
            )
        matched = matched.unionByName(missing.select(*out_cols))
    return matched


def overlap_length(
    left_start: str, left_end: str, right_start: str, right_end: str
):
    """Column: length of the intersection of two half-open intervals
    (callers apply it on ``interval_join`` output)."""
    return F.greatest(
        F.least(F.col(left_end), F.col(right_end))
        - F.greatest(F.col(left_start), F.col(right_start)),
        F.lit(0),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    start: str,
    end: str,
    on: list[str] | str | None = None,
    base_width: int | None = None,
    levels: int | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point < end`` —
    events-in-windows, trades-in-sessions, timestamps-in-incidents.
    A point is the degenerate interval ``[p, p+1)`` (integral bounds),
    so this is `interval_join` with the left side widened one tick:
    the overlap test ``max(p, s) < min(p+1, e)`` reduces exactly to
    ``s <= p < e``.  Same grid shape, same equi-only plan.
    """
    pts = points.withColumn("_pt_end", F.col(point) + 1)
    out = interval_join(
        pts,
        intervals,
        point,
        "_pt_end",
        start,
        end,
        on=on,
        base_width=base_width,
        levels=levels,
        how=how,
        suffix=suffix,
    )
    return out.drop("_pt_end")
