"""Time-series completeness operators: dense calendar gap-fill and
forward-fill — the resample/asfreq surface a time-series store's users
reach for first (the reference's `floor` bucketing covers aggregation;
this covers the missing buckets).

Scale shape: the dense calendar is generated per group from that group's
own [min, max] span (`sequence` + explode — map-side, no driver loop),
the join back to observed buckets is an equi-join on (group, bucket),
and forward-fill is one window per group ordered by bucket. Every
shuffle is keyed by the group (or group+bucket) — there is no global
window and no single-partition stage anywhere; the small calendar side
broadcast-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakota_spark.functions import floor_time


def gap_fill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    unit: str,
    aggs: dict[str, Column],
    step: str | None = None,
    fill: str | None = "ffill",
) -> DataFrame:
    """Bucket ``ts_col`` by ``unit``, aggregate per (group, bucket), then
    densify: every group gets a row for EVERY bucket between its first
    and last observation; missing buckets carry nulls, optionally
    forward-filled (``fill='ffill'``: last observed value wins, the
    standard sensor-data convention the reference's users apply via
    pandas ``df.ffill()`` after `Series.df`).

    ``step`` overrides the calendar stride (defaults to one ``unit``,
    e.g. ``'interval 1 day'`` for unit='D').
    """
    step = step or {
        "Y": "interval 1 year",
        "M": "interval 1 month",
        "W": "interval 1 week",
        "D": "interval 1 day",
        "h": "interval 1 hour",
        "m": "interval 1 minute",
        "s": "interval 1 second",
    }[unit]
    bucket = floor_time(F.col(ts_col), unit).alias("bucket")
    observed = df.groupBy(*group_cols, bucket).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    calendar = (
        observed.groupBy(*group_cols)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            *group_cols,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
            ).alias("bucket"),
        )
    )
    out = calendar.join(observed, [*group_cols, "bucket"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            *group_cols,
            "bucket",
            *[
                F.last(name, ignorenulls=True).over(w).alias(name)
                for name in aggs
            ],
        )
    return out


def decayed_sum(
    df: DataFrame,
    ts_col: str,
    keys: list[str] | str,
    value: Column,
    horizon: int = 30,
    shift: int = 30,
    tiebreak: str | None = None,
    out_col: str = "decayed",
) -> DataFrame:
    """Per-key exponentially-decayed running sum (half-life = one row)
    over the last ``horizon`` rows — the recency-weighted activity
    feature of event pipelines (EWMA family), in EXACT integer
    arithmetic: the row at distance ``j`` from the current one
    contributes ``value * 2**(shift - j)``, so the result is a plain
    long sum — no float accumulation order to disagree about, which is
    what keeps this verifiable bit-exact against a SQL oracle (and
    makes reruns/engine-comparisons stable).  ``value`` must be an
    integral Column (callers quantize: ``F.round(x*100).cast("long")``).

    Implementation: one window per key ordered by (ts, tiebreak) with a
    bounded ``horizon``-row frame; the frame's values ride a
    ``collect_list`` (frame-ordered), and the decay ladder is a
    higher-order ``transform`` against a precomputed powers array +
    ``aggregate`` sum — all JVM codegen, no UDF.  Scale shape: ONE
    shuffle on the keys, per-row state bounded by ``horizon`` longs; no
    global window.  Overflow bound: ``max|value| * 2**shift * horizon``
    must fit int64 — the default (shift=30) leaves ~2**33 of headroom
    for money-cent values.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    if horizon > shift + 1:
        # the ladder's smallest weight is 2**(shift - (horizon-1)); a
        # horizon past shift+1 would need fractional weights, which the
        # exact-integer contract forbids
        raise ValueError(
            f"horizon ({horizon}) must be <= shift + 1 ({shift + 1}): "
            "the integer decay ladder 2**(shift-j) runs out of bits — "
            "raise `shift` (watch the int64 bound "
            "max|value| * 2**shift * horizon) or lower `horizon`"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(horizon - 1), Window.currentRow)
    )
    powers = F.array(
        *[F.lit(1 << (shift - j)).cast("long") for j in range(horizon)]
    )
    # collect_list SILENTLY DROPS nulls, which would shift every older
    # row one slot closer and double its weight — a null value must
    # contribute nothing while still occupying its time slot (the same
    # semantics a SUM over the rn-distance self-join oracle has)
    frame = F.reverse(
        F.collect_list(F.coalesce(value.cast("long"), F.lit(0))).over(w)
    )
    terms = F.transform(
        frame, lambda x, i: x * F.element_at(powers, i + F.lit(1))
    )
    return df.withColumn(
        out_col,
        F.aggregate(
            terms, F.lit(0).cast("long"), lambda acc, x: acc + x
        ),
    )
