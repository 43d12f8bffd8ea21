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
