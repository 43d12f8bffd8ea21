"""As-of (time-ordered backward) join, shuffle-once union+window style.

Spark has no native ASOF JOIN. The naive formulation
(range join: ``l.ts >= r.ts`` + row_number) explodes to a near-cross
product per key and dies at scale. The scalable formulation used here:

1. UNION the two sides into one stream tagged with a side marker; right-side
   payload columns travel packed in a single struct (null on left rows).
2. One window ``partitionBy(keys).orderBy(ts, side)`` computes
   ``last(payload_struct, ignorenulls=True)`` — the most recent right-side
   row at or before each left row, atomically (no column tearing).
3. Filter back to left rows and unpack the struct.

Cost: ONE shuffle of |L|+|R| rows on the join keys (same as a regular
sort-merge join), no range explosion. This holds at 100 TB as long as keys
are reasonably distributed; AQE skew-join handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (or ``<`` when ``strict``) per join key.

    ``how='inner'`` drops left rows with no prior right row;
    ``how='left'`` keeps them with null payload.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]

    # Right rows sort before left rows at equal timestamps (<=) unless strict.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    payload_t = ",".join(
        f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols
    )
    lhs = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(left_tag).alias("_side"),
        F.lit(None).cast(f"struct<{payload_t}>").alias("_payload"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(right_tag).alias("_side"),
        F.struct(*right_cols).alias("_payload"),
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    merged = lhs.unionByName(rhs.select(*lhs.columns))

    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "_payload", F.last("_payload", ignorenulls=True).over(w)
    ).where(F.col("_side") == F.lit(left_tag))
    if how == "inner":
        matched = matched.where(F.col("_payload").isNotNull())
    return matched.select(
        *left.columns,
        *[F.col(f"_payload.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
