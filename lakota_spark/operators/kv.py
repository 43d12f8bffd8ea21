"""Key-value upsert semantics as Spark operators.

Reproduces the reference's KVSeries behavior (`lakota/series.py:449-503`,
SURVEY.md §2.4/F7) and `Series.update` zero-fill alignment
(`lakota/series.py:159-190`, F8) as pure DataFrame transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_wins(
    df: DataFrame,
    keys: list[str] | str,
    order_by: list[str] | str,
    desc: bool = True,
) -> DataFrame:
    """Keep one row per key: the latest by ``order_by``.

    This is the reference's KV upsert resolution ("incoming frame wins on
    equal key", `lakota/series.py:449-475`) expressed as the standard
    window-dedup: deterministic because the ordering columns are explicit —
    never bare ``F.first`` on unsorted data (SURVEY.md §7 risk 6).

    Scale note: one shuffle on ``keys``. For heavy skew on a hot key, AQE
    skew-join/partition splitting applies; the window itself is
    partial-aggregation-free but rank-based dedup via ``row_number`` keeps
    memory bounded per key group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    ordering = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


ZEROS = {
    "double": 0.0,
    "float": 0.0,
    "bigint": 0,
    "int": 0,
    "smallint": 0,
    "tinyint": 0,
    "string": "",
}


def update_zerofill(
    base: DataFrame,
    update: DataFrame,
    keys: list[str] | str,
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Reference ``Series.update`` (`lakota/series.py:159-190`): align an
    update frame on exact key equality, overwrite ``update_cols``, and
    ZERO-fill (not null-fill) columns absent from either side on
    non-overlapping rows — the reference has no NULLs (zero values per type,
    `lakota/schema.py:166-167`).

    Implemented as full-outer join + per-column coalesce; Delta-style MERGE
    without the log. One shuffle on keys (or broadcast when the update side
    is small — Catalyst/AQE decides from stats).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    update_cols = update_cols or [c for c in update.columns if c not in keys]
    dtypes = dict(base.dtypes)
    upd = update.select(
        *keys, *[F.col(c).alias(f"_u_{c}") for c in update_cols]
    )
    joined = base.join(upd, on=keys, how="full_outer")
    out_cols: list = [F.col(k) for k in keys]
    for c in base.columns:
        if c in keys:
            continue
        zero = F.lit(ZEROS.get(dtypes[c], None))
        if dtypes[c].startswith(("timestamp", "date")):
            zero = F.lit("1970-01-01 00:00:00").cast(dtypes[c])
        if c in update_cols:
            expr = F.coalesce(F.col(f"_u_{c}"), F.col(c), zero.cast(dtypes[c]))
        else:
            expr = F.coalesce(F.col(c), zero.cast(dtypes[c]))
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)
