"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in `session.get_spark`) covers
sort-merge joins; these helpers cover the cases AQE cannot: exploding a
broadcast side against salted fact keys, and two-stage salted
aggregation for hot group-by keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` has hot keys: salt the fact side with a
    random bucket, explode the (small) dim side across all buckets, join
    on (key, salt). The hot key's rows spread over ``salt`` tasks instead
    of one straggler.

    Use when the dim side is replicable (small); for fact-fact skew rely
    on AQE skew splitting instead.
    """
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_fact.join(exploded_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot group keys: aggregate on
    (keys, salt) first (spreads a hot key over ``salt`` partial groups),
    then combine. Only algebraic aggregates (sum/count/min/max) compose —
    the caller provides stage-1 expressions; stage 2 re-applies the
    matching combiner.

    ``aggs``: {output_name: stage1_agg_column}. The combiner is inferred
    from the column's expression head (sum/count -> sum, min -> min,
    max -> max).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    combiners = []
    for name, col in aggs.items():
        head = col._jc.toString().split("(", 1)[0].lower()  # noqa: SLF001
        if head.startswith(("sum", "count")):
            combiners.append(F.sum(name).alias(name))
        elif head.startswith("min"):
            combiners.append(F.min(name).alias(name))
        elif head.startswith("max"):
            combiners.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"non-algebraic aggregate {head!r} cannot be salted; "
                "use AQE or a sketch"
            )
    return stage1.groupBy(*keys).agg(*combiners)
