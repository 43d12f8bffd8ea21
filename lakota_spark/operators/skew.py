"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in `session.get_spark`) covers
sort-merge joins; these helpers cover the cases AQE cannot: exploding a
broadcast side against salted fact keys, and two-stage salted
aggregation for hot group-by keys.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_bucket(salt_cols: list[str], salt: int) -> Column:
    """Deterministic non-negative bucket in [0, salt).

    ``pmod`` (not ``abs``+``pmod``): ``F.hash`` yields a full-range
    int32, and ``abs(Int32.MinValue)`` overflows — under Spark 4's
    default ANSI mode that's an ARITHMETIC_OVERFLOW crash with
    probability ~2^-32 PER ROW, near-certain over an open-web-scale
    ingest. ``pmod(-2147483648, salt)`` is already the non-negative
    residue, so ``abs`` was both hazardous and redundant.
    """
    return F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salt))


def _check_salt_free(df: DataFrame, side: str) -> None:
    if "_salt" in df.columns:
        raise ValueError(
            f"salted join/agg uses an internal '_salt' column but the "
            f"{side} relation already has one — rename it first "
            "(silently overwriting would corrupt the user column)"
        )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    pin_partitioning: bool = True,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``fact`` has hot (Zipf) keys: salt the fact side
    with a DETERMINISTIC bucket (hash of the fact row — no RNG, so
    reruns, retries and engine comparisons see identical placement),
    replicate the lookup side across all buckets, join on (keys, salt).
    The hot key's rows spread over ``salt`` tasks instead of one
    straggler. ``how`` may be inner or left (each fact row carries
    exactly one salt, so multiplicity is preserved); the dim side pays a
    ``salt``× replication — use when dim is the SMALLER relation (vocab,
    n-gram counts, centroid tables).

    CAVEAT — deterministic salting hashes row CONTENT, so IDENTICAL
    fact rows land in one bucket: if the hot key's rows are exact
    duplicates (e.g. a key-only projection), the spread is a no-op.
    Ensure the fact relation carries a distinguishing column (doc id,
    position — the LM scorers' token relations all do), or pass
    ``salt_on`` to pick the columns that vary per row. The default
    hashes all columns.

    ``pin_partitioning`` (default) repartitions BOTH sides explicitly on
    (keys…, _salt): the sort-merge join reuses the exchange, and AQE
    cannot re-coalesce the spread away by input-byte heuristics (the
    `dedup.embedding_dup_pairs pair_salt` discipline — AQE's skew-join
    split works on bytes of the PROBE partition and does nothing when
    one KEY is hot on the build side of a lookup join inside a larger
    plan). With ``salt=1`` this degrades to a plain join (Catalyst
    broadcasts the dim when it fits — the right plan when it does).
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt <= 1:
        return fact.join(dim, on=on, how=how)
    _check_salt_free(fact, "fact")
    _check_salt_free(dim, "dim")
    salt_cols = salt_on if salt_on else fact.columns
    salted_fact = fact.withColumn("_salt", _salt_bucket(salt_cols, salt))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    if pin_partitioning:
        n_part = int(
            fact.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        salted_fact = salted_fact.repartition(n_part, *on, "_salt")
        exploded_dim = exploded_dim.repartition(n_part, *on, "_salt")
    out = salted_fact.join(exploded_dim, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


#: combiner name -> stage-2 aggregate builder for `salted_agg`
_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,  # partial counts combine by summation
    "min": F.min,
    "max": F.max,
}


def _infer_combiner(col: Column) -> str:
    """Best-effort combiner inference from a Column's string form.

    Uses the public ``str(Column)`` rendering first and the classic
    py4j ``_jc`` handle only as a guarded fallback — the private handle
    does not exist under Spark Connect, where callers must pass
    ``combiners=`` explicitly (documented in `session.get_spark`).
    """
    try:
        text = str(col)  # classic renders "Column<'sum(v)'>"
    except Exception:
        text = ""
    if "(" not in text:
        try:
            text = col._jc.toString()  # noqa: SLF001 — classic-only fallback
        except Exception as exc:
            raise ValueError(
                "cannot infer a combiner for this aggregate expression "
                "(Spark Connect has no expression string) — pass "
                "combiners={name: 'sum'|'count'|'min'|'max'} explicitly"
            ) from exc
    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*\(", text)
    head = m.group(1).lower() if m else ""
    for name in _COMBINERS:
        if head.startswith(name):
            return name
    raise ValueError(
        f"non-algebraic aggregate {head!r} cannot be salted; "
        "use AQE or a sketch (or pass combiners= explicitly)"
    )


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, Column],
    salt: int = 16,
    salt_on: list[str] | None = None,
    combiners: dict[str, str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot group keys: aggregate on
    (keys, salt) first (spreads a hot key over ``salt`` partial groups),
    then combine. Only algebraic aggregates (sum/count/min/max) compose —
    the caller provides stage-1 expressions; stage 2 re-applies the
    matching combiner.

    ``aggs``: {output_name: stage1_agg_column}.
    ``combiners``: {output_name: 'sum'|'count'|'min'|'max'} — the
    stage-2 combiner per output. Optional: when omitted it is inferred
    from the stage-1 Column's expression string (works on the classic
    py4j session this engine pins; under Spark Connect pass it
    explicitly).

    Same duplicate-row CAVEAT as `salted_join`: the deterministic salt
    hashes row content, so a relation whose rows EQUAL the group key
    (e.g. ``tokens.select('token')``) gets one bucket per group and the
    salting is a no-op — keep a varying column in the relation or pass
    ``salt_on`` naming one.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    _check_salt_free(df, "input")
    # deterministic salt (hash of the row, like salted_join): no RNG
    # anywhere in the engine — reruns and retries aggregate the same
    # rows into the same partial groups
    salt_cols = salt_on if salt_on else df.columns
    salted = df.withColumn("_salt", _salt_bucket(salt_cols, salt))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    stage2 = []
    for name, col in aggs.items():
        comb = (combiners or {}).get(name) or _infer_combiner(col)
        if comb not in _COMBINERS:
            raise ValueError(
                f"unknown combiner {comb!r} for {name!r}; expected one "
                f"of {sorted(_COMBINERS)}"
            )
        stage2.append(_COMBINERS[comb](name).alias(name))
    return stage1.groupBy(*keys).agg(*stage2)
