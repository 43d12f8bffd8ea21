"""Physical-plan inspection utilities.

The engine's performance contract is about plan *shape*: predicates
reaching the parquet scan, projections pruned, small sides broadcast,
aggregation partial before the exchange. These helpers make those
properties assertable in tests and inspectable from the REPL — the
`.explain`-and-iterate loop, mechanized.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for line in explain_str(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1).strip():
            # split on ", " only between predicates (commas also appear
            # inside predicate argument lists)
            out.extend(re.split(r",\s+(?=[A-Z])", m.group(1)))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if "ReadSchema:" in line
    ]


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols |= set(re.findall(r"(\w+):", schema))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin, SortMergeJoin...)."""
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        explain_str(df, "simple"),
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when a HashAggregate appears below the Exchange (map-side
    combine) — the shape every large groupBy must have."""
    plan = explain_str(df, "simple")
    agg_positions = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    exch = plan.find("Exchange")
    return len(agg_positions) >= 2 and exch != -1 and any(
        p > exch for p in agg_positions
    )


def node_count(df: DataFrame, node: str, mode: str = "simple") -> int:
    """Occurrences of a physical operator name in the plan — the
    RECOMPUTATION guard. A multi-consumer lineage that is consumed N
    times un-checkpointed repeats its whole subtree N times in the
    physical plan (N Generates / N FileScans of the same relation);
    join-strategy contracts cannot see this. Assert
    ``node_count(df, "Generate") <= 1`` (or FileScan count == expected
    scans) to fail CI when an expensive subtree is re-derived per
    consumer instead of checkpointed once."""
    return len(re.findall(r"\b" + re.escape(node) + r"\b", explain_str(df, mode)))


def checkpoint_sources(df: DataFrame) -> int:
    """Count of checkpoint-truncated lineage roots ("Scan ExistingRDD")
    in the physical plan — evidence that a shared subtree was
    materialized once rather than re-derived per consumer."""
    return len(
        re.findall(r"Scan ExistingRDD", explain_str(df, "simple"))
    )


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    pushed = " ".join(pushed_filters(df))
    missing = [f for f in fragments if f not in pushed]
    if missing:
        raise AssertionError(
            f"filters not pushed to scan: {missing}; pushed={pushed!r}"
        )
