"""Scalable global row indexing.

`row_number()` over an unpartitioned window funnels the whole dataset
into one task. The scalable pattern: range-partition + sort, count rows
per partition (one small action), broadcast the partition offsets, then
add `spark_partition_id`-based offsets to a per-partition sequence —
every step distributed, one extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 0-based global row index following ``order_cols`` order.

    Cost: one range-partitioning shuffle + one lightweight count job for
    the offsets. No single-partition bottleneck.
    """
    if num_partitions:
        parts = num_partitions
    else:
        try:
            parts = df.sparkSession.sparkContext.defaultParallelism
        except Exception:  # noqa: BLE001 — Connect: no SparkContext;
            # shuffle.partitions is the portable parallelism knob
            parts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
    ordered = df.repartitionByRange(
        max(parts, 1), *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*[F.col(c) for c in order_cols])
    # Persist BEFORE the count: repartitionByRange samples to pick range
    # boundaries, so two separate executions could partition differently —
    # the offsets must describe the same physical partitioning the main
    # read uses. Caller releases via `release_index(result)`.
    # Materialize the partition id as a COLUMN on the persisted data:
    # spark_partition_id() is evaluation-context-sensitive — inside the
    # window it would see the window exchange's partitioning, not the
    # range partitioning the offsets describe.
    ordered = ordered.withColumn("_pid", F.spark_partition_id()).persist()
    counts = (
        ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    sizes = {r["_pid"]: r["_n"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = ordered.withColumn(
        index_col,
        offset_map[F.col("_pid")] + F.row_number().over(w) - F.lit(1),
    ).drop("_pid")
    out._lakota_ordered_ref = ordered  # for release_index
    return out


def release_index(indexed: DataFrame) -> None:
    ref = getattr(indexed, "_lakota_ordered_ref", None)
    if ref is not None:
        ref.unpersist()
