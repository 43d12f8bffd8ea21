"""Reference-parity queries expressed over the `events` testdata table.

Each function demonstrates one operator family from SURVEY.md §2 (scan,
closed-bound range filter, tail, floor-bucketed aggregation, every
aggregate incl. first/last/quantile, KV last-writer-wins, update with
zero-fill, union/except, top-k, windows, sessionization, as-of join) as an
idiomatic Spark plan, with a DuckDB oracle in `__spark_entry__.oracle_sql`.

The reference can only run these on its own storage format one series at a
time (`lakota/frame.py:284-353`); here they are declarative plans that
Catalyst pushes down / prunes / parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakota_spark.functions import money_sum
from lakota_spark.operators.asof import asof_join
from lakota_spark.operators.kv import last_wins, update_zerofill
from lakota_spark.sources import read_parquet


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.ts is TIMESTAMP(NANOS) parquet — see sources.read_parquet.
    return read_parquet(spark, f"{sf_dir}/events.parquet")


# --- S1/P1/P5/P6: projected scan with half-open (closed=LEFT) bounds ------

def scan_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Series.frame(start, stop, closed='l', select=...)` equivalent
    (`lakota/series.py:314-338`). The range predicate is applied to the RAW
    nanosecond longs (see sources.read_parquet ns_range) so it reaches the
    parquet scan — a filter on the converted timestamp column would not."""
    e = read_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        ns_range={"ts": ("2024-01-10", "2024-01-20", True, False)},
    )
    return e.select("event_id", "ts", "user_id", "event_type", "value")


def scan_closed_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """closed='b' variant (`lakota/utils.py:307-335` bound algebra),
    pushed down on the raw nanosecond column."""
    e = read_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        ns_range={"ts": ("2024-01-05", "2024-01-06", True, True)},
    )
    return e.select("event_id", "ts", "value")


# --- S7/O4: tail & top-k --------------------------------------------------

def tail_100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Series.tail(100)` (`lakota/series.py:261-312`) →
    TakeOrderedAndProject: only 100 rows cross the wire per partition."""
    e = _events(spark, sf_dir)
    return (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select("event_id", "ts", "value")
    )


def topk_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(50)
        .select("event_id", "event_type", "value")
    )


# --- E9 + A1..A5: floor-bucketed aggregation ------------------------------

def agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference CLI group-by `(floor self.ts 'D')` with every basic
    aggregate (`lakota/frame.py:284-353`, `lakota/utils.py:232-240`).
    Partial aggregation is map-side; one shuffle on (day, type)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            # value sits on a 2-decimal grid → fixed-point exact sum/avg
            # (order-independent, engine-reproducible; see functions.money_sum)
            money_sum(F.col("value"), 100).alias("sum_value"),
            (money_sum(F.col("value"), 100) / F.count(F.lit(1))).alias(
                "avg_value"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- A6/A7: first/last (deterministic: explicit ordering) -----------------

def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `first`/`last` are defined on sorted input
    (`lakota/sexpr.py:211-220`); deterministic Spark equivalent is
    min_by/max_by on the unique ts column — never bare F.first."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.expr("min_by(value, ts)").alias("first_value"),
        F.expr("max_by(value, ts)").alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# --- A8: quantiles --------------------------------------------------------

def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quantiles (`lakota/sexpr.py:190-193` =
    np.quantile) — F.percentile, not approx, to match the oracle."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


# --- KV upsert (F7) -------------------------------------------------------

def kv_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KVSeries upsert resolution (`lakota/series.py:449-475`): one row per
    key, latest wins, deterministic tie-break."""
    e = _events(spark, sf_dir)
    return last_wins(e, keys="user_id", order_by=["ts", "event_id"]).select(
        "user_id", "ts", "event_type", "value"
    )


# --- J1/M4: update with zero-fill (F8) ------------------------------------

def series_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Series.update` semantics (`lakota/series.py:159-190`): overwrite
    `value` from the update frame on matched keys, keep base elsewhere,
    ZERO-fill (not NULL) the untouched column on update-only rows."""
    e = _events(spark, sf_dir)
    base = e.where(F.col("event_id") % 3 == 0).select(
        "event_id", "value", F.col("user_id")
    )
    upd = e.where(F.col("event_id") % 5 == 0).select(
        "event_id", (F.col("value") * 2).alias("value")
    )
    out = update_zerofill(base, upd, keys="event_id", update_cols=["value"])
    return out.select(
        "event_id", F.round("value", 4).alias("value"), "user_id"
    )


# --- U1/U4: set ops -------------------------------------------------------

def union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Frame.concat` (`lakota/frame.py:126-152`) = UNION ALL."""
    e = _events(spark, sf_dir)
    a = e.where(F.col("event_type") == "click")
    b = e.where(F.col("event_type") == "error")
    return a.unionByName(b).select("event_id", "event_type", "value")


def except_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Commit.delete_labels` complement filter (`lakota/commit.py:477-479`)."""
    e = _events(spark, sf_dir)
    return e.where(~F.col("event_type").isin("click", "view")).select(
        "event_id", "event_type"
    )


# --- windows beyond the reference (rank / rolling / cumulative) -----------

def window_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
    )


def rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean over the 10 preceding events per user (ordered by the
    unique ts column → deterministic)."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-10, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        (
            (F.sum(cents).over(w) / F.lit(100.0)) / F.count(F.lit(1)).over(w)
        ).alias("roll_avg"),
    )


def cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("cum_value"),
    )


# --- sessionization (stateful-streaming shape, batch form) ----------------

def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative sum of breaks —
    the batch twin of `applyInPandasWithState` sessionization."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ refuses a direct bigint cast (Spark 4); go through
    # TIMESTAMP first — exact, since the session tz is pinned UTC and the
    # gap is a difference anyway (tz-shift-invariant)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    brk = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn(
        "session_id",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        money_sum(F.col("value"), 100).alias("session_value"),
    )


# --- as-of join -----------------------------------------------------------

def purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest click of the same user at or before it
    — the shuffle-once as-of join (see operators/asof.py)."""
    e = _events(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_click",
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("ts_click").alias("click_ts"),
        F.col("value_click").alias("click_value"),
    )


# --- JSON-ish props extraction -------------------------------------------

def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON `props` column (regexp-based so the
    oracle needs no JSON extension); aggregated per event_type."""
    e = _events(spark, sf_dir)
    k = F.regexp_extract(F.col("props"), r'"k":\s*(-?\d+)', 1).cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            # integer sum / count → deterministic double, no rounding needed
            (F.sum("k") / F.count(F.lit(1))).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def sexpr_daily_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CLI query shape run through the s-expression
    translator (SURVEY §3.3): mask + floor-bucketed reduce, compiled to
    Catalyst instead of interpreted over numpy."""
    from lakota_spark import sexpr

    e = _events(spark, sf_dir)
    masked = sexpr.mask(e, "(and (< self.value 150) (in self.event_type (list 'click' 'view')))")
    return sexpr.reduce_frame(
        masked,
        "(as (floor self.ts 'D') 'day')",
        "self.event_type",
        mx="(max self.value)",
        mn="(min self.value)",
        n="(count self.value)",
        order_cols=["ts"],
    )


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, first view -> first click after it ->
    first purchase after that. A chain of min-aggregations + non-equi
    joins — identical logic on both engines, fully deterministic."""
    e = _events(spark, sf_dir)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id", "tv", "tc")
        .agg(F.min("ts").alias("tp"))
    )
    return p.select("user_id", "tv", "tc", "tp")


def pivot_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily value totals per event type as columns (expressed as
    portable conditional aggregation; Spark's pivot() compiles to the
    same shape)."""
    e = _events(spark, sf_dir)

    def cents_if(t: str):
        cond = F.when(
            F.col("event_type") == t,
            F.round(F.col("value") * 100).cast("long"),
        ).otherwise(F.lit(0))
        return (F.sum(cond) / F.lit(100.0)).alias(f"sum_{t}")

    return e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        cents_if("click"),
        cents_if("view"),
        cents_if("purchase"),
        cents_if("signup"),
        cents_if("error"),
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value column per event type — the
    bucket key is an exact integer floor, so no approx_* sketch and no
    float-boundary ambiguity; one partial-aggregating shuffle."""
    e = _events(spark, sf_dir)
    bucket = F.floor(F.col("value") / F.lit(10.0)).cast("long")
    return (
        e.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )
