"""TPC-H-style relational queries (SURVEY.md §2.5 relational extension).

The reference has no joins (SURVEY.md §2.5) — these exercise the Spark-free
lunch: broadcast vs sort-merge join selection, partial aggregation,
predicate pushdown. Dimension tables (region/nation/supplier/customer) are
explicitly broadcast where they are guaranteed small relative to the fact
tables, which holds at any scale factor of this star schema.

Column aliases match `oracle_sql()` in `__spark_entry__.py` exactly —
the driver's hash compare is name-sensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakota_spark.functions import money_sum

# Money expressions use fixed-point exact sums (see functions.money_sum):
# l_extendedprice is on a 2-decimal grid, ×(1-l_discount) → 4 decimals,
# ×(1+l_tax) → 6 decimals. Scaling to integers before summing makes every
# aggregate order-independent and bitwise-reproducible across engines.
_DISC_PRICE = lambda: F.col("l_extendedprice") * (1 - F.col("l_discount"))  # noqa: E731


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report. Pure scan + hash aggregate;
    the filter and the 4-column projection push down to the parquet scan."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            money_sum(_DISC_PRICE(), 10000).alias("sum_disc_price"),
            money_sum(
                _DISC_PRICE() * (1 + F.col("l_tax")), 1000000
            ).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (money_sum(F.col("l_extendedprice"), 100) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (money_sum(F.col("l_discount"), 100) / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top unshipped orders by revenue. customer is broadcast
    (dim), orders⋈lineitem is the big join (sort-merge on l_orderkey)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-30").cast("timestamp")
    return (
        l.where(F.col("l_shipdate") > cutoff)
        .join(o.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(_DISC_PRICE(), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation. All dims broadcast; lineitem⋈orders sort-merge."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(money_sum(_DISC_PRICE(), 10000).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single filter + scalar aggregate — tests predicate pushdown
    (all three predicates reach the parquet scan)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias(
            "revenue"
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-ish: customers ranked by lost revenue from returns."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(_DISC_PRICE(), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-flavored: revenue share by part brand (broadcast dim join +
    conditional aggregation)."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            money_sum(_DISC_PRICE(), 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-flavored: EXISTS → left-semi join with a non-equi
    residual condition (l_shipdate > o_orderdate)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    filtered = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    semi = filtered.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (the reference has no joins at all):
    customers with no pending ('P') orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o.where(F.col("o_orderstatus") == "P"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


def rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one pass."""
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) aggregates (expand + two-phase)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-flavored: conditional (CASE) aggregation after a join."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-flavored: correlated 'below 20% of per-part average'
    — decorrelated into a window average (no join back, one shuffle)."""
    from pyspark.sql import Window

    l = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    flagged = l.withColumn(
        "part_avg_qty", F.avg("l_quantity").over(w)
    ).where(F.col("l_quantity") < 0.5 * F.col("part_avg_qty"))
    return flagged.agg(
        money_sum(F.col("l_extendedprice"), 100).alias("total_price"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-flavored: supplier-nation x customer-nation trade volume
    by year (two broadcast dim joins on distinct nation roles)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(money_sum(_DISC_PRICE(), 10000).alias("volume"))
    )


def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations in one pass)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def top_suppliers_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-flavored: suppliers achieving the maximum revenue —
    aggregate once, then broadcast the scalar max back (a global window
    would funnel everything into one partition; the broadcast scalar
    keeps the filter distributed)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum(_DISC_PRICE(), 10000).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-flavored: orders whose total quantity exceeds a threshold
    (HAVING on an aggregate, then enrich via joins)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 180)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "o_orderdate", "total_qty")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-flavored: one nation's share of yearly revenue — a ratio
    of two fixed-point-exact sums (deterministic double division)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    cents = F.round(_DISC_PRICE() * 10000).cast("long")
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_year = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        (F.sum(F.when(F.col("n_name") == "CHINA", cents).otherwise(0))
         / F.lit(10000.0)).alias("nation_revenue"),
        (F.sum(cents) / F.lit(10000.0)).alias("total_revenue"),
    )
    return per_year.select(
        "order_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer. Left outer join
    keeps order-less customers (count 0), then a second aggregation
    histograms the counts — two shuffles, both partial-aggregated."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. Conditional fixed-point sums; the
    part join broadcasts the dimension; ratio left unrounded (int-exact
    numerator/denominator -> deterministic double division)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cents = F.round(_DISC_PRICE() * 10000).cast("long")
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * (F.sum(
                F.when(F.col("p_type").startswith("PROMO"), cents).otherwise(0)
            ) / F.lit(10000.0))
            / (F.sum(cents) / F.lit(10000.0))
        ).alias("promo_revenue_pct")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-flavored: disjunctive brand/size/quantity predicates.
    The OR-of-ANDs predicate references both sides, so it evaluates
    post-join; the per-side prefilters (size/quantity envelopes) are
    what pushes to the scans — the planner-friendly Q19 shape."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 40))
        )
    )
    joined = (
        l.where(F.col("l_quantity").between(1, 40))
        .join(F.broadcast(p.where(F.col("p_size").between(1, 30))),
              F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
    )
    return joined.agg(money_sum(_DISC_PRICE(), 10000).alias("revenue"))


def q22_balance_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-flavored: positive-balance customers above the global
    average balance with no RECENT orders, per nation. The global average
    is a broadcast scalar (no global window); the inactivity test is an
    anti join against the date-filtered orders (filter pushed to the
    scan)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.where(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (money_sum(F.col("c_acctbal"), 100) / F.count(F.lit(1))).alias("a")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
    )
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    no_orders = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        money_sum(F.col("c_acctbal"), 100).alias("totacctbal"),
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-flavored (adapted: no partsupp table in the testdata, so
    profit = discounted revenue rather than revenue − supplycost):
    profit on bolt parts by supplier nation and order year (the testdata
    part names are "<adj> <noun>" — 'bolt' plays Q9's 'green').

    Plan shape for scale: lineitem drives; part is filtered BEFORE the
    join (predicate reaches the scan) and broadcast along with supplier +
    nation; the only big-table shuffle is lineitem⋈orders on orderkey;
    the two-key groupBy partial-aggregates below the exchange.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    joined = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(money_sum(_DISC_PRICE(), 10000).alias("sum_profit"))


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-flavored (adapted: the testdata lineitem has no
    l_commitdate/l_receiptdate, so "late" = shipped more than 60 days
    after the order date): suppliers who were the SOLE late supplier on a
    finished multi-supplier order.

    Exercises Q21's signature shape — a semi-join ("another supplier took
    part") AND an anti-join ("no OTHER supplier was late") against the
    same fact table, then a dim join + count. Plan shape for scale: the
    late-lines relation is filtered before both self-joins; both
    self-joins are equi-joins on l_orderkey (co-partitioned shuffle,
    reused exchange); supplier is broadcast.
    """
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = _t(spark, sf_dir, "supplier")
    late = (
        l.join(o.select("o_orderkey", "o_orderdate"),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    multi = late.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    late2 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = multi.join(
        late2,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-flavored (adapted: no partsupp, so a part's "value" is
    its discounted shipped revenue rather than supplycost × availqty):
    parts whose value exceeds 1.3× the average part value — the
    scalar-aggregate subquery pattern. (TPC-H scales Q11's fraction by
    1/SF; anchoring to the average is the equivalent scale-robust cut
    for this near-uniform synthetic distribution.)

    The fraction test is done on the EXACT integer (cents) sums —
    ``10 * part_cents * n_parts > 13 * total_cents`` — so the cut is
    bitwise reproducible on any engine and any partitioning. The total
    is a one-row broadcast (cross join) — no second scan of the fact
    table, and at 100 TB the per-part aggregate is the only real
    shuffle.

    Integer-range bound: the predicate stays in int64, so it is exact
    only while ``10 * max(part_cents) * n_parts < 2^63`` (DuckDB
    promotes to HUGEINT and never wraps). At SF=100k that is ~1e6-cent
    parts × ~2e7 parts × 10 ≈ 2e14 — five orders inside the bound; a
    deployment beyond ~SF 1e7 should move the predicate to
    decimal(38,0) before the multiply.
    """
    l = _t(spark, sf_dir, "lineitem")
    cents = F.sum(
        F.round(_DISC_PRICE() * 10000).cast("long")
    )
    per_part = l.groupBy("l_partkey").agg(cents.alias("part_cents"))
    total = per_part.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.lit(10) * F.col("part_cents") * F.col("n_parts")
            > F.lit(13) * F.col("total_cents")
        )
        .select(
            "l_partkey",
            (F.col("part_cents") / F.lit(10000.0)).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-flavored (adapted: the part↔supplier bridge is the
    distinct (l_partkey, l_suppkey) pairs actually shipped, standing in
    for partsupp; the "customer complaints" exclusion keeps its NOT-IN →
    anti-join shape using s_acctbal < 0): distinct supplier count per
    (p_brand, p_type, p_size).

    Plan shape for scale: the bridge distinct partial-aggregates
    map-side; the exclusion list is a broadcast anti-join; part is
    broadcast; countDistinct expands once (single count-distinct column).
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bridge = l.select("l_partkey", "l_suppkey").distinct()
    excluded = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = bridge.join(
        F.broadcast(excluded),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        kept.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q20_promotion_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-flavored (adapted: no partsupp availqty, so the "half
    the shipped quantity" test compares a supplier's 1997 shipped
    quantity of a PROMO part against half that part's total): suppliers
    who shipped MORE than half of some PROMO part's 1997 volume.

    The half test is exact on integer quantity units
    (``2 * supp_units > part_units``). Plan shape for scale: the PROMO +
    year filters reach the lineitem scan before the aggregate; per-part
    totals derive from the per-(part,supplier) aggregate (no second
    lineitem scan); the qualifying pairs semi-join into the broadcast
    supplier dim.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    units = F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
    shipped = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(units.alias("supp_units"))
    )
    part_tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_units").alias("part_units")
    )
    qualifying = shipped.join(
        part_tot, F.col("l_partkey") == F.col("pk")
    ).where(F.lit(2) * F.col("supp_units") > F.col("part_units"))
    return (
        s.join(
            qualifying.select(F.col("l_suppkey").alias("qk")).distinct(),
            F.col("s_suppkey") == F.col("qk"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-flavored (adapted: no partsupp, so a supplier's "cost"
    for a part is its minimum discounted sell price observed in
    lineitem): for every ECONOMY part, the supplier(s) in region 0
    matching the part's minimum cost — Q2's correlated-minimum subquery
    shape.

    The correlated MIN resolves as a per-part window minimum over the
    (part, supplier) aggregate — one shuffle keyed by part, no second
    scan and no self-join (the classic decorrelation Catalyst can't do
    automatically for a hand-written subquery). Cost ties keep all tied
    suppliers, exactly like Q2. Supplier/nation dims broadcast.
    """
    from pyspark.sql import Window

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    cost_cents = F.min(
        F.round(_DISC_PRICE() * 10000).cast("long")
    )
    offers = (
        l.join(F.broadcast(p.select("p_partkey", "p_brand")),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(cost_cents.alias("cost_cents"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cents", F.min("cost_cents").over(w))
        .where(F.col("cost_cents") == F.col("min_cents"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            (F.col("cost_cents") / F.lit(10000.0)).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
