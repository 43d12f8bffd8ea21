"""Plan-shape contracts: pushdown, pruning, broadcast choice, partial agg.

These lock in the performance properties the 100 TB design depends on —
a regression here is a silent 100× slowdown at scale even when results
stay correct.
"""

from lakota_spark import plans
from lakota_spark.queries import parity, tpch
from lakota_spark.schema import Schema

SF = "/root/testdata/sf0.001"


def test_q6_filters_reach_scan(spark):
    df = tpch.q6_forecast_revenue(spark, SF)
    plans.assert_pushed(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThan(l_quantity",
    )


def test_q6_column_pruning(spark):
    df = tpch.q6_forecast_revenue(spark, SF)
    cols = plans.scan_columns(df)
    assert "l_comment" not in cols and "l_orderkey" not in cols
    assert {"l_extendedprice", "l_discount", "l_quantity", "l_shipdate"} <= cols


def test_q3_broadcasts_dimension(spark):
    strategies = plans.join_strategies(tpch.q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in strategies
    assert "CartesianProduct" not in strategies


def test_q1_partial_aggregation(spark):
    assert plans.has_partial_aggregation(tpch.q1_pricing_summary(spark, SF))


def test_events_ns_range_pushdown(spark):
    df = parity.scan_range(spark, SF)
    pushed = " ".join(plans.pushed_filters(df))
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed


def test_engine_read_pushdown(repo):
    coll = repo.create_collection(Schema(ts="int*", value="float"), "p")
    s = coll.series("x")
    s.write({"ts": list(range(50)), "value": [float(i) for i in range(50)]})
    df = s.frame(start=10, stop=20)
    plans.assert_pushed(
        df, "GreaterThanOrEqual(ts,10)", "LessThanOrEqual(ts,20)"
    )
    # select-pushdown: only requested columns in the scan
    df2 = s.frame(select=["ts"], sort=False)
    assert "value" not in plans.scan_columns(df2)
