"""Physical-plan regression tests — the engine's scale claims as
assertions (SCALE.md): filters push to parquet, projections prune
columns, dimension joins broadcast, top-k avoids global sorts,
ranked-window filters become group limits. If a refactor breaks one
of these, correctness tests stay green but 100 TB behavior regresses;
this file is what catches it."""

from __future__ import annotations

import pytest

from traffic_forecast_etl_spark.plans.catalog import QUERIES


def plan_of(spark, name, sf_dir, mode="formatted") -> str:
    df = QUERIES[name](spark, sf_dir)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.mark.parametrize(
    "query,needle",
    [
        # q1: shipdate filter reaches the parquet scan
        ("q1_pricing_summary", "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
        # p: exact literal pushdown
        ("p_project_filter", "PushedFilters: [IsNotNull(l_discount), EqualTo(l_discount,0.04)]"),
        # q3: dim joins broadcast; top-k is TakeOrdered, not Sort+Limit
        ("q3_shipping_priority", "BroadcastHashJoin"),
        ("q3_shipping_priority", "TakeOrderedAndProject"),
        ("o1_topk_sort", "TakeOrderedAndProject"),
        # q5 snowflake: every join broadcast (fact never shuffles pre-agg)
        ("q5_region_volume", "BroadcastHashJoin"),
        ("j2_fk_lookup", "BroadcastHashJoin"),
        ("j5_range_join", "BroadcastHashJoin"),
        # ranked-window top-k per group plans a WindowGroupLimit
        ("w2_topk_per_group", "WindowGroupLimit"),
    ],
)
def test_plan_contains(spark, sf_dir, query, needle):
    assert needle in plan_of(spark, query, sf_dir), f"{query} lost {needle!r}"


def test_q5_has_no_sort_merge_join(spark, sf_dir):
    """All five dims broadcast; a SortMergeJoin appearing means a dim
    grew past the broadcast path or a hint was dropped."""
    assert "SortMergeJoin" not in plan_of(spark, "q5_region_volume", sf_dir)


def test_q1_scan_prunes_columns(spark, sf_dir):
    """q1 must read exactly the 7 needed lineitem columns, not all 11."""
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:400]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }


def test_winnow_has_single_shuffle(spark, sf_dir):
    """t6 winnowing: the groupBy(doc_id) must REUSE the window's
    hash partitioning on doc_id — explode → hash → one Exchange →
    window min → partial+final agg with no second shuffle. A second
    Exchange appearing means someone broke the partitioning chain
    (at 100 TB that's a full re-shuffle of the k-gram stream)."""
    import re

    plan = plan_of(spark, "t6_winnow_fingerprint", sf_dir)
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan[:600]


def test_no_row_udfs_registered():
    """U1 contract: the engine has zero row-at-a-time Python UDFs —
    only Arrow-batched pandas UDFs / mapInPandas where documented."""
    import pathlib

    root = pathlib.Path(__file__).parent.parent / "traffic_forecast_etl_spark"
    offenders = []
    for f in root.rglob("*.py"):
        text = f.read_text()
        if "@F.udf" in text or "F.udf(" in text or "udf(lambda" in text:
            offenders.append(str(f))
    assert not offenders, offenders


@pytest.mark.parametrize(
    "query,needle",
    [
        # q4: the order-date range is pushed into the orders scan and
        # the correlated EXISTS plans as a semi join
        ("q4_order_priority", "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
        ("q4_order_priority", "LeftSemi"),
        # q21: EXISTS -> semi, NOT EXISTS -> anti, supplier broadcast
        ("q21_waiting_supplier", "LeftSemi"),
        ("q21_waiting_supplier", "LeftAnti"),
        ("q21_waiting_supplier", "BroadcastHashJoin"),
        # q22 via SQL surface: Catalyst decorrelates NOT EXISTS with a
        # pushed date predicate to an anti join, scalar subquery to a
        # broadcast
        ("q22_dormant_customers", "LeftAnti"),
        ("q22_dormant_customers", "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
    ],
)
def test_decorrelation_plan_shapes(spark, sf_dir, query, needle):
    assert needle in plan_of(spark, query, sf_dir), f"{query} lost {needle!r}"
