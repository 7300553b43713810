"""TPC-H-analog subquery family: result sanity + the plan shapes that make
each subquery form scale (semi/anti joins instead of per-row subquery
re-execution, broadcast one-row scalar aggregates, decorrelated MIN).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc_stream_processor_spark import queries_tpch as QT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_compiles_to_left_semi(spark, sf_dir):
    plan = _plan(QT.q_order_priority_check(spark, sf_dir))
    assert "LeftSemi" in plan
    # one order counts once no matter how many late lines it has
    rows = QT.q_order_priority_check(spark, sf_dir).collect()
    assert all(r.order_count > 0 for r in rows)


def test_not_exists_compiles_to_anti_join(spark, sf_dir):
    plan = _plan(QT.q_sales_opportunity(spark, sf_dir))
    # NOT EXISTS → broadcast hash anti join on the order keys
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only nested-loop is the intended ONE-ROW scalar broadcast (the
    # global (total, n) aggregate); a fact-side cartesian would be fatal
    assert "CartesianProduct" not in plan


def test_not_in_supplier_blacklist_is_anti_join(spark, sf_dir):
    plan = _plan(QT.q_parts_supplier_dist(spark, sf_dir))
    assert "LeftAnti" in plan
    # the part dim broadcasts onto the lineitem bridge
    assert "BroadcastHashJoin" in plan


def test_scalar_total_broadcasts_not_nested_loop(spark, sf_dir):
    """The one-row global aggregate joins via broadcast; the decimal
    integer-scaled threshold keeps the comparison exact."""
    plan = _plan(QT.q_important_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_correlated_min_decorrelates(spark, sf_dir):
    """The Q2-style correlated scalar MIN must become an aggregate +
    equi-join on partkey, never a per-part re-execution."""
    plan = _plan(QT.q_min_acctbal_supplier(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_custdist_keeps_zero_order_customers(spark, sf_dir):
    """The priority filter must live ON the left join: customers whose only
    orders are urgent still appear, in the c_count = 0 bucket."""
    rows = {
        r.c_count: r.custdist
        for r in QT.q_custdist(spark, sf_dir).collect()
    }
    total = sum(rows.values())
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    assert total == n_cust  # every customer lands in exactly one bucket


def test_top_supplier_equals_exact_max(spark, sf_dir):
    rows = QT.q_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1  # all tie on the max


def test_large_orders_threshold_is_exact_on_integer_quantities(spark, sf_dir):
    """l_quantity is integer-valued, so the HAVING sum is exact in double at
    any accumulation order — assert the precondition the docstring claims."""
    from cdc_stream_processor_spark.sources import batch as B

    li = B.load_table(spark, sf_dir, "lineitem")
    n_frac = li.filter(
        F.col("l_quantity") != F.round(F.col("l_quantity"))
    ).count()
    assert n_frac == 0
    big = QT.q_large_orders(spark, sf_dir)
    assert big.filter(F.col("sum_qty") <= 200).count() == 0


def test_promo_revenue_share_bounded(spark, sf_dir):
    rows = QT.q_promo_revenue(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.promo_share_pct <= 100.0 for r in rows)


def test_product_profit_broadcasts_all_dims(spark, sf_dir):
    """Q9 analog: the only shuffle join is lineitem⋈orders on orderkey;
    part, supplier, nation ride broadcasts. A shuffled dim join at 100 TB
    would re-partition the fact table three extra times."""
    plan = _plan(QT.q_product_profit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    rows = QT.q_product_profit(spark, sf_dir).collect()
    assert rows and all(r.o_year >= 1995 for r in rows)


def test_dominant_suppliers_single_fact_shuffle(spark, sf_dir):
    """Q20 analog: both aggregation levels hang off the same l_partkey
    shuffle; the supplier probe is a semi join (each supplier once)."""
    df = QT.q_dominant_part_suppliers(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    rows = df.collect()
    assert len({r.s_suppkey for r in rows}) == len(rows)


def test_waiting_suppliers_charges_sole_late_supplier_only(spark, sf_dir):
    """Q21 analog: an order with two late suppliers charges nobody; the
    per-order roll-up must enforce exactly-one-late + multi-supplier."""
    import duckdb as _dd

    con = _dd.connect()
    exact = con.execute(
        f"""
        WITH pair AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                          THEN 1 ELSE 0 END) AS is_late
          FROM '{sf_dir}/lineitem.parquet'
          JOIN '{sf_dir}/orders.parquet' ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY 1, 2
        ), per_order AS (
          SELECT l_orderkey, COUNT(*) n_supp, SUM(is_late) n_late
          FROM pair GROUP BY 1
        )
        SELECT COUNT(*) FROM pair JOIN per_order USING (l_orderkey)
        WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
        """
    ).fetchone()[0]
    total = (
        QT.q_waiting_suppliers(spark, sf_dir)
        .agg(F.sum("numwait").cast("bigint").alias("t"))
        .collect()[0]
        .t
    )
    assert total == exact
