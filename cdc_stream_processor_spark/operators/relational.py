"""General relational operators (SURVEY.md §2.11).

The reference has no relational surface beyond its fixed DAG; Catalyst gives
us the full family natively. These thin wrappers standardize determinism
(explicit tie-breaks, decimal-exact money sums) so every operator is
DuckDB-oracle checkable, and encode the scale-aware defaults (partial
aggregation, broadcast for dimension joins, single-shuffle top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent (exact) sum for double money columns: aggregate in
    DECIMAL, cast back to double. Catalyst still plans partial+final agg."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum divided by count, in double.
    (A plain avg() over doubles is accumulation-order dependent.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number(). `order_by` must be a total
    order (include a unique tie-break column) for deterministic output.

    Scale note: one shuffle on the partition keys; Spark plans a
    WindowGroupLimit (rank pushdown) so each partition only keeps k rows
    before the final sort — no global sort of the fact table.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k: orderBy + limit. Spark executes TakeOrderedAndProject —
    per-partition heap of k then driver merge, no full sort/shuffle."""
    return df.orderBy(*order_by).limit(k)
