"""Classic OLAP aggregation queries over the fact tables.

These go beyond the reference's tiny aggregation surface (MAX/COUNT —
SURVEY.md §2.4) to prove out the engine's grouped-aggregation path:
partial+final hash aggregation, whole-stage codegen, and pushdown all come
from Catalyst. They are the stable bench anchors (bench.py).

Numeric policy: money/discount columns are 2-decimal by data contract, so
aggregates run on exact DECIMAL internally and cast to DOUBLE only at the
output — summation order can't perturb the result, keeping the DuckDB
oracle hash bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dec(col: str, prec: int = 15, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: groupBy 2 low-cardinality keys,
    8 aggregates. Scan-dominated; partial aggregation makes the shuffle a
    few dozen rows regardless of input size."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    disc_price = price * (F.lit(1).cast("decimal(3,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Join + agg + deterministic top-k: revenue per part across the fact
    table; exact decimal revenue, TakeOrderedAndProject at the end."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_partkey").cast("long").alias("partkey"),
            F.col("p_name").alias("part_name"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("partkey"))
        .limit(k)
    )


def top_parts_by_revenue_sql(k: int = 20) -> str:
    return f"""
SELECT p_partkey AS partkey, p_name AS part_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY revenue DESC, partkey ASC
LIMIT {k}
"""


def q_top_parts_per_nation(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-group top-k (window rank): each supplier nation's ``k``
    highest-revenue parts — the grouped version of the global top-k, the
    canonical dense_rank/filter pattern.

    Scale shape: revenue aggregates FIRST to (nation, partkey) — the
    window then ranks the aggregated table (≤ nations × parts rows), not
    the fact table. The supplier→nation dimension path is two broadcast
    joins (tiny dims); the only big shuffle is the (suppkey) join of
    lineitem to supplier and the (nation, partkey) aggregation. Rank ties
    break on partkey so the result is deterministic.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    from pyspark.sql import Window

    dim = F.broadcast(
        supp.select("s_suppkey", "s_nationkey").join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    per_part = (
        li.join(dim, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("l_partkey")
    )
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("n_name").alias("nation"),
            F.col("l_partkey").cast("long").alias("partkey"),
            "revenue",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def top_parts_per_nation_sql(k: int = 3) -> str:
    return f"""
WITH per_part AS (
    SELECT n_name AS nation, l_partkey AS partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT nation, partkey, revenue,
       CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY revenue DESC, partkey ASC) AS INT) AS rk
FROM per_part
QUALIFY rk <= {k}
"""
