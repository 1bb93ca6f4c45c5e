"""Classic relational shapes over the TPC-H-ish driver tables — the
canonical Spark join/aggregate plans, oracle-checked against DuckDB.

These round out the engine's relational surface beyond the extraction
pipeline: pushed-down scan predicates, map-side partial aggregation,
broadcast-hash joins for dimension tables, and left-semi joins. Money
aggregates are summed as exact integer cents (per-row round is
bit-deterministic; integer sums are order-independent) so results hash
identically across engines regardless of float summation order — raw
double sums can differ in the low digits between Spark's partial
aggregation tree and DuckDB's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHIP_CUTOFF = "1997-06-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("bigint")


def r1_pricing_summary(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 shape: scan-filter (pushable range predicate) → partial →
    final hash aggregation; one shuffle of (flag, status) partials."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_cents"),
            F.count("*").cast("bigint").alias("n_items"),
        )
        .withColumn(
            "avg_price", F.round(F.col("sum_base_cents") / 100.0 / F.col("n_items"), 4)
        )
    )
    return agg


def r2_segment_revenue(spark, sf_dir) -> DataFrame:
    """Fact ⋈ broadcast(dimension): orders joined to the 1500-row customer
    table — BroadcastHashJoin, the fact side never shuffles for the join;
    the only exchange carries (segment) partials."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
    )


def r3_priority_with_lineitems(spark, sf_dir) -> DataFrame:
    """TPC-H Q4 shape: EXISTS rewritten as a left-semi join (no row
    multiplication, build side streams) → count by priority."""
    orders = _t(spark, sf_dir, "orders")
    # no distinct(): left-semi already emits each order at most once, so a
    # pre-dedup would just add a shuffle
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    kept = orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_semi")
    return kept.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
