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


# --- skew-salted equi-join --------------------------------------------------

SALT_FACTOR = 8


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_id_col: str,
    factor: int = SALT_FACTOR,
    how: str = "inner",
) -> DataFrame:
    """Hot-key mitigation for large x large equi-joins: when one join key
    carries a disproportionate share of the left side (a bot user, an
    empty-string doc source), every row of that key lands in ONE shuffle
    partition and a single straggler task runs as long as the whole hot
    key — AQE's skew split helps sort-merge joins, but only after the
    skewed exchange is already written.

    Salting spreads the hot key BEFORE the exchange: the left side gets
    a deterministic salt in [0, factor) hashed from a unique id column
    (xxhash64 — content-derived, so re-runs and retries land identically;
    never a random or partition-derived salt, which breaks retry
    determinism), the right side replicates each row across all
    ``factor`` salts, and the join key becomes (key, salt) — the hot
    key's rows now spread over ``factor`` partitions. Row multiplicity
    is exactly preserved: each left row carries one salt and meets each
    matching right row exactly once (at that salt). Cost: ``factor`` x
    the right side's shuffle volume — the standard trade, applied to the
    smaller-but-not-broadcastable side.

    The salt is plan-internal only; results are identical to the plain
    join (asserted in tests/test_skew_join.py), so the DuckDB oracle
    replays the unsalted SQL.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(left_id_col)), F.lit(factor)).cast("int")
    )
    salts = F.array([F.lit(i) for i in range(factor)])
    salted_right = right.withColumn("_salt", F.explode(salts))
    return salted_left.join(salted_right, on=[on, "_salt"], how=how).drop("_salt")


def salted_join(spark, sf_dir) -> DataFrame:
    """Per-user purchase x click-profile join, executed through the
    salted path: purchases (fact) join the per-user click-count profile
    on user_id — the driver events table keys ~15 users over 10^3..10^5
    events, exactly the low-cardinality/hot-key regime where an unsalted
    user_id shuffle collapses onto a handful of tasks. Salt factor 8
    spreads each user across 8 partitions; the profile side (one row per
    user) replicates x8 — trivial here, and still linear at scale.
    """
    e = _t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").cast("int").alias("n_clicks"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    joined = salted_equi_join(purchases, clicks, on="user_id", left_id_col="event_id")
    return joined.groupBy("user_id").agg(
        F.count("*").cast("int").alias("n_purchases"),
        F.max("n_clicks").alias("n_clicks"),
        F.sum("cents").alias("purchase_cents"),
    )


def snapshot_diff(spark, sf_dir) -> DataFrame:
    """Cross-snapshot corpus diff — the CDC step between two crawl /
    ingest versions: which documents were added, removed, changed, or
    unchanged. The synthetic "previous" snapshot derives
    deterministically from the same table (docs with doc_id % 19 == 7
    are new since prev; docs with doc_id % 17 == 3 were removed from
    curr; docs with doc_id % 13 == 5 carry edited prev text), so both
    engines construct identical inputs — the diff machinery itself is
    exactly what a real two-snapshot run executes.

    Shape for scale: ONE full outer join keyed by doc_id (both sides
    co-partition on the key; with doc_id-bucketed tables the join is
    shuffle-free), content compared by md5 so the wide text column
    never crosses the exchange — each side projects (doc_id, hash)
    before joining.
    """
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prev = d.filter(F.col("doc_id") % 19 != 7).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 13 == 5, F.concat(F.col("text"), F.lit(" OLD"))
            ).otherwise(F.col("text"))
        ).alias("h_prev"),
    )
    curr = d.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id", F.md5("text").alias("h_curr")
    )
    j = prev.join(curr, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_prev").isNull(), F.lit("added"))
        .when(F.col("h_curr").isNull(), F.lit("removed"))
        .when(F.col("h_prev") != F.col("h_curr"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select("doc_id", status.alias("status"))
