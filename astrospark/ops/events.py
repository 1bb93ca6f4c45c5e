"""Event-stream operators over the events table: time-window aggregation,
gap-based sessionization, and JSON scalar extraction — the generic
pipeline capabilities a training-data ingestion system needs around the
extraction core. All portable to the DuckDB oracle (epoch-bucket windows,
lag/sum window functions, json string extraction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def w1_event_windows(spark, sf_dir) -> DataFrame:
    """Tumbling 1-hour windows per event_type: counts + value sums."""
    e = _events(spark, sf_dir)
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
    return (
        e.groupBy(hour.alias("hour_bucket"), "event_type")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def w2_user_sessions(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization: a session breaks after >30 min idle;
    output = sessions per user (lag + running sum of break flags)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").cast("int").alias("n_sessions"),
             F.count("*").cast("int").alias("n_events"))
    )


def f_json_extract(spark, sf_dir) -> DataFrame:
    """JSON scalar extraction from the props column, aggregated."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).cast("int").alias("max_k"),
        )
    )
