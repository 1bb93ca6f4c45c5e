"""Streaming twin of the batch point-in-interval join: watermarked
stream-stream self-join with a time-range condition.

``ops.events.interval_join`` answers "which purchases landed in the
hour after each error" over a static table; a live pipeline wants the
same pairs AS THEY ARRIVE. Spark's stream-stream join supports exactly
this natively when the join condition carries an event-time range and
both sides are watermarked — the engine derives, from the range bounds,
how long each side's rows can still find a partner, and EVICTS state
older than that. No custom stateful operator needed: this is the one
range-join case Structured Streaming handles without the bucket
decomposition the batch side uses (state is keyed by time, not shuffled
by a bucket key).

State story: each error row is held for (watermark + window) of event
time, each purchase row for (watermark) — state is bounded by arrival
rate x horizon, independent of total stream length. Inner-join matches
emit as soon as both sides arrive (no watermark latency on results; the
watermark only gates state eviction), so a drained finite stream emits
exactly the batch pair set — asserted row-for-row against the batch
operator in tests/test_streaming_interval.py.

The pair emission deliberately stays un-aggregated: aggregating after a
stream-stream join chains two stateful operators (legal since Spark
3.4+ with watermark propagation, but append-mode results then wait for
window finalization); downstream rollups read the emitted pair table —
same split as the batch operator's pairs->groupBy, just across the
sink boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from astrospark.engine.session import utc_scope
from astrospark.ops.events import INCIDENT_WINDOW_US

__all__ = ["stream_interval_pairs"]


def stream_interval_pairs(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Match every purchase to the error events whose 1-hour incident
    window contains it, over one events stream (self-joined). Emits one
    row per (interval_id, purchase_id) pair with the purchase's integer
    cents — the streaming analogue of the batch operator's pre-
    aggregation pair set (same inclusive [err_ts, err_ts + 1h] bounds).
    Works identically on a batch frame (no watermark applied) for
    backfill/drain-equality testing.

    Plan-built under utc_scope like the batch event ops: the bucket keys
    come from ``unix_micros(cast(ts))``, and a DST-transitioning session
    TZ makes that map non-monotonic — a pair straddling a spring-forward
    could land outside its exploded bucket range and be silently missed.
    UTC makes the epoch map linear, so bucket coverage of the NTZ range
    condition is exact.
    """
    with utc_scope(events_stream.sparkSession):
        return _build_pairs(events_stream, watermark)


def _build_pairs(events_stream: DataFrame, watermark: str) -> DataFrame:
    window_s = INCIDENT_WINDOW_US // 1_000_000
    b = F.lit(INCIDENT_WINDOW_US)
    errors = events_stream.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("err_ts"),
    )
    purchases = events_stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    if events_stream.isStreaming:
        errors = errors.withWatermark("err_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    # Spark stream-stream joins REQUIRE an equality predicate — the
    # range condition alone is rejected. The same bucket quantization
    # the batch operator uses provides it: the error side explodes to
    # its <=2 covered time buckets (stateless projection), the purchase
    # side computes its one bucket, and the join carries bucket equality
    # PLUS the event-time range (which Spark still uses to bound state).
    lo_us = F.unix_micros(F.col("err_ts").cast("timestamp"))
    errors = errors.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(lo_us / b), F.floor((lo_us + F.lit(INCIDENT_WINDOW_US)) / b)
            )
        ),
    )
    purchases = purchases.withColumn(
        "bucket", F.floor(F.unix_micros(F.col("p_ts").cast("timestamp")) / b)
    )
    cond = (
        (purchases["bucket"] == errors["bucket"])
        & (F.col("p_ts") >= F.col("err_ts"))
        & (F.col("p_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    return purchases.join(errors, cond, "inner").select(
        "interval_id", "purchase_id", "cents"
    )
