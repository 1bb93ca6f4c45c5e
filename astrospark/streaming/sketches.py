"""Streaming mergeable sketches: the batch sketch family
(ops/text.py hll_distinct_words / heavy_hitters_cmsketch) maintained
INCREMENTALLY over a document stream.

This is the mergeability argument made live: because HLL registers are
max-merge and count-min cells are sum-merge, the streaming aggregation
state is BOUNDED BY THE SKETCH SIZE (64 registers per source / 256
cells) no matter how many documents flow past — the canonical
"streaming-friendly aggregate". Contrast a streaming distinct-count or
word-count, whose state grows with the key space. Same expressions as
the batch builds, so a drained stream's registers equal the batch
sketch over the same files BIT-FOR-BIT (asserted in
tests/test_streaming_sketches.py).

No watermark is needed: the sketches are monotone accumulators (max /
sum), not windowed results — emit in update/complete mode and the
latest row per key IS the sketch. A windowed variant (per-day
registers) composes by adding the window to the group key; state stays
(windows in flight) × sketch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from astrospark.ops.text import CM_D, _cm_bucket, _hll_fields

DOCUMENTS_SCHEMA_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def stream_documents_from_dir(spark, input_dir: str, max_files: int = 32) -> DataFrame:
    """File-source stream of documents-table parquet (the driver
    testdata shape: doc_id/text/lang/source/n_chars) — the sketch ops
    consume raw text, unlike extract_stream's interleaved spans
    source."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def _stream_words(docs_stream: DataFrame, with_source: bool = False) -> DataFrame:
    cols = (["source"] if with_source else []) + [
        F.explode(F.split("text", " ")).alias("w")
    ]
    return docs_stream.select(*cols).filter(F.col("w") != "")


def stream_cm_cells(docs_stream: DataFrame) -> DataFrame:
    """Streaming count-min build: every arriving word occurrence
    increments its CM_D cells; the streaming state is exactly the
    ≤ 256 (row, bucket, cnt) cells. Identical bucket arithmetic to the
    batch heavy_hitters_cmsketch, so cnt values match it exactly once
    the stream drains."""
    words = _stream_words(docs_stream)
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cm_bucket(F.col("w"), r).alias("bucket"))
            for r in range(CM_D)
        ]
    )
    return (
        words.select(F.explode(rows).alias("c"))
        .select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def stream_hll_registers(docs_stream: DataFrame) -> DataFrame:
    """Streaming HLL register maintenance: per-(source, bucket) MAX of
    rho over all words seen so far — state is ≤ 64 registers per
    source. Identical md5-nibble bucket/rho to the batch
    hll_distinct_words, so the drained registers equal the batch
    register table exactly (the estimate is then one stateless
    projection away, computed at read time)."""
    words = _stream_words(docs_stream, with_source=True)
    bucket, v = _hll_fields(F.col("w"))
    fields = words.select("source", bucket, v).select(
        "source",
        "bucket",
        F.when(F.col("v") == 0, F.lit(61))
        .otherwise(F.lit(61) - (F.length(F.expr("bin(v)"))))
        .cast("int")
        .alias("rho"),
    )
    return fields.groupBy("source", "bucket").agg(F.max("rho").alias("m_rho"))


EVENTS_SCHEMA_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events_from_dir(spark, input_dir: str, max_files: int = 32) -> DataFrame:
    """File-source stream of events-table parquet (the driver testdata
    shape: event_id/ts/user_id/event_type/value/props)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def windowed_hll_users(
    events_stream: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Watermarked per-window distinct-user HLL registers: the
    time-series cardinality rollup (daily active users per event type)
    every analytics pipeline maintains — composed from the SAME
    md5-nibble register arithmetic as the batch sketch, so a drained
    stream's registers equal `groupBy(window(ts), event_type)` batch
    registers exactly.

    State story: (windows in flight) × 64 registers per event type —
    the watermark EVICTS finalized windows (append mode emits them
    once), so state is bounded by the watermark horizon, not stream
    length; within a window the register max-merge keeps per-key state
    O(64) regardless of event volume. This is the composition rule
    stated in the module docstring, made concrete: window on the group
    key, sketch as the aggregate. Works identically over batch frames
    (no watermark) for backfill.
    """
    bucket, v = _hll_fields(F.col("user_id").cast("string"))
    fields = events_stream.select("ts", "event_type", bucket, v).select(
        "ts",
        "event_type",
        "bucket",
        F.when(F.col("v") == 0, F.lit(61))
        .otherwise(F.lit(61) - (F.length(F.expr("bin(v)"))))
        .cast("int")
        .alias("rho"),
    )
    if fields.isStreaming:
        fields = fields.withWatermark("ts", watermark)
    return (
        fields.groupBy(F.window("ts", window).alias("w"), "event_type", "bucket")
        .agg(F.max("rho").alias("m_rho"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "bucket",
            "m_rho",
        )
    )
