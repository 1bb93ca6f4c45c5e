"""Streaming interval join vs the batch operator: drained pair set ==
batch contract row when nothing is late; a tight watermark DROPS
out-of-order arrivals (the state bound is real, not documentation).
The equi-key Spark demands for stream-stream joins comes from the same
time-bucket quantization the batch operator uses."""

import time

from pyspark.sql import functions as F

from astrospark.ops.events import interval_join
from astrospark.streaming.interval import stream_interval_pairs
from astrospark.streaming.sketches import stream_events_from_dir

SF = "/root/testdata/sf0.001"


def _drain(spark, stream_in, tmp_path, watermark, max_files=1):
    stream = stream_events_from_dir(spark, stream_in, max_files=max_files)
    pairs = stream_interval_pairs(stream, watermark=watermark)
    out_dir = str(tmp_path / "pairs")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir), q


def test_stream_interval_pairs_equal_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    stream_in = str(tmp_path / "arrivals")
    # 4 files -> 4 micro-batches at maxFilesPerTrigger=1. repartition
    # scatters rows across files, so errors and their matching purchases
    # land in DIFFERENT micro-batches — the pair set is only complete if
    # join state carries rows across batches. Arrival order is NOT
    # time-ordered, so the watermark must exceed the corpus time span
    # (30 days) for nothing to count as late; the tight-watermark case
    # is tested separately below.
    ev.repartition(4).write.parquet(stream_in)

    drained, _ = _drain(spark, stream_in, tmp_path, watermark="35 days")
    got = sorted(
        map(
            tuple,
            drained.groupBy("interval_id")
            .agg(
                F.count("*").cast("int").alias("n_purchases"),
                F.sum("cents").alias("purchase_cents"),
            )
            .collect(),
        )
    )
    want = sorted(map(tuple, interval_join(spark, SF).collect()))
    assert got == want
    assert len(got) > 10


def test_stream_interval_state_evicted_behind_watermark(spark, tmp_path):
    """The state bound is real: a first micro-batch from the corpus tail
    advances the watermark; processing a second micro-batch then EVICTS
    join state older than (watermark - join delay) — visible as
    numRowsRemoved in the state-operator metrics, with final state far
    below total input. (Spark does NOT guarantee dropping too-late
    input — same-batch matches still emit — so the result set is pinned
    by a deterministic sandwich, not an exact-late-drop claim.)"""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cutoff = "2024-01-20 00:00:00"
    stream_in = tmp_path / "arrivals"
    stream_in.mkdir()
    late = ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    fresh = ev.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
    fresh.coalesce(1).write.parquet(str(stream_in / "f0"))
    time.sleep(1.1)  # file-source orders micro-batches by mod time
    late.coalesce(1).write.parquet(str(stream_in / "f1"))

    drained, q = _drain(
        spark, str(stream_in) + "/*", tmp_path, watermark="2 hours"
    )
    join_ops = [
        op
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
        if op.get("operatorName", "").startswith("symmetricHashJoin")
    ]
    assert join_ops, [p.get("stateOperators") for p in q.recentProgress]
    # eviction actually ran once the watermark advanced
    assert sum(op.get("numRowsRemoved", 0) for op in join_ops) > 0, join_ops
    # final state holds only rows within the join horizon of the
    # watermark — far fewer than the ~400 error/purchase input rows
    final_state = join_ops[-1].get("numRowsTotal", 0)
    n_inputs = (
        ev.filter(F.col("event_type").isin("error", "purchase")).count()
    )
    assert final_state < n_inputs / 2, (final_state, n_inputs)

    # deterministic sandwich: everything from the fresh slice must be
    # present; nothing outside the full batch pair set may appear
    got = set(map(tuple, drained.collect()))
    fresh_pairs = set(map(tuple, stream_interval_pairs(fresh).collect()))
    all_pairs = set(map(tuple, stream_interval_pairs(ev).collect()))
    assert fresh_pairs <= got <= all_pairs
    assert len(got) > 0


def test_stream_interval_batch_mode_equals_operator(spark):
    """The same function body runs on a static frame (backfill path):
    aggregated pairs equal the contract row exactly."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    agg = (
        stream_interval_pairs(ev)
        .groupBy("interval_id")
        .agg(
            F.count("*").cast("int").alias("n_purchases"),
            F.sum("cents").alias("purchase_cents"),
        )
    )
    got = sorted(map(tuple, agg.collect()))
    want = sorted(map(tuple, interval_join(spark, SF).collect()))
    assert got == want
