"""Custom stateful streaming operator (applyInPandasWithState):
sessionization state carries across micro-batches and converges to the
batch lag-window result."""

import pyspark.sql.functions as F

from astrospark.ops.events import w2_user_sessions
from astrospark.streaming.sessions import stream_user_sessions

SF_DIR = "/root/testdata/sf0.01"


def test_stream_sessions_match_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # time-ordered landing: two files split at the median ts, so per-user
    # event order holds across micro-batches (one file per trigger)
    in_dir = str(tmp_path / "ev_in")
    med = events.select(
        F.expr("percentile(unix_timestamp(ts), 0.5)").alias("m")
    ).first()["m"]
    cut = F.unix_timestamp("ts") <= med
    events.filter(cut).orderBy("ts", "event_id").coalesce(1).write.parquet(in_dir)
    events.filter(~cut).orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_user_sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)

    # last emitted row per user = final state
    out = spark.table("sess_out").toPandas()
    final = out.groupby("user_id").last()
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in w2_user_sessions(spark, SF_DIR).collect()
    }
    assert len(final) == len(batch)
    for uid, row in final.iterrows():
        assert (row.n_sessions, row.n_events) == batch[uid], uid
