"""Streaming sketch maintenance == batch sketch, bit-for-bit: drain a
file-source stream with complete-mode aggregation and compare the final
registers/cells to the batch builds over the same files. This is the
executable form of the mergeability claim (HLL max-merge / count-min
sum-merge across micro-batches)."""

from pyspark.sql import functions as F

from astrospark.streaming.sketches import (
    stream_cm_cells,
    stream_documents_from_dir,
    stream_hll_registers,
)


def _write_docs(spark, path, n_parts=3):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [
                f"alpha beta g{i % 7} delta NGC spark {'join ' * (i % 3)}err"
                for i in range(60)
            ],
            "lang": ["en"] * 60,
            "source": [f"s{i % 4}" for i in range(60)],
            "n_chars": [0] * 60,
        }
    )
    spark.createDataFrame(docs).repartition(n_parts).write.parquet(path)


def _drain(stream_df, name, ck):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination(120)


def test_stream_cm_cells_equal_batch(spark, tmp_path):
    from astrospark.ops.text import CM_D, _cm_bucket

    in_dir = str(tmp_path / "docs")
    _write_docs(spark, in_dir)

    # batch cells over the same files, same expressions
    words = (
        spark.read.parquet(in_dir)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cm_bucket(F.col("w"), r).alias("bucket"))
            for r in range(CM_D)
        ]
    )
    batch = {
        (r.row, r.bucket): r.cnt
        for r in words.select(F.explode(rows).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }

    stream = stream_documents_from_dir(spark, in_dir, max_files=1)  # >1 micro-batch
    _drain(stream_cm_cells(stream), "cm_cells", str(tmp_path / "ck_cm"))
    got = {
        (r.row, r.bucket): r.cnt for r in spark.table("cm_cells").collect()
    }
    assert got == batch
    # bounded state: never more cells than the sketch size
    assert len(got) <= CM_D * 64


def test_stream_hll_registers_equal_batch(spark, tmp_path):
    from astrospark.ops.text import _hll_fields

    in_dir = str(tmp_path / "docs2")
    _write_docs(spark, in_dir)

    words = (
        spark.read.parquet(in_dir)
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    bucket, v = _hll_fields(F.col("w"))
    batch = {
        (r.source, r.bucket): r.m_rho
        for r in words.select("source", bucket, v)
        .select(
            "source",
            "bucket",
            F.when(F.col("v") == 0, F.lit(61))
            .otherwise(F.lit(61) - (F.length(F.expr("bin(v)"))))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m_rho"))
        .collect()
    }

    stream = stream_documents_from_dir(spark, in_dir, max_files=1)
    _drain(stream_hll_registers(stream), "hll_regs", str(tmp_path / "ck_hll"))
    got = {
        (r.source, r.bucket): r.m_rho for r in spark.table("hll_regs").collect()
    }
    assert got == batch
    assert all(rho >= 1 for rho in got.values())


def test_windowed_hll_users_stream_equals_batch(spark, tmp_path):
    """Watermark × sketch composition: the streamed per-(day, event_type)
    HLL registers equal the batch windowed build register-for-register
    (complete-mode drain), and the production append+watermark drain
    emits a finalized-window subset of exactly those rows."""
    import pandas as pd

    from astrospark.streaming.sketches import (
        stream_events_from_dir,
        windowed_hll_users,
    )

    # 6 days of events, 3 files -> multiple micro-batches
    rows = []
    for i in range(900):
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=9 * i),
                "user_id": i % 97,
                "event_type": ["click", "view", "error"][i % 3],
                "value": float(i % 10),
                "props": "{}",
            }
        )
    # land files in event-time order (the realistic ingestion: a feed
    # appends files as days close) — sequential writes give increasing
    # mtimes, so maxFilesPerTrigger=1 replays them in time order and
    # lateness stays within the 2-day watermark
    in_dir = str(tmp_path / "events")
    df = pd.DataFrame(rows)
    for j in range(3):
        chunk = df.iloc[j * 300 : (j + 1) * 300]
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(in_dir)

    batch = {
        (r.window_start, r.event_type, r.bucket): r.m_rho
        for r in windowed_hll_users(spark.read.parquet(in_dir)).collect()
    }
    assert len({k[0] for k in batch}) >= 6  # all days present

    stream = stream_events_from_dir(spark, in_dir, max_files=1)
    _drain(
        windowed_hll_users(stream), "whll_complete", str(tmp_path / "ck_whc")
    )
    got = {
        (r.window_start, r.event_type, r.bucket): r.m_rho
        for r in spark.table("whll_complete").collect()
    }
    assert got == batch

    # production semantics: append mode + watermark -> finalized windows
    # emitted once, state evicted; everything emitted matches the batch
    stream2 = stream_events_from_dir(spark, in_dir, max_files=1)
    q = (
        windowed_hll_users(stream2)
        .writeStream.format("memory")
        .queryName("whll_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_wha"))
        .start()
    )
    q.awaitTermination(120)
    emitted = {
        (r.window_start, r.event_type, r.bucket): r.m_rho
        for r in spark.table("whll_append").collect()
    }
    assert emitted  # watermark passed at least the early windows
    assert all(batch[k] == v for k, v in emitted.items())
