"""Streaming incremental dedup == batch operator, row-for-row: the
same batch that ``dedup_incremental`` screens in one plan arrives here
as a multi-micro-batch file stream, screened per micro-batch against
the one persisted index-signature frame. Per-document verdicts have no
cross-batch state, so the drained verdict table must equal the batch
output exactly — any drift means the foreachBatch path and the contract
row no longer share one implementation."""

from pyspark.sql import functions as F

from astrospark.ops.dedup import (
    INCR_NEW_MOD,
    INCR_NEW_REM,
    INCR_RECRAWL_MOD,
    INCR_RECRAWL_OFFSET,
    INCR_RECRAWL_SUFFIX,
    dedup_incremental,
)
from astrospark.streaming.incremental import (
    build_index_signatures,
    stream_screen_to_parquet,
)

SF = "/root/testdata/sf0.001"


def test_stream_screen_equals_batch_operator(spark, tmp_path):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    is_new = (F.col("doc_id") % INCR_NEW_MOD) == INCR_NEW_REM
    idx = d.filter(~is_new).select("doc_id", "text")
    batch = (
        d.filter(is_new)
        .select("doc_id", "text")
        .unionAll(
            idx.filter((F.col("doc_id") % INCR_RECRAWL_MOD) == 0).select(
                (F.col("doc_id") + INCR_RECRAWL_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(INCR_RECRAWL_SUFFIX)).alias("text"),
            )
        )
    )
    # the stream source shape matches the documents table DDL
    stream_in = str(tmp_path / "arrivals")
    (
        batch.withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("crawl"))
        .withColumn("n_chars", F.length("text"))
        .repartition(3)
        .write.parquet(stream_in)
    )

    index_sig = build_index_signatures(idx)
    out_dir = str(tmp_path / "verdicts")
    q = stream_screen_to_parquet(
        spark,
        stream_in,
        index_sig,
        out_dir,
        str(tmp_path / "ck"),
        max_bucket=None,
        max_files=1,
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # genuinely multi-micro-batch

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(map(tuple, dedup_incremental(spark, SF, max_bucket=None).collect()))
    assert got == want


def test_stream_decontaminate_equals_batch_operator(spark, tmp_path):
    """Streaming semantic decontamination == batch contract row,
    row-for-row: training vectors arrive as a multi-micro-batch file
    stream, screened per batch against the one persisted eval frame
    by the SAME screen_decontaminate core."""
    from astrospark.ops.similarity import EVAL_STRIDE, semantic_decontaminate
    from astrospark.streaming.incremental import (
        build_eval_frame,
        stream_decontaminate_to_parquet,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    stream_in = str(tmp_path / "arrivals")
    (
        e.filter((F.col("vec_id") % EVAL_STRIDE) != 0)
        .select("vec_id", "embedding")
        .repartition(3)
        .write.parquet(stream_in)
    )

    eval_frame = build_eval_frame(e)
    out_dir = str(tmp_path / "verdicts")
    q = stream_decontaminate_to_parquet(
        spark, stream_in, eval_frame, out_dir, str(tmp_path / "ck"), max_files=1
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # genuinely multi-micro-batch

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(map(tuple, semantic_decontaminate(spark, SF).collect()))
    assert got == want
