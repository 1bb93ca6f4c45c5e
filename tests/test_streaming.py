"""Streaming extraction: file-source stream drains to parquet and matches
the batch pipeline span-for-span."""

import pytest

from astrospark.engine.extraction import broadcast_artifacts, extract_spans
from astrospark.fixtures import docs_dataframe
from astrospark.streaming.extract_stream import (
    run_to_parquet,
    stream_dedup_exact,
    stream_docs_from_dir,
    stream_extract,
    windowed_extraction_metrics,
)


@pytest.fixture(scope="module")
def bcast(spark, artifacts):
    return broadcast_artifacts(spark, artifacts)


def test_stream_matches_batch(spark, bcast, tmp_path):
    in_dir = str(tmp_path / "in")
    docs = docs_dataframe(spark, 40, seed=55, skew_every=0, n_partitions=3)
    docs.write.parquet(in_dir)

    stream = stream_docs_from_dir(spark, in_dir, max_files=2)
    assert stream.isStreaming
    spans = stream_extract(stream, bcast)
    q = run_to_parquet(spans, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(str(tmp_path / "out")).collect()))
    exp = sorted(map(tuple, extract_spans(docs, bcast).collect()))
    assert got == exp


def test_windowed_metrics_plan(spark, bcast, tmp_path):
    in_dir = str(tmp_path / "in2")
    docs_dataframe(spark, 10, seed=56, skew_every=0).write.parquet(in_dir)
    stream = stream_docs_from_dir(spark, in_dir)
    metrics = windowed_extraction_metrics(stream_extract(stream, bcast))
    q = (
        metrics.writeStream.format("memory")
        .queryName("m_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    # append-mode windowed agg holds rows back until the watermark passes;
    # the assertion is that the stateful plan RUNS on the stream (rows may
    # legitimately be zero in a single availableNow drain)
    assert spark.table("m_counts").columns == ["window_start", "kind", "n_spans"]


def test_stream_dedup_exact(spark, tmp_path):
    in_dir = str(tmp_path / "in3")
    docs = docs_dataframe(spark, 12, seed=57, skew_every=0, n_partitions=1)
    # duplicate the corpus: same content under different doc_ids
    import pyspark.sql.functions as F

    dup = docs.withColumn("doc_id", F.concat(F.lit("copy-"), "doc_id"))
    docs.unionByName(dup).write.parquet(in_dir)

    deduped = stream_dedup_exact(stream_docs_from_dir(spark, in_dir))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_out")
    # every content seen exactly once; 12 distinct contents in, 24 docs
    assert out.count() == 12
    assert out.select("content_md5").distinct().count() == 12
