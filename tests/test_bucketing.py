"""Bucketed co-located joins: the 100 TB join strategy the docstrings
reference (pre-partition both sides on the join key at WRITE time so the
join needs NO exchange at READ time), demonstrated and plan-pinned.

At 10^12 docs the doc-keyed joins this engine runs repeatedly —
extraction output back to metadata, dedup verdicts back to the corpus,
curation stage joins — each cost a full shuffle of both sides per run.
Bucketing pays that shuffle ONCE at ingest: both tables are written
`bucketBy(N, doc_id)`, every later join is a zip of co-located buckets.
"""

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_runs_without_exchange(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n_chars_b"))
    # at test scale the planner broadcasts the 500-row side (correctly) —
    # turn broadcast off so the plan shows the big-table regime the
    # bucketing strategy exists for (two 100 TB sides: nothing broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        prev_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df in (("bk_docs", docs), ("bk_stats", stats)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(8, "doc_id")
                .sortBy("doc_id")
                .mode("overwrite")
                .saveAsTable(name)
            )

        j = spark.table("bk_docs").join(spark.table("bk_stats"), "doc_id").select(
            "doc_id", "source", "n_chars_b"
        )
        plan = _plan(j)
        # co-located: a sort-merge join fed directly by bucketed scans —
        # ZERO exchanges anywhere in the plan
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan

        # and the join is correct
        n = j.count()
        assert n == docs.count()

        # contrast: the same join over plain parquet shuffles both sides
        plain = docs.join(stats.withColumnRenamed("n_chars_b", "x"), "doc_id")
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_docs")
        spark.sql("DROP TABLE IF EXISTS bk_stats")
