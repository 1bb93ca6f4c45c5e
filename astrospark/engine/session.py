"""SparkSession factory with the engine's scale-oriented defaults.

Mirrors of the reference's singleton init (model/lexicon loaded once per
JVM, /root/reference/src/main/java/org/grobid/core/engines/AstroParser.java:67-81)
live on the Spark side as: AQE on (skewed Arrow batches from giant docs),
arrow execution on, capped records-per-batch (bounds UDF memory on skew
docs), and shuffle partitions sized to cores — not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# kernel sweet spot: unique-token amortization grows with batch size until
# ~8k docs, where the factorized tables fall out of cache (measured
# 1024..16384). Single source of truth — scripts/submit_extract.py imports
# this so the spark-submit path cannot drift from the session factory.
ARROW_BATCH_ROWS = 4096


def build_session(
    app_name: str = "astrospark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = ARROW_BATCH_ROWS,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("ASTROSPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
