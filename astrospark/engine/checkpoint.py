"""Checkpointed, resumable extraction runs with per-bucket lineage + metrics.

North-rule contract: "checkpoints per-partition progress with lineage and
extraction-count metrics so runs resume mid-table". Realization:

- The input is hashed into ``n_buckets`` stable buckets
  (pmod(xxhash64(doc_id), n_buckets)) — the durable unit of progress,
  independent of Spark's physical partitioning.
- Buckets are processed in groups (``bucket_batch`` per Spark job). Output
  lands under ``output_dir`` partitioned by ``_bucket`` with DYNAMIC
  partition overwrite, so a crashed group's partial files are replaced
  wholesale when the group re-runs — no dup/lost rows.
- After each group commits, one checkpoint row per bucket is appended to
  ``<checkpoint_dir>/commits`` (parquet):
    (bucket int, input_fingerprint string, n_docs long, n_spans long,
     n_objects long, wall_ms long, completed_at timestamp)
  Group-total n_docs/n_spans/n_objects come from ``Observation`` metrics
  on the running job; the EXACT per-bucket split is then derived from the
  just-written output with one partition-pruned aggregate over the
  group's buckets (a second, cheap scan of only the fresh partitions —
  Observation cannot produce per-group keys).
- Resume = read the commit table, skip buckets already recorded for the
  same input fingerprint. Changing the fingerprint (new snapshot)
  invalidates prior progress for lineage-correct reruns.

At 10^12-doc scale each group is one scan restricted by the bucket
predicate; with the input laid out bucket-partitioned (Iceberg partition =
bucket(doc_id, N)) the predicate prunes at the manifest level and each
group reads only its slice.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from astrospark.engine.extraction import extract_spans

COMMIT_SCHEMA = (
    "bucket int, input_fingerprint string, n_docs long, n_spans long, "
    "n_objects long, wall_ms long, completed_at timestamp"
)


def local_input_fingerprint(path: str) -> str:
    """Cheap lineage id for a local input dir: name + file count + bytes."""
    total, n = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return f"{os.path.basename(path.rstrip('/'))}:{n}:{total}"


@dataclass
class GroupResult:
    buckets: list
    n_docs: int
    n_spans: int
    n_objects: int
    wall_ms: int


class CheckpointedExtraction:
    def __init__(
        self,
        spark: SparkSession,
        bcast,
        checkpoint_dir: str,
        n_buckets: int = 256,
        bucket_batch: int = 64,
    ):
        self.spark = spark
        self.bcast = bcast
        self.checkpoint_dir = checkpoint_dir
        self.commits_path = os.path.join(checkpoint_dir, "commits")
        self.n_buckets = n_buckets
        self.bucket_batch = bucket_batch

    # -- commit table -------------------------------------------------------

    def completed_buckets(self, fingerprint: str) -> set:
        try:
            rows = (
                self.spark.read.parquet(self.commits_path)
                .filter(F.col("input_fingerprint") == fingerprint)
                .select("bucket")
                .collect()
            )
        except Exception:  # noqa: BLE001 — first run: no commit table yet
            return set()
        return {r.bucket for r in rows}

    def _append_commits(
        self, result: GroupResult, fingerprint: str, per_bucket: dict | None = None
    ) -> None:
        """One commit row per bucket. ``per_bucket`` carries EXACT
        (n_docs, n_spans, n_objects) per bucket (from the written output);
        buckets with no rows get zeros — they are still committed, so
        resume skips them."""
        now = time.time()
        per_bucket = per_bucket or {}
        rows = [
            (
                int(b),
                fingerprint,
                *(per_bucket.get(int(b), (0, 0, 0))),
                result.wall_ms,
            )
            for b in result.buckets
        ]
        df = self.spark.createDataFrame(
            rows,
            "bucket int, input_fingerprint string, n_docs long, n_spans long, n_objects long, wall_ms long",
        ).withColumn("completed_at", F.lit(now).cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(self.commits_path)

    # -- run ----------------------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        output_dir: str,
        fingerprint: str,
        max_groups: int | None = None,
        **extract_kwargs,
    ) -> list[GroupResult]:
        """Process all pending buckets; returns per-group metrics.

        ``max_groups`` limits how many groups run (used by tests to
        simulate a mid-table crash; resume by calling run() again).
        """
        spark = self.spark
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        done = self.completed_buckets(fingerprint)
        pending = [b for b in range(self.n_buckets) if b not in done]
        results: list[GroupResult] = []
        bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int")

        for gi in range(0, len(pending), self.bucket_batch):
            if max_groups is not None and len(results) >= max_groups:
                break
            group = pending[gi : gi + self.bucket_batch]
            t0 = time.time()
            subset = docs.withColumn("_bucket", bucket_col).filter(
                F.col("_bucket").isin(group)
            )
            out = extract_spans(subset.drop("_bucket"), self.bcast, **extract_kwargs)
            obs = Observation(f"extract-group-{gi}")
            # DISTINCT aggregates are disallowed in observed metrics;
            # each emitting doc has exactly one seq=0 row, so docs = Σ(seq=0)
            out = out.observe(
                obs,
                F.sum((F.col("seq") == 0).cast("long")).alias("n_docs"),
                F.count(F.lit(1)).alias("n_spans"),
                F.sum((F.col("kind") == "object").cast("long")).alias("n_objects"),
            )
            out = out.withColumn(
                "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int")
            )
            out.write.mode("overwrite").partitionBy("_bucket").parquet(output_dir)
            metrics = obs.get
            result = GroupResult(
                buckets=group,
                n_docs=int(metrics["n_docs"] or 0),
                n_spans=int(metrics["n_spans"] or 0),
                n_objects=int(metrics["n_objects"] or 0),
                wall_ms=int((time.time() - t0) * 1000),
            )
            # exact per-bucket metrics from the just-written partitions
            # (partition-pruned scan of the group's buckets only)
            per_bucket = {
                int(r["_bucket"]): (int(r["nd"]), int(r["ns"]), int(r["no"]))
                for r in spark.read.parquet(output_dir)
                .filter(F.col("_bucket").isin(group))
                .groupBy("_bucket")
                .agg(
                    F.sum((F.col("seq") == 0).cast("long")).alias("nd"),
                    F.count(F.lit(1)).alias("ns"),
                    F.sum((F.col("kind") == "object").cast("long")).alias("no"),
                )
                .collect()
            }
            self._append_commits(result, fingerprint, per_bucket)
            results.append(result)
        return results

    def read_output(self, output_dir: str) -> DataFrame:
        return self.spark.read.parquet(output_dir).drop("_bucket")
