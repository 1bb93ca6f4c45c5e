"""End-to-end corpus curation: the composed training-data selection
pipeline a 100 TB pretraining run actually executes, as ONE Spark plan.

A document survives iff it passes every stage:

1. ``sample_stratified`` — deterministic per-language keep rate
   (corpus mixing; hash-uniform, zero-shuffle).
2. ``repetition_filters`` — Gopher repetition rules (rep_flagged = 0).
3. ``decontaminate_ngram`` — no word-5-gram overlap with the eval split
   (contaminated = 0; eval docs themselves are excluded by this stage).
4. ``dedup_keep_best`` — longest member of its near-dup cluster
   (keep_best = 1).

Every stage joins back on doc_id as a LEFT SEMI join — no row
multiplication, no columns carried that the selection doesn't need, and
at scale all four probes co-partition on doc_id (bucketing makes the
four semi joins exchange-free on the probe side). Stage order in the
plan is cost-irrelevant: Catalyst fuses the semi joins over one
documents scan.

The DuckDB oracle composes the same four stage queries as derived
tables, so the final kept set is value-checked end-to-end — a
regression anywhere in the four stages (or in how they compose) fails
this one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astrospark.ops.dedup import MAX_BUCKET_DEFAULT, dedup_keep_best
from astrospark.ops.text import (
    decontaminate_ngram,
    repetition_filters,
    sample_stratified,
)


def corpus_curation(
    spark: SparkSession,
    sf_dir: str,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Run the four-stage selection; returns the kept documents
    (doc_id, lang, n_chars). ``max_bucket`` passes through to the dedup
    stage — BOUNDED by default (the production/scale setting, like every
    dedup entry point); the driver contract pins ``max_bucket=None`` for
    exhaustive oracle semantics, contract-only.

    ``clusters`` lets a pipeline pass a precomputed dedup cluster-label
    table into the keep-best stage (VERDICT r4 #4); when omitted, the
    stage hits dedup_cc_clusters' per-session memo, so curation after
    any same-parameter dedup op in the same cache scope re-reads the
    already-materialized labels instead of re-running the propagation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    sampled = sample_stratified(spark, sf_dir).select("doc_id")
    clean = repetition_filters(spark, sf_dir).filter(
        F.col("rep_flagged") == 0
    ).select("doc_id")
    uncontaminated = decontaminate_ngram(spark, sf_dir).filter(
        F.col("contaminated") == 0
    ).select("doc_id")
    canonical = dedup_keep_best(
        spark, sf_dir, max_bucket=max_bucket, clusters=clusters
    ).filter(F.col("keep_best") == 1).select("doc_id")
    out = docs
    for stage in (sampled, clean, uncontaminated, canonical):
        out = out.join(stage, "doc_id", "left_semi")
    return out
