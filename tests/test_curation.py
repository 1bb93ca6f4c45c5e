"""Composite corpus-curation pipeline: the kept set must equal the
intersection of the four stage predicates, each stage must actually
remove documents on the test corpus (no stage silently degenerate),
and the plan must stay semi-join shaped."""

import io
from contextlib import redirect_stdout

SF_DIR = "/root/testdata/sf0.001"


def test_curation_is_stage_intersection(spark):
    from astrospark.ops.curation import corpus_curation
    from astrospark.ops.dedup import dedup_keep_best
    from astrospark.ops.text import (
        decontaminate_ngram,
        repetition_filters,
        sample_stratified,
    )

    # max_bucket=None on BOTH sides so the intersection identity holds
    # regardless of whether the bounded default drops any bucket
    kept = {r.doc_id for r in corpus_curation(spark, SF_DIR, max_bucket=None).collect()}
    sampled = {r.doc_id for r in sample_stratified(spark, SF_DIR).collect()}
    clean = {
        r.doc_id
        for r in repetition_filters(spark, SF_DIR).collect()
        if r.rep_flagged == 0
    }
    uncontam = {
        r.doc_id
        for r in decontaminate_ngram(spark, SF_DIR).collect()
        if r.contaminated == 0
    }
    canonical = {
        r.doc_id
        for r in dedup_keep_best(spark, SF_DIR, max_bucket=None).collect()
        if r.keep_best == 1
    }
    assert kept == sampled & clean & uncontam & canonical
    # every stage removes something on this corpus — a stage whose
    # predicate went degenerate would silently stop filtering
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for stage in (sampled, clean, uncontam, canonical):
        assert 0 < len(stage) < n_docs
    assert 0 < len(kept) < min(map(len, (sampled, clean, uncontam, canonical)))


def test_curation_plan_semi_joins_only(spark):
    from astrospark.ops.curation import corpus_curation

    buf = io.StringIO()
    with redirect_stdout(buf):
        corpus_curation(spark, SF_DIR).explain(mode="formatted")
    plan = buf.getvalue()
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
