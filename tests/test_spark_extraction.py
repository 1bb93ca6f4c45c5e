"""End-to-end Spark pipeline vs oracle (span-sequence equality on the
cluster path, incl. the skew split + window re-rank branch)."""

import pytest

from astrospark.engine.extraction import broadcast_artifacts, extract_spans
from astrospark.fixtures import docs_dataframe, make_docs
from astrospark.oracle import process_document


@pytest.fixture(scope="module")
def bcast(spark, artifacts):
    return broadcast_artifacts(spark, artifacts)


def test_spark_matches_oracle(spark, artifacts, bcast):
    n = 80
    docs = docs_dataframe(spark, n, seed=21, skew_every=40, n_partitions=4)
    # low split threshold forces the skew/window branch to actually run
    out = extract_spans(docs, bcast, split_threshold=20_000).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.seq, r.kind, r.text, r.media_ref, r.offset))
    vocab, trie, model = artifacts
    for d in make_docs(n, seed=21, skew_every=40):
        exp = [
            (r["seq"], r["kind"], r["text"], r["media_ref"], r["offset"])
            for r in process_document(d["spans"], vocab, trie, model)
        ]
        assert sorted(got.get(d["doc_id"], [])) == sorted(exp), d["doc_id"]


def test_output_schema(spark, bcast):
    docs = docs_dataframe(spark, 5, seed=1, skew_every=0)
    out = extract_spans(docs, bcast)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "seq", "kind", "text", "media_ref", "offset",
    ]


def test_determinism_across_parallelism(spark, artifacts, bcast):
    """Same input at different partition counts → identical spans (the
    no-nondeterminism leg of the scaling rule)."""
    a = extract_spans(docs_dataframe(spark, 30, seed=33, skew_every=0, n_partitions=2), bcast)
    b = extract_spans(docs_dataframe(spark, 30, seed=33, skew_every=0, n_partitions=7), bcast)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
