"""Checkpoint/resume: crash mid-table, resume, verify no dup/lost spans
(SURVEY.md §5 item 5)."""

import pytest

from astrospark.engine.checkpoint import CheckpointedExtraction, local_input_fingerprint
from astrospark.engine.extraction import broadcast_artifacts, extract_spans
from astrospark.fixtures import docs_dataframe


@pytest.fixture(scope="module")
def bcast(spark, artifacts):
    return broadcast_artifacts(spark, artifacts)


def test_resume_no_dup_no_loss(spark, bcast, tmp_path):
    docs = docs_dataframe(spark, 60, seed=9, skew_every=0, n_partitions=4)
    ck = CheckpointedExtraction(
        spark, bcast, str(tmp_path / "ckpt"), n_buckets=8, bucket_batch=3
    )
    out_dir = str(tmp_path / "out")
    fp = "test-snapshot-1"

    # simulate a crash: only the first group (3 of 8 buckets) completes
    r1 = ck.run(docs, out_dir, fp, max_groups=1)
    assert len(r1) == 1
    assert len(ck.completed_buckets(fp)) == 3
    partial = ck.read_output(out_dir).count()
    assert partial > 0

    # resume: remaining buckets complete, nothing reruns
    r2 = ck.run(docs, out_dir, fp)
    assert len(ck.completed_buckets(fp)) == 8
    done_total = sorted(b for g in (r1 + r2) for b in g.buckets)
    assert done_total == list(range(8))

    got = sorted(map(tuple, ck.read_output(out_dir).collect()))
    exp = sorted(map(tuple, extract_spans(docs, bcast).collect()))
    assert got == exp  # no dups, no losses vs the one-shot run

    # idempotent: a third run does nothing
    assert ck.run(docs, out_dir, fp) == []


def test_fingerprint_invalidates(spark, bcast, tmp_path):
    docs = docs_dataframe(spark, 10, seed=4, skew_every=0)
    ck = CheckpointedExtraction(
        spark, bcast, str(tmp_path / "ck2"), n_buckets=4, bucket_batch=4
    )
    out_dir = str(tmp_path / "o2")
    ck.run(docs, out_dir, "snap-A")
    assert len(ck.completed_buckets("snap-A")) == 4
    # a new snapshot id sees no completed work
    assert ck.completed_buckets("snap-B") == set()


def test_metrics_recorded(spark, bcast, tmp_path):
    docs = docs_dataframe(spark, 20, seed=5, skew_every=0)
    ck = CheckpointedExtraction(
        spark, bcast, str(tmp_path / "ck3"), n_buckets=2, bucket_batch=2
    )
    results = ck.run(docs, str(tmp_path / "o3"), "snap")
    assert len(results) == 1
    r = results[0]
    assert r.n_docs > 0 and r.n_spans > 0 and r.wall_ms >= 0
    commits = spark.read.parquet(str(tmp_path / "ck3" / "commits"))
    assert commits.count() == 2
    cols = set(commits.columns)
    assert {"bucket", "input_fingerprint", "n_docs", "n_spans", "n_objects",
            "wall_ms", "completed_at"} <= cols


def test_local_fingerprint(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x" * 10)
    fp1 = local_input_fingerprint(str(d))
    (d / "b.parquet").write_bytes(b"y" * 5)
    fp2 = local_input_fingerprint(str(d))
    assert fp1 != fp2
