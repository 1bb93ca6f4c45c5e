"""Multimodal plumbing: schema, Arrow batch shapes, deterministic fake
decode, and the media<->spans join."""

import pytest

from pyspark.sql import functions as F

from astrospark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, n=30, seed=13).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_ref", "media_type", "content", "meta"]
    assert media.count() == 30


def test_decode_deterministic(media):
    a = {r.media_ref: (r.width, r.height, r.n_frames, round(r.mean_luma, 9))
         for r in mm.decode_media(media).collect()}
    b = {r.media_ref: (r.width, r.height, r.n_frames, round(r.mean_luma, 9))
         for r in mm.decode_media(media).collect()}
    assert a == b
    # decoded dims equal the meta the fixture encoded
    for r in media.select("media_ref", "meta").collect():
        assert a[r.media_ref][0] == r.meta.width
        assert a[r.media_ref][1] == r.meta.height


def test_decode_raises_for_unknown_payload(spark):
    junk = spark.createDataFrame(
        [("x://1", "video", bytearray(b"NOTAFIXTURE"), (1, 1, 1, "c"))], mm.MEDIA_SCHEMA_DDL
    )
    with pytest.raises(Exception, match="(NotImplementedError|no decoder)"):
        mm.decode_media(junk).collect()


def test_features_shape_and_determinism(media):
    feats = mm.media_features(media).collect()
    assert len(feats) == 30
    assert all(len(r.feature) == mm.FEATURE_DIM for r in feats)
    again = mm.media_features(media).collect()
    assert {r.media_ref: tuple(r.feature) for r in feats} == {
        r.media_ref: tuple(r.feature) for r in again
    }


def test_resize_plan_bounds(media):
    plan = mm.resize_plan(media, max_side=224)
    for r in plan.collect():
        assert max(r.target_w, r.target_h) <= 224
        assert min(r.target_w, r.target_h) >= 1


def test_frame_sample_plan(media):
    s = mm.frame_sample_plan(media, every_ms=1000)
    rows = s.groupBy("media_ref").count().collect()
    assert all(r["count"] >= 1 for r in rows)
    assert s.filter(F.col("sample_ms") < 0).count() == 0


def test_docs_media_join(spark, media, artifacts):
    from astrospark.engine.extraction import broadcast_artifacts, extract_spans
    from astrospark.fixtures import docs_dataframe

    bcast = broadcast_artifacts(spark, artifacts)
    spans = extract_spans(docs_dataframe(spark, 30, seed=13, skew_every=0), bcast)
    feats = mm.media_features(media)
    joined = mm.docs_media_join(spans, feats)
    out = joined.collect()
    media_rows = [r for r in spans.collect() if r.media_ref]
    assert len(out) == len(media_rows)
