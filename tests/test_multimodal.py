import pytest

from robokop_build_spark.operators.extract import explode_spans
from robokop_build_spark.operators.multimodal import (
    attach_media_payloads,
    decode_media,
    extract_media_features,
    FEATURE_DIM,
)
from robokop_build_spark.sources.readers import read_fixture


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image/png")


def test_media_plumbing_end_to_end(spark, fixture_dir):
    spans = explode_spans(read_fixture(spark, fixture_dir, "documents"))
    media = attach_media_payloads(spans)
    rows = media.limit(5).collect()
    assert rows, "fixtures must contain media spans"
    for r in rows:
        assert r["media_type"] in ("image/png", "application/table")
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 16
        assert r["width"] >= 16 and r["height"] >= 16
    feats = extract_media_features(media.limit(50), fake=True).collect()
    assert len(feats) == min(50, media.count())
    for f in feats:
        assert len(f["feature"]) == FEATURE_DIM
        assert abs(sum(x * x for x in f["feature"]) - 1.0) < 1e-3


def test_media_features_deterministic(spark, fixture_dir):
    spans = explode_spans(read_fixture(spark, fixture_dir, "documents"))
    media = attach_media_payloads(spans).limit(20)
    a = {
        (r["doc_id"], r["span_pos"]): tuple(r["feature"])
        for r in extract_media_features(media, fake=True).collect()
    }
    b = {
        (r["doc_id"], r["span_pos"]): tuple(r["feature"])
        for r in extract_media_features(media.repartition(4), fake=True).collect()
    }
    assert a == b
