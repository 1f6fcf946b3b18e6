"""Multimodal plumbing: schemas, Arrow batch shapes, partition-local
execution, deterministic fake codecs, NotImplementedError gate for real
codecs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.multimodal import (
    FEATURE_DIM,
    _decode_bytes,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from postgres_opensearch_cdc_spark.registry import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_fake_decoder_deterministic_and_normalized():
    v1 = _decode_bytes(b"hello world", "image")
    v2 = _decode_bytes(b"hello world", "image")
    assert v1 == v2
    assert len(v1) == FEATURE_DIM
    assert abs(sum(v1) - 1.0) < 1e-3  # histogram normalizes to ~1


def test_real_codec_gate():
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"x", "image", real_codec=True)


def test_extract_features_schema_and_values(media, spark):
    out = extract_features(media)
    assert [f.name for f in out.schema.fields] == ["media_id", "kind", "n_bytes", "features"]
    row = out.filter(F.col("media_id") == 0).head()
    src = media.filter(F.col("media_id") == 0).head()
    assert row["n_bytes"] == len(src["content"])
    expected = _decode_bytes(bytes(src["content"]), src["kind"])
    assert [round(x, 6) for x in row["features"]] == expected


def test_features_join_back_without_binary(media):
    """The scale contract: after feature extraction the binary column is
    gone — downstream joins/aggs move only small vectors."""
    out = extract_features(media)
    assert "content" not in out.columns
    agg = out.groupBy("kind").agg(F.count(F.lit(1)).alias("cnt")).collect()
    assert sum(r["cnt"] for r in agg) == media.count()


def test_resize_images_only_images_with_target_size(media):
    out = resize_images(media, 8, 8)
    rows = out.collect()
    assert all(r["kind"] == "image" for r in rows)
    assert all(len(r["content"]) == 64 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 8 for r in rows)


def test_sample_frames_fanout(media):
    out = sample_frames(media, every_n_bytes=64, max_frames=4)
    rows = out.collect()
    assert len(rows) > 0
    per_media: dict = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert len(r["frame_bytes"]) <= 64
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices
