"""Multimodal plumbing: schema contract, Arrow batch shape,
determinism of the stubbed decode."""

import os

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return mm.attach_media(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark, media):
    a = {r["doc_id"]: r for r in mm.decode_image_features(media).collect()}
    b = {r["doc_id"]: r for r in mm.decode_image_features(media).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k] == b[k]
        assert a[k]["n_pixels"] == a[k]["width"] * a[k]["height"] * 3


def test_real_decode_is_gated(spark, media):
    with pytest.raises(Exception) as exc:
        mm.decode_image_features(media, use_real_decode=True).collect()
    assert "NotImplementedError" in str(exc.value) or "decode" in str(exc.value)


def test_frame_sample_shape(spark, media):
    frames = mm.frame_sample(media, n_frames=4)
    rows = frames.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) == 4 * n_videos
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        offs = [r["offset"] for r in sorted(doc_rows, key=lambda r: r["frame_idx"])]
        assert offs == sorted(offs)
