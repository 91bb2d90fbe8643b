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


def test_audio_chunks_contract(spark):
    from ci_log_processing_spark.operators.multimodal import (
        attach_media,
        audio_chunks,
    )
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a" * 100, "s"), (4, "xy", "s"), (7, "b" * 500, "s")],
        "doc_id long, text string, source string",
    )
    out = audio_chunks(attach_media(docs)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 bytes -> 4 chunks of 32/32/32/4
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_bytes"] for r in c1] == [32, 32, 32, 4]
    assert c1[0]["rms_proxy"] == float(ord("a"))
    assert c1[0]["chunk_hash"] == hashlib.md5(b"a" * 32).hexdigest()
    # doc 4: tiny payload -> exactly one chunk
    assert [r["n_bytes"] for r in by_doc[4]] == [2]
    # doc 7: 500 bytes capped at max_chunks=8
    assert len(by_doc[7]) == 8
