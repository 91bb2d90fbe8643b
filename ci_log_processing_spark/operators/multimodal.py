"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked below); everything around it —
binary column handling, schema contracts, Arrow batch shapes,
partition-parallel execution — is real and tested. Swapping
`_fake_decode` for PIL/libav turns this into the production
operator without touching the plan.

Reference analog: the subunit binary-stream parser
(`subunit_iter`, logsender.py:431-464) — the one place the
reference parses a binary payload into typed records.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<source: string, declared_len: long>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "n_pixels long, payload_len long, phash string"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, offset long, frame_hash string"


def attach_media(docs: DataFrame) -> DataFrame:
    """Model documents as media rows: payload = the raw bytes
    (here: utf-8 of text), kind cycled deterministically."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length("text").cast("long").alias("declared_len"),
        ).alias("meta"),
    )


USE_REAL_DECODE = False  # no codec libs in this container


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB: deterministic stand-in for image decoding.

    Real implementation would be e.g. PIL.Image.open(BytesIO(b)).
    Dimensions are a pure function of the payload so results are
    reproducible and oracle-checkable.
    """
    n = len(payload)
    width = 64 + n % 577
    height = 64 + (n * 31) % 353
    return width, height, 3


def decode_image_features(
    media: DataFrame, use_real_decode: bool | None = None
) -> DataFrame:
    """mapInPandas image feature extraction.

    Arrow batches in, Arrow batches out; runs once per input
    partition — at scale, partition by a size-balanced key first so
    decode work (the expensive step in production) is even.
    """
    real = USE_REAL_DECODE if use_real_decode is None else use_real_decode

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real image decode requires PIL/turbojpeg, absent here"
            )
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )
            out["n_pixels"] = (
                out["width"].astype("int64")
                * out["height"].astype("int64")
                * out["channels"].astype("int64")
            )
            out["payload_len"] = payloads.map(len).astype("int64")
            out["phash"] = [
                hashlib.md5(bytes(p)).hexdigest() for p in payloads
            ]
            yield out

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling for video payloads: n_frames
    evenly spaced byte offsets; frame_hash = md5 of an 8-byte window
    (STUB for a real keyframe extractor)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(b) - 1, 0))
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["offset"].append(off)
                    rows["frame_hash"].append(
                        hashlib.md5(b[off : off + 8]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    videos = media.filter(F.col("kind") == "video")
    return videos.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, start_byte long, n_bytes long, "
    "rms_proxy double, chunk_hash string"
)


def audio_chunks(
    media: DataFrame, chunk_bytes: int = 32, max_chunks: int = 8
) -> DataFrame:
    """Fixed-size chunking + per-chunk features for audio payloads —
    the audio analog of frame_sample (real pipeline: resample +
    window + spectral features via libav/librosa, absent here).

    The DECODE is a deterministic fake (rms_proxy = mean byte value
    of the chunk — a pure function of the payload, so results are
    reproducible and oracle-checkable); the Spark-side contract —
    binary column in, Arrow batches through mapInPandas, bounded
    chunk fan-out per row — is the production shape.
    """

    def chunk(batches):
        import hashlib

        for pdf in batches:
            rows = {
                "doc_id": [], "chunk_idx": [], "start_byte": [],
                "n_bytes": [], "rms_proxy": [], "chunk_hash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = min(max_chunks, max((len(b) + chunk_bytes - 1) // chunk_bytes, 1))
                for i in range(n):
                    seg = b[i * chunk_bytes:(i + 1) * chunk_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(i)
                    rows["start_byte"].append(i * chunk_bytes)
                    rows["n_bytes"].append(len(seg))
                    rows["rms_proxy"].append(
                        round(sum(seg) / len(seg), 6) if seg else 0.0
                    )
                    rows["chunk_hash"].append(hashlib.md5(seg).hexdigest())
            yield pd.DataFrame(rows)

    audio = media.filter(F.col("kind") == "audio")
    return audio.mapInPandas(chunk, AUDIO_CHUNK_SCHEMA)
