"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct, processed by ``mapInPandas`` stages whose Spark-side plumbing —
schema, batch shape, partitioning — is real and tested here.  The actual
codec work (JPEG decode, resampling, frame extraction) requires libraries
this container does not ship (PIL/cv2/ffmpeg), so the decode kernel is a
clearly-marked STUB: by default it raises ``NotImplementedError``; with
``fake=True`` it produces a deterministic fake (byte-stat features) so the
distributed plumbing can be exercised end-to-end.

The reference's analogue is the thumbnail sink
(``/root/reference/app/thumbnail_generator.py:82-153``) and image decode
(``app/document_processor.py:99-176``) — same shape: bytes in, decoded
features/resized bytes out, one row per item.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_digest", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
])


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in features: normalized byte histogram moments."""
    if not payload:
        return [0.0] * n
    digest = hashlib.blake2b(payload, digest_size=n).digest()
    return [b / 255.0 for b in digest]


def decode_media_batches(fake: bool):
    """Build the mapInPandas kernel for media decode / feature extraction.

    ``fake=False`` raises NotImplementedError per batch — the honest
    "codec libraries not present" stub.  ``fake=True`` emits
    deterministic byte-derived features with the real schema and batch
    shape, so partitioning/skew behavior is testable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/cv2/ffmpeg, not present in "
                    "this container; pass fake=True for plumbing tests")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "content_digest": [
                    hashlib.blake2b(p or b"", digest_size=16).hexdigest()
                    for p in pdf["payload"]],
                "features": [_fake_features(p or b"")
                             for p in pdf["payload"]],
            })

    return kernel


def extract_media_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """MEDIA_SCHEMA DataFrame → FEATURE_SCHEMA DataFrame.

    Same skew discipline as the text path: callers should size-route
    giant payloads (operators/skew.py) before this map stage.
    """
    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(decode_media_batches(fake),
                                        schema=FEATURE_SCHEMA)
