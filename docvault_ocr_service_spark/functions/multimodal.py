"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct, processed by ``mapInPandas`` stages.  The image path is REAL:
PNG payloads decode through the pure-Python codec in
``extract/images.py`` (zlib inflate + scanline unfiltering) and emit the
reference's quality metrics (brightness/contrast/sharpness —
``/root/reference/app/ocr_service.py:100-133``); GIFs decode through a
pure-Python LZW decoder (multi-frame aware); uncompressed TIFFs decode
from strips, compressed ones keep IFD frame counts
(``app/document_processor.py:130-153``); baseline JPEGs decode through
the pure-Python codec in ``extract/jpeg.py`` (Huffman + IDCT + chroma
upsampling).  Progressive JPEG and audio/video (ffmpeg) remain outside
the envelope — those rows come back with ``decode_status`` explaining
why, never a task failure.  ``fake=True`` keeps the deterministic byte-stat
path for plumbing tests.

The reference's analogue is the thumbnail sink
(``app/thumbnail_generator.py:82-153``) and image decode
(``app/document_processor.py:99-176``) — same shape: bytes in, decoded
features out, one row per item.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..extract.images import (
    ImageDecodeError,
    UnsupportedImageError,
    analyze_image_quality,
    count_gif_frames,
    count_tiff_frames,
    decode_gif,
    decode_png,
    decode_tiff,
    determine_psm,
    select_enhance_level,
    sniff_image_format,
)


def _image_stats(img) -> dict:
    """Pixel stats + the reference's adaptive-preprocessing decisions
    (quality flags, auto enhance level, auto PSM — value-identical logic,
    app/ocr_service.py:100-166 and :282-297)."""
    q = analyze_image_quality(img)
    return {
        "width": q["width"], "height": q["height"],
        "brightness": q["brightness"], "contrast": q["contrast"],
        "sharpness": q["sharpness"],
        "needs_enhancement": q["needs_enhancement"],
        "enhance_level": select_enhance_level(q),
        "psm": determine_psm(q["width"], q["height"]),
    }

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
    T.StructField("format", T.StringType(), True),
    T.StructField("decode_status", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("brightness", T.DoubleType(), True),
    T.StructField("contrast", T.DoubleType(), True),
    T.StructField("sharpness", T.DoubleType(), True),
    T.StructField("needs_enhancement", T.BooleanType(), True),
    T.StructField("enhance_level", T.StringType(), True),
    T.StructField("psm", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
])

_FEATURE_COLUMNS = [f.name for f in FEATURE_SCHEMA.fields]


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in features: normalized byte digest moments."""
    if not payload:
        return [0.0] * n
    digest = hashlib.blake2b(payload, digest_size=n).digest()
    return [b / 255.0 for b in digest]


def _base_row(media_id: str, kind: str, payload: bytes | None) -> dict:
    return {
        "media_id": media_id,
        "kind": kind,
        "n_bytes": len(payload) if payload is not None else 0,
        "content_digest": hashlib.blake2b(
            payload or b"", digest_size=16).hexdigest(),
        "format": None, "decode_status": None,
        "width": None, "height": None, "n_frames": None,
        "brightness": None, "contrast": None, "sharpness": None,
        "needs_enhancement": None, "enhance_level": None, "psm": None,
        "features": None,
    }


def _decode_row(media_id: str, kind: str, payload: bytes | None) -> dict:
    """The real per-item decode: PNG → pixel stats, TIFF → frame count,
    everything else honestly labeled undecodable."""
    row = _base_row(media_id, kind, payload)
    if not payload:
        row["decode_status"] = "empty_payload"
        return row
    if kind == "audio":
        return _decode_audio_row(row, payload)
    if kind == "video":
        return _decode_video_row(row, payload)
    if kind != "image":
        row["decode_status"] = f"unsupported_kind:{kind}"
        return row
    fmt = sniff_image_format(payload[:16])
    row["format"] = fmt
    if fmt is None:
        row["decode_status"] = "unknown_format"
        return row
    try:
        if fmt == "png":
            img = decode_png(payload)
            stats = _image_stats(img)
            row.update(stats | {
                "n_frames": 1,
                "decode_status": "ok",
                "features": [stats["brightness"], stats["contrast"],
                             stats["sharpness"]],
            })
        elif fmt == "tiff":
            row["n_frames"] = count_tiff_frames(payload)
            try:
                stats = _image_stats(decode_tiff(payload))
                row.update(stats | {
                    "decode_status": "ok",
                    "features": [stats["brightness"], stats["contrast"],
                                 stats["sharpness"]],
                })
            except ImageDecodeError:
                # outside the TIFF codec envelope (old-style JPEG 6,
                # CCITT fax, odd layouts) — honest metadata-only row
                row["decode_status"] = "metadata_only:tiff_compression"
        elif fmt == "gif":
            row["n_frames"] = count_gif_frames(payload)
            stats = _image_stats(decode_gif(payload))
            row.update(stats | {
                "decode_status": "ok",
                "features": [stats["brightness"], stats["contrast"],
                             stats["sharpness"]],
            })
        elif fmt == "jpeg":
            from ..extract.jpeg import decode_jpeg

            stats = _image_stats(decode_jpeg(payload))
            row.update(stats | {
                "n_frames": 1,
                "decode_status": "ok",
                "features": [stats["brightness"], stats["contrast"],
                             stats["sharpness"]],
            })
        elif fmt == "webp":
            from ..extract.webp import decode_webp, parse_webp_meta

            try:
                stats = _image_stats(decode_webp(payload))
                row.update(stats | {
                    "n_frames": 1,
                    "decode_status": "ok",
                    "features": [stats["brightness"], stats["contrast"],
                                 stats["sharpness"]],
                })
            except UnsupportedImageError:
                # outside the VP8L pixel-decode envelope (lossy VP8,
                # extended VP8X, transforms) — real header dims as a
                # metadata-only row, the compressed-TIFF/audio precedent
                meta = parse_webp_meta(payload)
                row.update({
                    "width": meta["width"], "height": meta["height"],
                    "n_frames": 1,
                    "decode_status":
                        f"metadata_only:webp_{meta['variant']}",
                })
        else:  # unreachable: all sniffed formats handled above
            row["decode_status"] = f"no_codec:{fmt}"
    except UnsupportedImageError as e:
        row["decode_status"] = f"unsupported:{e}"
    except ImageDecodeError as e:
        row["decode_status"] = f"corrupted:{e}"
    except Exception as e:  # noqa: BLE001 — poison payload ≠ dead task
        row["decode_status"] = f"unexpected:{type(e).__name__}"
    return row


def _decode_video_row(row: dict, payload: bytes) -> dict:
    """MP4/MOV container metadata as ``metadata_only:mp4`` rows (frame
    decode needs ffmpeg — the MP3/FLAC/Ogg precedent).  Field mapping:
    width/height = largest track's display size,
    features=[duration_ms, timescale, n_tracks]."""
    from ..extract.video import (
        VideoFormatError, parse_mp4, sniff_video_format)

    fmt = sniff_video_format(payload[:16])
    row["format"] = fmt
    if fmt is None:
        row["decode_status"] = "unknown_format"
        return row
    try:
        meta = parse_mp4(payload)
        row.update({
            "decode_status": "metadata_only:mp4",
            "width": meta["width"] or None,
            "height": meta["height"] or None,
            "n_frames": meta["n_tracks"],
            "features": [float(meta["duration_ms"]),
                         float(meta["timescale"]),
                         float(meta["n_tracks"])],
        })
    except VideoFormatError as e:
        row["decode_status"] = f"corrupted:{e}"
    return row


def _decode_audio_row(row: dict, payload: bytes) -> dict:
    """WAV/PCM: real duration + amplitude stats; MP3 (frame walk),
    FLAC (STREAMINFO) and Ogg-Vorbis (ident header + last-page granule)
    give duration/rate/channel metadata as ``metadata_only`` rows like
    compressed TIFF — PCM decode for those needs ffmpeg
    (extract/audio.py).
    Field mapping: n_frames=samples (WAV) or frames (MP3),
    brightness=mean |amplitude|, contrast=RMS amplitude,
    features=[duration_ms, sample_rate, channels]."""
    from ..extract.audio import AudioDecodeError, parse_mp3, parse_wav, \
        sniff_audio_format

    fmt = sniff_audio_format(payload[:12])
    row["format"] = fmt
    if fmt is None:
        row["decode_status"] = "unknown_format"
        return row
    if fmt in ("mp3", "flac", "ogg"):
        from ..extract.audio import parse_flac, parse_ogg_vorbis

        parser = {"mp3": parse_mp3, "flac": parse_flac,
                  "ogg": parse_ogg_vorbis}[fmt]
        try:
            meta = parser(payload)
            row.update({
                "decode_status": f"metadata_only:{fmt}",
                "n_frames": min(meta.get("n_frames",
                                         meta.get("n_samples", 0)),
                                2**31 - 1),
                "features": [float(meta["duration_ms"]),
                             float(meta["sample_rate"]),
                             float(meta["channels"])],
            })
        except AudioDecodeError as e:
            row["decode_status"] = f"corrupted:{e}"
        return row
    if fmt != "wav":
        row["decode_status"] = f"no_codec:{fmt}"
        return row
    try:
        meta = parse_wav(payload)
        row.update({
            "decode_status": "ok",
            "n_frames": min(meta["n_samples"], 2**31 - 1),
            "brightness": meta["mean_amplitude"],
            "contrast": meta["rms_amplitude"],
            "features": [float(meta["duration_ms"]),
                         float(meta["sample_rate"]),
                         float(meta["channels"])],
        })
    except UnsupportedImageError as e:
        row["decode_status"] = f"unsupported:{e}"
    except AudioDecodeError as e:
        row["decode_status"] = f"corrupted:{e}"
    return row


def decode_media_batches(fake: bool):
    """Build the mapInPandas kernel for media decode / feature extraction.

    ``fake=True`` emits deterministic byte-derived features with the real
    schema and batch shape (plumbing tests); ``fake=False`` runs the real
    PNG/TIFF decode path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                if fake:
                    row = _base_row(media_id, kind, payload)
                    row["decode_status"] = "fake"
                    row["features"] = _fake_features(payload or b"")
                else:
                    row = _decode_row(media_id, kind, payload)
                rows.append(row)
            yield pd.DataFrame(rows, columns=_FEATURE_COLUMNS)

    return kernel


THUMBNAIL_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("status", T.StringType(), True),
    T.StructField("original_width", T.IntegerType(), True),
    T.StructField("original_height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("thumb", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])

# app/thumbnail_generator.py:48-53 — quality label → JPEG quality value
_QUALITY_MAP = {"high": 95, "medium": 85, "low": 70}


def _flatten_on_white(img):
    """Alpha-composite LA/RGBA pixels over a white background — the
    reference's JPEG transparency handling (app/thumbnail_generator.py:
    39-45: paste-with-mask onto a white RGB canvas)."""
    a = img[..., -1:].astype(np.float64) / 255.0
    rgb = img[..., :-1].astype(np.float64)
    out = np.rint(rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)
    return out[..., 0] if out.shape[2] == 1 else out


def generate_thumbnails(df: DataFrame, max_size: int = 128,
                        output_format: str = "png",
                        quality: str = "medium") -> DataFrame:
    """The thumbnail sink (app/thumbnail_generator.py:82-188) as a map
    stage: decode (PNG/TIFF/GIF/JPEG) → aspect-preserving
    ``thumbnail_size`` (value-identical to the reference's formula) →
    box downsample → encoded bytes out.

    ``output_format`` mirrors the reference parameter ('PNG'/'JPEG'/
    'WEBP', app/thumbnail_generator.py:82-113): all three encode with
    the real codecs ('webp' is lossless VP8L, extract/webp.py);
    anything else falls back to 'jpeg' exactly like the
    reference's invalid-format fallback.  ``quality`` is the
    reference's high/medium/low ladder (95/85/70, invalid → medium),
    honored by the JPEG encoder and ignored by the lossless PNG/WEBP
    paths as in the reference's PNG branch.
    For JPEG, alpha flattens onto a white background
    (reference to_bytes); the PNG path keeps the round-2-pinned
    alpha-drop behavior.  Undecodable payloads come back with an honest
    status, never a task failure."""
    from ..extract.images import (
        decode_tiff,
        encode_png,
        resize_box,
        thumbnail_size,
    )
    from ..extract.jpeg import encode_jpeg
    from ..extract.webp import encode_webp_lossless

    output_format = output_format.lower()
    if output_format not in ("png", "jpeg", "webp"):
        output_format = "jpeg"      # reference invalid-format fallback
    q_value = _QUALITY_MAP.get(quality, _QUALITY_MAP["medium"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in THUMBNAIL_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {c: None for c in cols}
                row["media_id"] = media_id
                try:
                    fmt = sniff_image_format((payload or b"")[:16])
                    if fmt == "png":
                        img = decode_png(payload)
                    elif fmt == "tiff":
                        img = decode_tiff(payload)
                    elif fmt == "gif":
                        img = decode_gif(payload)
                    elif fmt == "jpeg":
                        from ..extract.jpeg import decode_jpeg

                        img = decode_jpeg(payload)
                    elif fmt == "webp":
                        from ..extract.webp import decode_webp

                        img = decode_webp(payload)
                    else:
                        row["status"] = f"no_codec:{fmt}"
                        rows.append(row)
                        continue
                    if img.ndim == 3 and img.shape[2] in (2, 4):
                        if output_format == "jpeg":
                            img = _flatten_on_white(img)
                        elif img.shape[2] == 4:
                            img = img[..., :3]
                        else:
                            img = img[..., 0]
                    oh, ow = img.shape[:2]
                    tw, th = thumbnail_size(ow, oh, max_size)
                    thumb = (img if (tw, th) == (ow, oh)
                             else resize_box(img, tw, th))
                    if output_format == "jpeg":
                        data = encode_jpeg(thumb, quality=q_value)
                    elif output_format == "webp":
                        data = encode_webp_lossless(thumb)
                    else:
                        data = encode_png(thumb)
                    row.update({
                        "status": "ok",
                        "original_width": ow, "original_height": oh,
                        "width": tw, "height": th,
                        "format": output_format,
                        "thumb": data, "n_bytes": len(data),
                    })
                except UnsupportedImageError as e:
                    row["status"] = f"unsupported:{e}"
                except ImageDecodeError as e:
                    row["status"] = f"corrupted:{e}"
                except Exception as e:  # noqa: BLE001
                    row["status"] = f"unexpected:{type(e).__name__}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload") \
        .mapInPandas(kernel, schema=THUMBNAIL_SCHEMA)


PREPROCESS_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("status", T.StringType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("enhance_level", T.StringType(), True),
    T.StructField("psm", T.IntegerType(), True),
    T.StructField("thresholded", T.BooleanType(), True),
    T.StructField("clahe", T.BooleanType(), True),
    T.StructField("bilateral", T.BooleanType(), True),
    T.StructField("deskew_angle", T.DoubleType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("preprocessed_png", T.BinaryType(), True),
])


def preprocess_media(df: DataFrame,
                     enhance_level: str = "auto") -> DataFrame:
    """The reference's full adaptive OCR preprocessing
    (app/ocr_service.py:135-246: auto level → CLAHE → brightness →
    bilateral → Otsu/adaptive threshold → deskew) as a map stage over
    (media_id, payload) image rows.  Emits the preprocessed page as PNG
    plus every decision column — what a downstream OCR engine would
    consume.  Undecodable payloads come back with an honest status,
    never a task failure."""
    from ..extract.images import (
        decode_tiff,
        encode_png,
        preprocess_image,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PREPROCESS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {c: None for c in cols}
                row["media_id"] = media_id
                try:
                    fmt = sniff_image_format((payload or b"")[:16])
                    row["format"] = fmt
                    if fmt == "png":
                        img = decode_png(payload)
                    elif fmt == "tiff":
                        img = decode_tiff(payload)
                    elif fmt == "gif":
                        img = decode_gif(payload)
                    elif fmt == "jpeg":
                        from ..extract.jpeg import decode_jpeg

                        img = decode_jpeg(payload)
                    elif fmt == "webp":
                        from ..extract.webp import decode_webp

                        img = decode_webp(payload)
                    else:
                        row["status"] = f"no_codec:{fmt}"
                        rows.append(row)
                        continue
                    if img.ndim == 3 and img.shape[2] in (2, 4):
                        img = img[..., :3] if img.shape[2] == 4 \
                            else img[..., 0]
                    out, d = preprocess_image(img, enhance_level)
                    row.update({
                        "status": "ok",
                        "enhance_level": d["enhance_level"],
                        "psm": int(d["psm"]),
                        "thresholded": bool(d["thresholded"]),
                        "clahe": bool(d["clahe"]),
                        "bilateral": bool(d["bilateral"]),
                        "deskew_angle": float(d["deskew_angle"]),
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "preprocessed_png": encode_png(out),
                    })
                except UnsupportedImageError as e:
                    row["status"] = f"unsupported:{e}"
                except ImageDecodeError as e:
                    row["status"] = f"corrupted:{e}"
                except Exception as e:  # noqa: BLE001
                    row["status"] = f"unexpected:{type(e).__name__}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload") \
        .mapInPandas(kernel, schema=PREPROCESS_SCHEMA)


def extract_media_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """MEDIA_SCHEMA DataFrame → FEATURE_SCHEMA DataFrame.

    Same skew discipline as the text path: callers should size-route
    giant payloads (operators/skew.py) before this map stage.
    """
    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(decode_media_batches(fake),
                                        schema=FEATURE_SCHEMA)


def image_dhash(df: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """(doc, dhash: long) for decodable image payloads (PNG / baseline
    JPEG / GIF / uncompressed TIFF); undecodable rows are dropped —
    they can't be perceptually compared.  Feed the output to
    ``operators.dedup.hamming_near_pairs`` for image near-dup at scale."""
    from ..extract.images import decode_gif, decode_tiff, dhash64
    from ..extract.jpeg import decode_jpeg

    out_schema = T.StructType([
        T.StructField("doc", T.StringType()),
        T.StructField("dhash", T.LongType()),
    ])
    decoders = {"png": decode_png, "tiff": decode_tiff,
                "gif": decode_gif, "jpeg": decode_jpeg}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt = sniff_image_format((payload or b"")[:16])
                dec = decoders.get(fmt)
                if dec is None:
                    continue
                try:
                    hashes.append(dhash64(dec(payload)))
                    ids.append(mid)
                except Exception:  # noqa: BLE001 — poison ≠ dead task
                    continue
            yield pd.DataFrame({"doc": ids, "dhash": hashes})

    return df.select(id_col, payload_col) \
        .mapInPandas(kernel, schema=out_schema)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("brightness", T.DoubleType(), True),
    T.StructField("frame_png", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, max_frames: int = 4,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame sampling for multi-frame media (animated GIF, multi-page
    TIFF): up to ``max_frames`` frames per item, evenly spaced across
    the sequence (always including the first), each re-encoded as PNG —
    one output row per sampled frame.  Single-frame formats yield their
    one frame; an undecodable payload yields one row with the reason,
    and a single bad frame inside an otherwise-good item yields a
    per-frame ``undecodable_frame:`` row alongside the good frames."""
    from ..extract.images import (
        count_gif_frames,
        count_tiff_frames,
        decode_gif,
        decode_png,
        decode_tiff,
        encode_png,
        to_grayscale,
    )
    from ..extract.jpeg import decode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                base = {c: None for c in cols}
                base["media_id"] = mid
                try:
                    fmt = sniff_image_format((payload or b"")[:16])
                    if fmt == "gif":
                        n, dec = count_gif_frames(payload), decode_gif
                    elif fmt == "tiff":
                        n, dec = count_tiff_frames(payload), decode_tiff
                    elif fmt == "png":
                        n, dec = 1, (lambda p, frame=0: decode_png(p))
                    elif fmt == "jpeg":
                        n, dec = 1, (lambda p, frame=0: decode_jpeg(p))
                    elif fmt == "webp":
                        from ..extract.webp import decode_webp

                        n, dec = 1, (lambda p, frame=0: decode_webp(p))
                    else:
                        rows.append(base | {"status": f"no_codec:{fmt}"})
                        continue
                    k = min(max_frames, max(n, 1))
                    picks = sorted({(i * n) // k for i in range(k)})
                    for idx in picks:
                        try:
                            img = dec(payload, frame=idx)
                            gray = to_grayscale(img)
                            if img.ndim == 3 and img.shape[2] in (2, 4):
                                img = img[..., 0] if img.shape[2] == 2 \
                                    else img[..., :3]
                            rows.append(base | {
                                "frame_idx": int(idx),
                                "n_frames": int(n),
                                "status": "ok",
                                "width": int(gray.shape[1]),
                                "height": int(gray.shape[0]),
                                "brightness": float(gray.mean()),
                                "frame_png": encode_png(img),
                            })
                        except Exception as e:  # noqa: BLE001
                            # one bad frame ≠ a bad item: per-frame row
                            rows.append(base | {
                                "frame_idx": int(idx),
                                "n_frames": int(n),
                                "status": f"undecodable_frame:{e}",
                            })
                except ImageDecodeError as e:
                    rows.append(base | {"status": f"undecodable:{e}"})
                except Exception as e:  # noqa: BLE001
                    rows.append(base
                                | {"status":
                                   f"unexpected:{type(e).__name__}"})
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col) \
        .mapInPandas(kernel, schema=FRAME_SCHEMA)


def read_media_latest(spark, media_dir: str,
                      table: str = "features") -> DataFrame:
    """Latest row per media_id from a run-partitioned media sink
    (``run_extract_job(..., media_dir=...)``).  The sink is
    at-least-once across *crashed* runs (a retry gets a fresh run id),
    so consumers dedup at read time by the lexically greatest run —
    the same crash-dup discipline as ``read_results_current``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{media_dir}/{table}")
    w = Window.partitionBy("media_id").orderBy(F.col("run").desc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
