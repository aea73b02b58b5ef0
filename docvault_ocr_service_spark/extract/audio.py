"""Minimal WAV (RIFF/PCM) support: header metadata + sample statistics.

Audio payloads in a crawl are mostly undecodable without ffmpeg, but
uncompressed WAV is just a chunked header over raw PCM — pure Python
gives real duration/rate metadata and amplitude statistics (the audio
analogue of the image path's pixel stats).  Compressed formats (mp3,
ogg, aac) stay honestly outside the envelope.
"""

from __future__ import annotations

import struct

import numpy as np

from .images import ImageDecodeError, UnsupportedImageError


class AudioDecodeError(ImageDecodeError):
    """Payload is not audio this engine can parse."""


def sniff_audio_format(head: bytes) -> str | None:
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    if head[:3] == b"ID3" or head[:2] in (b"\xff\xfb", b"\xff\xf3"):
        return "mp3"
    if head[:4] == b"OggS":
        return "ogg"
    if head[:4] == b"fLaC":
        return "flac"
    return None


def parse_wav(data: bytes) -> dict:
    """WAV bytes → dict(channels, sample_rate, bits, n_samples,
    duration_ms, mean_amplitude, rms_amplitude).

    Supports PCM (format 1) at 8/16 bits; float/compressed WAV raises
    ``UnsupportedImageError``."""
    if sniff_audio_format(data[:12]) != "wav":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8:pos + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", body, 0)
                fmt = {"tag": tag, "channels": ch, "sample_rate": rate,
                       "bits": bits}
            elif cid == b"data":
                pcm = body
            pos += 8 + size + (size & 1)        # chunks are word-aligned
    except struct.error as e:
        raise AudioDecodeError(f"truncated WAV: {e}") from e
    if fmt is None or pcm is None:
        raise AudioDecodeError("missing fmt/data chunk")
    if fmt["tag"] != 1:
        raise UnsupportedImageError(f"non-PCM WAV (format {fmt['tag']})")
    if fmt["bits"] not in (8, 16):
        raise UnsupportedImageError(f"{fmt['bits']}-bit WAV")
    if fmt["channels"] < 1 or fmt["sample_rate"] < 1:
        raise AudioDecodeError("degenerate WAV header")

    if fmt["bits"] == 16:
        samples = np.frombuffer(pcm[:len(pcm) & ~1], dtype="<i2") \
            .astype(np.float64) / 32768.0
    else:
        samples = (np.frombuffer(pcm, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
    n = len(samples) // fmt["channels"]
    return {
        "channels": fmt["channels"],
        "sample_rate": fmt["sample_rate"],
        "bits": fmt["bits"],
        "n_samples": int(n),
        "duration_ms": int(n * 1000 / fmt["sample_rate"]),
        "mean_amplitude": float(np.abs(samples).mean()) if n else 0.0,
        "rms_amplitude": float(np.sqrt((samples ** 2).mean())) if n
        else 0.0,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM fixture writer (proves parse_wav round-trips)."""
    pcm = np.clip(np.asarray(samples) * 32767.0,
                  -32768, 32767).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   sample_rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm
