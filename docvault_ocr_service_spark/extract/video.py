"""MP4/QuickTime container metadata — the video sibling of the audio
header parsers (extract/audio.py): duration, timescale, track count
and display dimensions WITHOUT decoding a single frame (codec decode
needs ffmpeg, which this environment does not have — the media
pipeline lands these as honest ``metadata_only:mp4`` rows, exactly
the MP3/FLAC/Ogg precedent).

ISO BMFF box walk (ISO/IEC 14496-12): top-level boxes are
``size(u32 BE) | fourcc | payload``; ``size==1`` switches to a u64
largesize, ``size==0`` means to-end-of-file.  ``mvhd`` gives the
movie timescale/duration (version 0: u32 fields, version 1: u64
creation/modification/duration); ``tkhd`` carries 16.16 fixed-point
display width/height as its last 8 bytes.  The walk is bounded and
total: malformed input raises ``VideoFormatError``, never anything
else.
"""

from __future__ import annotations

import struct


class VideoFormatError(ValueError):
    pass


_MAX_BOXES = 4096


def sniff_video_format(head: bytes) -> str | None:
    """'mp4' for ISO-BMFF files (ftyp/moov/free/mdat leading box)."""
    if len(head) >= 8 and head[4:8] in (b"ftyp", b"moov", b"free",
                                        b"mdat", b"wide", b"skip"):
        return "mp4"
    return None


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes."""
    pos = start
    n = 0
    while pos + 8 <= end:
        n += 1
        if n > _MAX_BOXES:
            raise VideoFormatError("implausible box count")
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise VideoFormatError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise VideoFormatError("box overruns container")
        yield fourcc, body, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """MP4/MOV bytes → {duration_ms, timescale, n_tracks, width,
    height, brand}.  Dimensions are the largest track's 16.16
    display size (0×0 audio-only tracks ignored); raises
    ``VideoFormatError`` when no ``moov`` is present (streaming-
    fragmented files whose moov lives out of reach)."""
    if sniff_video_format(data[:16]) != "mp4":
        raise VideoFormatError("not an ISO-BMFF container")
    brand = None
    moov: tuple[int, int] | None = None
    for fourcc, a, b in _boxes(data, 0, len(data)):
        if fourcc == b"ftyp" and b - a >= 4:
            brand = data[a:a + 4].decode("ascii", errors="replace") \
                .strip()
        elif fourcc == b"moov":
            moov = (a, b)
    if moov is None:
        raise VideoFormatError("no moov box (fragmented or truncated)")

    timescale = duration = None
    n_tracks = 0
    width = height = 0
    try:
        for fourcc, a, b in _boxes(data, *moov):
            if fourcc == b"mvhd":
                if b - a < 24:
                    raise VideoFormatError("truncated mvhd")
                if data[a] == 1:
                    if b - a < 32:
                        raise VideoFormatError("truncated mvhd v1")
                    timescale, = struct.unpack_from(">I", data, a + 20)
                    duration, = struct.unpack_from(">Q", data, a + 24)
                else:
                    timescale, duration = struct.unpack_from(
                        ">II", data, a + 12)
            elif fourcc == b"trak":
                n_tracks += 1
                for f2, c, d in _boxes(data, a, b):
                    if f2 != b"tkhd" or d - c < 12:
                        # too short to hold ver/flags + the trailing
                        # 16.16 dims — skip rather than read garbage
                        continue
                    # width/height are the last 8 payload bytes in
                    # both versions (16.16 fixed point)
                    w16, h16 = struct.unpack_from(">II", data, d - 8)
                    w, h = w16 >> 16, h16 >> 16
                    if w * h > width * height:
                        width, height = w, h
    except (struct.error, IndexError) as e:
        # totality contract: malformed boxes are VideoFormatError,
        # never a task-killing struct/index error
        raise VideoFormatError(f"malformed box payload: {e}") from e
    if not timescale:
        raise VideoFormatError("no mvhd timescale")
    return {
        "duration_ms": int(duration * 1000 // timescale),
        "timescale": int(timescale),
        "n_tracks": n_tracks,
        "width": int(width),
        "height": int(height),
        "brand": brand,
    }


def encode_mp4_stub(duration_ms: int, timescale: int = 1000,
                    tracks: tuple[tuple[int, int], ...] = ((640, 360),),
                    brand: str = "isom") -> bytes:
    """Deterministic metadata-only MP4 skeleton (ftyp + moov with mvhd
    and one tkhd per track, no media data) — the writer-side twin the
    fixtures and tests parse back, byte-layout-valid per 14496-12."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + brand.encode("ascii") \
        + struct.pack(">I", 0)
    duration = duration_ms * timescale // 1000
    mvhd_body = bytes(4) + struct.pack(
        ">IIII", 0, 0, timescale, duration) + bytes(80)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    traks = b""
    for w, h in tracks:
        # spec-valid v0 tkhd payload is 84 bytes: ver/flags(4),
        # creation/modification/track_ID/reserved/duration (20),
        # reserved(8), layer/alt-group/volume/reserved (8),
        # matrix(36), width(4), height(4)
        tkhd_body = bytes(4) + bytes(72) \
            + struct.pack(">II", w << 16, h << 16)
        tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" \
            + tkhd_body
        traks += struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov_payload = mvhd + traks
    moov = struct.pack(">I", 8 + len(moov_payload)) + b"moov" \
        + moov_payload
    return ftyp + moov
