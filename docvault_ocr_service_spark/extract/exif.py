"""EXIF metadata extraction — JPEG APP1 ("Exif\\0\\0") and bare TIFF.

What a corpus/media pipeline wants from EXIF without decoding pixels:
orientation (to transpose thumbnails the way PIL's exif_transpose
would), capture timestamps (recency/dedup signals), camera make/model
(device provenance), declared pixel dimensions, and — the privacy
signal — whether a GPS IFD is present at all (geotagged user photos
routinely need scrubbing before corpus release).

Pure Python, total: any input returns the fixed-shape dict (Nones and
False where absent/malformed).  The IFD walker is EXIF-specific (it
needs ASCII type 2, which the image decoder's walker deliberately
skips) but follows the same bounds-checked discipline as
``extract/images.py``.
"""

from __future__ import annotations

import struct

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}       # BYTE, ASCII, SHORT, LONG
_TAG_ORIENTATION = 274
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_GPS_IFD = 34853
_TAG_DT_ORIGINAL = 36867
_TAG_PIXEL_X = 40962
_TAG_PIXEL_Y = 40963

_EMPTY = {
    "orientation": None, "make": None, "model": None,
    "datetime": None, "datetime_original": None,
    "pixel_x": None, "pixel_y": None, "has_gps": False,
}


def _read_ifd(data: bytes, offset: int, end: str) -> dict[int, object]:
    """One IFD → {tag: value} (ints, or stripped ASCII strings).
    Raises struct.error / ValueError on truncation (caller guards)."""
    (n,) = struct.unpack_from(end + "H", data, offset)
    if n > 512:
        raise ValueError("implausible IFD entry count")
    out: dict[int, object] = {}
    for i in range(n):
        at = offset + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(end + "HHI", data, at)
        if typ not in _TYPE_SIZE or cnt > 1 << 20:
            continue
        size = _TYPE_SIZE[typ] * cnt
        src = at + 8
        if size > 4:
            (src,) = struct.unpack_from(end + "I", data, at + 8)
        if src + size > len(data):
            continue
        if typ == 2:
            raw = data[src:src + cnt]
            out[tag] = raw.split(b"\x00", 1)[0] \
                .decode("ascii", errors="replace").strip()
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            vals = struct.unpack_from(end + str(cnt) + fmt, data, src)
            out[tag] = vals[0] if cnt == 1 else list(vals)
    return out


def _parse_tiff_exif(tiff: bytes) -> dict:
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        return dict(_EMPTY)
    end = "<" if tiff[:2] == b"II" else ">"
    try:
        (magic,) = struct.unpack_from(end + "H", tiff, 2)
        if magic != 42:
            return dict(_EMPTY)
        (ifd0_off,) = struct.unpack_from(end + "I", tiff, 4)
        ifd0 = _read_ifd(tiff, ifd0_off, end)
        out = dict(_EMPTY)
        ori = ifd0.get(_TAG_ORIENTATION)
        if isinstance(ori, int) and 1 <= ori <= 8:
            out["orientation"] = ori
        for tag, key in ((_TAG_MAKE, "make"), (_TAG_MODEL, "model"),
                         (_TAG_DATETIME, "datetime")):
            v = ifd0.get(tag)
            if isinstance(v, str) and v:
                out[key] = v
        out["has_gps"] = isinstance(ifd0.get(_TAG_GPS_IFD), int)
        sub_off = ifd0.get(_TAG_EXIF_IFD)
        if isinstance(sub_off, int) and sub_off + 2 <= len(tiff):
            sub = _read_ifd(tiff, sub_off, end)
            v = sub.get(_TAG_DT_ORIGINAL)
            if isinstance(v, str) and v:
                out["datetime_original"] = v
            for tag, key in ((_TAG_PIXEL_X, "pixel_x"),
                             (_TAG_PIXEL_Y, "pixel_y")):
                v = sub.get(tag)
                if isinstance(v, int):
                    out[key] = v
        return out
    except (struct.error, ValueError):
        return dict(_EMPTY)


def parse_exif(data: bytes | None) -> dict:
    """Image bytes → EXIF dict (see ``_EMPTY`` for the shape).

    JPEG: walks marker segments to the first APP1 carrying
    ``Exif\\0\\0``; TIFF: reads IFD0 directly; anything else → the
    empty shape.  Never raises."""
    if not data:
        return dict(_EMPTY)
    try:
        if data[:2] in (b"II", b"MM"):
            return _parse_tiff_exif(bytes(data))
        if data[:2] != b"\xff\xd8":
            return dict(_EMPTY)
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker == 0xFF:
                # spec-legal fill byte(s) before the marker proper
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xDA:              # SOS: no APP1 after this
                break
            (seg_len,) = struct.unpack_from(">H", data, pos + 2)
            if seg_len < 2:
                break
            if marker == 0xE1 and \
                    data[pos + 4:pos + 10] == b"Exif\x00\x00":
                return _parse_tiff_exif(
                    bytes(data[pos + 10:pos + 2 + seg_len]))
            pos += 2 + seg_len
        return dict(_EMPTY)
    except (struct.error, ValueError, IndexError):
        return dict(_EMPTY)


def build_exif_app1(orientation: int | None = None,
                    make: str | None = None,
                    model: str | None = None,
                    datetime_str: str | None = None,
                    datetime_original: str | None = None,
                    pixel_x: int | None = None,
                    pixel_y: int | None = None,
                    with_gps: bool = False) -> bytes:
    """Deterministic little-endian Exif APP1 segment (marker + length
    + ``Exif\\0\\0`` + TIFF structure) — the writer-side twin the
    fixtures and tests decode back.  Splice after SOI in any JPEG."""
    ifd0: list[tuple[int, int, bytes | int]] = []
    sub: list[tuple[int, int, bytes | int]] = []
    if make:
        ifd0.append((_TAG_MAKE, 2, make.encode() + b"\x00"))
    if model:
        ifd0.append((_TAG_MODEL, 2, model.encode() + b"\x00"))
    if orientation is not None:
        ifd0.append((_TAG_ORIENTATION, 3, orientation))
    if datetime_str:
        ifd0.append((_TAG_DATETIME, 2, datetime_str.encode() + b"\x00"))
    if datetime_original:
        sub.append((_TAG_DT_ORIGINAL, 2,
                    datetime_original.encode() + b"\x00"))
    if pixel_x is not None:
        sub.append((_TAG_PIXEL_X, 4, pixel_x))
    if pixel_y is not None:
        sub.append((_TAG_PIXEL_Y, 4, pixel_y))

    def encode_ifd(entries, data_start):
        """entries sorted by tag → (ifd bytes, overflow data bytes)."""
        entries = sorted(entries)
        body = struct.pack("<H", len(entries))
        overflow = b""
        for tag, typ, val in entries:
            if typ == 2:
                cnt = len(val)
                if cnt <= 4:
                    inline = val + b"\x00" * (4 - cnt)
                    body += struct.pack("<HHI", tag, typ, cnt) + inline
                else:
                    body += struct.pack(
                        "<HHII", tag, typ, cnt,
                        data_start + len(overflow))
                    overflow += val
            else:
                body += struct.pack("<HHII", tag, typ, 1, val) \
                    if typ == 4 else \
                    struct.pack("<HHI", tag, typ, 1) \
                    + struct.pack("<H", val) + b"\x00\x00"
        body += struct.pack("<I", 0)            # next-IFD pointer
        return body, overflow

    # layout: header(8) | ifd0 | ifd0 overflow | sub ifd | sub overflow
    #         | gps ifd
    n0 = len(ifd0) + (1 if sub else 0) + (1 if with_gps else 0)
    ifd0_size = 2 + 12 * n0 + 4
    # first pass with dummy pointers to size the overflow
    dummy0, ov0 = encode_ifd(ifd0, 0)
    sub_off = 8 + ifd0_size + len(ov0)
    dummy_s, ov_s = (encode_ifd(sub, 0) if sub else (b"", b""))
    gps_off = sub_off + len(dummy_s) + len(ov_s)
    full0 = list(ifd0)
    if sub:
        full0.append((_TAG_EXIF_IFD, 4, sub_off))
    if with_gps:
        full0.append((_TAG_GPS_IFD, 4, gps_off))
    body0, ov0 = encode_ifd(full0, 8 + ifd0_size)
    body_s, ov_s = (encode_ifd(sub, sub_off + len(dummy_s))
                    if sub else (b"", b""))
    gps_body = struct.pack("<H", 0) + struct.pack("<I", 0) \
        if with_gps else b""
    tiff = b"II" + struct.pack("<HI", 42, 8) \
        + body0 + ov0 + body_s + ov_s + gps_body
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
