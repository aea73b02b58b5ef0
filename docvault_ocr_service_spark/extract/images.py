"""Image payload support: magic sniffing, pure-Python PNG codec, TIFF
frame counting, and pixel-quality stats (no PIL/cv2 in this container).

Reference behaviors re-expressed:

- format sniffing: ``/root/reference/app/document_processor.py:84-93``
  (PDF/PNG/JPEG/TIFF magic bytes; GIF added for honest taxonomy).
- image quality analysis: ``app/ocr_service.py:100-133`` — sharpness =
  Laplacian variance, contrast = stddev, brightness = mean over the
  grayscale pixels.  The reference feeds these into OCR preprocessing;
  this engine surfaces them as media features (no OCR runtime here).
- TIFF multi-frame handling: ``app/document_processor.py:130-153``
  iterates frames; frame *counting* from the IFD chain is pure-Python
  and gives page_count without a decoder.

The PNG decoder is complete for the common web cases: 8-bit depth,
color types 0/2/3/4/6, all five scanline filters, non-interlaced.
Anything else raises ``ImageDecodeError`` (→ the pipeline's permanent
corrupted_file/unsupported taxonomy, never a task failure).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
TIFF_MAGICS = (b"II*\x00", b"MM\x00*")
GIF_MAGICS = (b"GIF87a", b"GIF89a")


class ImageDecodeError(ValueError):
    """Payload is not an image this engine can decode."""


class UnsupportedImageError(ImageDecodeError):
    """Structurally valid image, but a variant outside this engine's
    codec envelope (progressive-arithmetic JPEG, 16-bit PNG,
    hierarchical frames…) — callers should label it unsupported, not
    corrupted."""


def sniff_image_format(head: bytes) -> str | None:
    """PNG/JPEG/TIFF/GIF/WEBP magic-byte sniff
    (document_processor.py:84-93).  WEBP needs 12 bytes of head (RIFF
    fourcc at 0, WEBP tag at 8 — RIFF/WAVE audio shares the prefix)."""
    if head.startswith(PNG_MAGIC[:4]):
        return "png"
    if head.startswith(JPEG_MAGIC):
        return "jpeg"
    if head.startswith(TIFF_MAGICS):
        return "tiff"
    if head.startswith(GIF_MAGICS):
        return "gif"
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return "webp"
    return None


# -- PNG ----------------------------------------------------------------------

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit gray (H,W), LA (H,W,2), RGB (H,W,3) or RGBA (H,W,4)
    array → PNG bytes (filter 0).

    Deterministic fixture/writer path — the encoder the tests and the
    synthetic corpus use; also the proof the decoder round-trips.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, *arr.shape
        raw = arr
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        h, w = arr.shape[0], arr.shape[1]
        raw = arr.reshape(h, w * arr.shape[2])
    else:
        raise ValueError("encode_png supports (H,W) gray, (H,W,2) LA, "
                         "(H,W,3) RGB or (H,W,4) RGBA")

    def chunk(kind: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + kind + payload
                + struct.pack(">I", zlib.crc32(kind + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W) gray or (H,W,C) for C>1.

    Raises ``ImageDecodeError`` on anything outside the supported
    envelope (8-bit, color types 0/2/3/4/6, non-interlaced).
    """
    if not data.startswith(PNG_MAGIC):
        raise ImageDecodeError("missing PNG signature")
    pos = len(PNG_MAGIC)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), kind = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) < length:
            raise ImageDecodeError("truncated chunk")
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif kind == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8) \
                .reshape(-1, 3)
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
        pos += 12 + length  # length + kind + payload + crc
    if ihdr is None or not idat:
        raise ImageDecodeError("missing IHDR/IDAT")
    w, h, depth, color_type, compression, filt, interlace = ihdr
    if w < 1 or h < 1:
        raise ImageDecodeError(f"degenerate dimensions {w}x{h}")
    if depth != 8:
        raise ImageDecodeError(f"unsupported bit depth {depth}")
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise ImageDecodeError(f"unsupported color type {color_type}")
    if compression != 0 or filt != 0:
        raise ImageDecodeError("nonstandard compression/filter method")
    if interlace != 0:
        raise ImageDecodeError("interlaced PNG not supported")
    channels = _CHANNELS_BY_COLOR_TYPE[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ImageDecodeError(f"IDAT inflate failed: {e}") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ImageDecodeError("IDAT size mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=row_start + 1).astype(np.int32)
        if ftype == 0:                                   # None
            recon = line
        elif ftype == 1:                                 # Sub
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 2:                                 # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:                                 # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ImageDecodeError(f"unknown scanline filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = out[y]

    if color_type == 3:
        if palette is None:
            raise ImageDecodeError("palette image without PLTE")
        # clamp out-of-range indices (corrupt/truncated palettes) like
        # the GIF path does, instead of leaking IndexError
        return palette[np.minimum(out.reshape(h, w), len(palette) - 1)]
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def thumbnail_size(width: int, height: int, max_size: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail dimensions, value-identical to the
    reference (app/thumbnail_generator.py:155-188): never upscale;
    landscape pins width, portrait/square pins height; the free side is
    ``int()``-truncated (clamped to ≥1 — PIL's thumbnail() does the same
    for extreme ratios)."""
    if width <= max_size and height <= max_size:
        return width, height
    aspect = width / height
    if width > height:
        return max_size, max(int(max_size / aspect), 1)
    return max(int(max_size * aspect), 1), max_size


def resize_box(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Area-average (box) downsample to (th, tw) — the deterministic
    pure-numpy stand-in for PIL's LANCZOS (semantic, not byte, parity:
    the size contract is ``thumbnail_size``'s; resampling kernels are
    codec-library-specific)."""
    src = img.astype(np.float64)
    h, w = src.shape[:2]
    ri = (np.arange(th) * h) // th
    ci = (np.arange(tw) * w) // tw
    rows = np.add.reduceat(src, ri, axis=0)
    cells = np.add.reduceat(rows, ci, axis=1)
    rcnt = np.diff(np.append(ri, h)).astype(np.float64)
    ccnt = np.diff(np.append(ci, w)).astype(np.float64)
    counts = np.outer(rcnt, ccnt)
    if src.ndim == 3:
        counts = counts[..., None]
    return np.clip(np.rint(cells / counts), 0, 255).astype(np.uint8)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """Luma grayscale (ITU-R 601, what PIL's convert('L') uses);
    gray+alpha images use the gray channel."""
    if img.ndim == 2:
        return img.astype(np.float64)
    if img.shape[2] == 2:                       # PNG color type 4 (GA)
        return img[..., 0].astype(np.float64)
    rgb = img[..., :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def pixel_stats(img: np.ndarray) -> dict:
    """The ocr_service.py:100-133 quality metrics over a decoded image:
    brightness = mean, contrast = stddev, sharpness = variance of the
    4-neighbor Laplacian (edge-replicated borders)."""
    g = to_grayscale(img)
    padded = np.pad(g, 1, mode="edge")
    lap = (padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2]
           + padded[1:-1, 2:] - 4.0 * g)
    return {
        "width": int(g.shape[1]),
        "height": int(g.shape[0]),
        "brightness": float(g.mean()),
        "contrast": float(g.std()),
        "sharpness": float(lap.var()),
    }


# -- TIFF ---------------------------------------------------------------------

def encode_tiff_frames(n_frames: int, width: int = 8,
                       height: int = 8) -> bytes:
    """Minimal little-endian TIFF whose IFD chain declares ``n_frames``
    frames (fixture writer for the frame counter; no pixel data)."""
    if n_frames < 1:
        raise ValueError("need at least one frame")
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)  # first IFD right after the header
    pos = 8
    for k in range(n_frames):
        # 2 entries: ImageWidth (256), ImageLength (257), SHORT values
        entries = [(256, 3, 1, width), (257, 3, 1, height)]
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack("<HHI4s", tag, typ, cnt,
                               struct.pack("<HH", val, 0))
        next_off = 0 if k == n_frames - 1 else pos + 2 + 12 * len(entries) + 4
        ifd += struct.pack("<I", next_off)
        out += ifd
        pos += len(ifd)
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF6 §13): MSB-first variable-width codes,
    CLEAR=256 / EOI=257, *early change* (width bumps one code earlier
    than GIF).  Fixture writer proving ``_tiff_lzw_decode``."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    put(256, width)                               # leading CLEAR
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1                            # early change
        elif next_code >= 4094:                   # table nearly full
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        put(table[w], width)
    put(257, width)                               # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of ``_tiff_lzw_encode`` (and of any spec-conforming TIFF
    LZW writer): stops at EOI or ``expected`` output bytes."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    base_len = len(table)
    width = 9
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ImageDecodeError("TIFF LZW strip ended early")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == 256:                           # CLEAR
            table = table[:base_len]
            width = 9
            prev = None
            continue
        if code == 257:                           # EOI
            break
        if prev is None:
            if code >= len(table):
                raise ImageDecodeError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ImageDecodeError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change, with the decoder's one-entry lag: the decoder
        # reconstructs entry n-1 while reading code n, so it must bump
        # when the table is one short of the encoder's trigger
        # (libtiff: maxcode = (1<<bits)-2)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ImageDecodeError("TIFF LZW strip ended early")
    return bytes(out[:expected])


def _packbits_encode_row(row: bytes) -> bytes:
    """PackBits one row (TIFF6 §9: rows are packed separately)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([(1 - run) & 0xFF, row[i]])
            i += run
            continue
        j = i + 1                                 # literal until a 2-run
        while j < n and j - i < 128 and \
                not (j + 1 < n and row[j] == row[j + 1]):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ImageDecodeError("PackBits strip ended early")
        n = data[pos]
        pos += 1
        if n == 128:                              # -128: noop
            continue
        if n < 128:                               # n+1 literal bytes
            if pos + n + 1 > len(data):
                raise ImageDecodeError("PackBits strip ended early")
            out += data[pos:pos + n + 1]
            pos += n + 1
        else:                                     # repeat next 257-n times
            if pos >= len(data):
                raise ImageDecodeError("PackBits strip ended early")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    return bytes(out[:expected])


def encode_tiff_gray(frames: list[np.ndarray], *,
                     compression: str = "none",
                     predictor: bool = False) -> bytes:
    """8-bit grayscale frames → little-endian TIFF (one strip per
    frame; Compression none / ``lzw`` / ``packbits``, optional
    horizontal predictor with LZW).  Fixture writer proving
    ``decode_tiff`` round-trips."""
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(a.ndim != 2 for a in arrs):
        raise ValueError("encode_tiff_gray takes (H,W) uint8 frames")
    return _encode_tiff(arrs, spp=1, compression=compression,
                        predictor=predictor)


def encode_tiff_rgb(frames: list[np.ndarray], *,
                    compression: str = "none",
                    predictor: bool = False) -> bytes:
    """8-bit (H,W,3) RGB frames → little-endian TIFF."""
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(a.ndim != 3 or a.shape[2] != 3 for a in arrs):
        raise ValueError("encode_tiff_rgb takes (H,W,3) uint8 frames")
    return _encode_tiff(arrs, spp=3, compression=compression,
                        predictor=predictor)


_TIFF_COMPRESSION_IDS = {"none": 1, "lzw": 5, "jpeg_old": 6, "jpeg": 7,
                         "deflate": 8, "packbits": 32773}


def _encode_tiff(arrs: list[np.ndarray], spp: int, compression: str,
                 predictor: bool) -> bytes:
    if not arrs:
        raise ValueError("need at least one frame")
    if compression not in _TIFF_COMPRESSION_IDS:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor requires lzw or deflate compression")
    out = bytearray(b"II*\x00")
    # pixel strips first, IFD chain after
    pix_offsets, pix_counts = [], []
    body = bytearray()
    base = 8
    for a in arrs:
        h, w = a.shape[:2]
        flat = a.reshape(h, w * spp)
        if predictor:
            # differencing is per SAMPLE: reshape so channels interleave
            d = a.astype(np.int16)
            d[:, 1:] = (a[:, 1:].astype(np.int16)
                        - a[:, :-1].astype(np.int16))
            flat = (d % 256).astype(np.uint8).reshape(h, w * spp)
        if compression == "lzw":
            strip = _tiff_lzw_encode(flat.tobytes())
        elif compression in ("jpeg", "jpeg_old"):
            from .jpeg import encode_jpeg

            strip = encode_jpeg(a, quality=95)
        elif compression == "deflate":
            strip = zlib.compress(flat.tobytes())
        elif compression == "packbits":
            strip = b"".join(_packbits_encode_row(flat[r].tobytes())
                             for r in range(h))
        else:
            strip = flat.tobytes()
        pix_offsets.append(base + len(body))
        pix_counts.append(len(strip))
        body += strip
    ifd_start = base + len(body)
    n_entries = 10 + (1 if predictor else 0) \
        + (2 if compression == "jpeg_old" else 0)
    ifd_size = 2 + 12 * n_entries + 4
    out += struct.pack("<I", ifd_start)
    out += body
    for k, a in enumerate(arrs):
        h, w = a.shape[:2]
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
            (259, 3, 1, _TIFF_COMPRESSION_IDS[compression]),
            (262, 3, 1, 1),                       # BlackIsZero
            (273, 4, 1, pix_offsets[k]),          # StripOffsets
            (277, 3, 1, spp),                     # SamplesPerPixel
            (278, 3, 1, h),                       # RowsPerStrip
            (279, 4, 1, pix_counts[k]),           # StripByteCounts
            (284, 3, 1, 1),                       # PlanarConfig = chunky
        ]
        if predictor:
            entries.append((317, 3, 1, 2))        # horizontal predictor
        if compression == "jpeg_old":
            # JPEGInterchangeFormat/-Length: the §22 pointer pair real
            # old-style writers emit (strips cover the same bytes)
            entries.append((513, 4, 1, pix_offsets[k]))
            entries.append((514, 4, 1, pix_counts[k]))
        entries.sort()
        ifd = struct.pack("<H", n_entries)
        for tag, typ, cnt, val in entries:
            packed = (struct.pack("<HH", val, 0) if typ == 3
                      else struct.pack("<I", val))
            ifd += struct.pack("<HHI4s", tag, typ, cnt, packed)
        next_off = (0 if k == len(arrs) - 1
                    else ifd_start + (k + 1) * ifd_size)
        ifd += struct.pack("<I", next_off)
        out += ifd
    return bytes(out)


def retag_tiff_ifd(data: bytes, mapping: dict[int, int]) -> bytes:
    """Rewrite IFD tag IDs per ``mapping`` by walking the directory
    chain (little-endian TIFF only) — fixture surgery for building
    old-style-JPEG layout variants.  Walking the IFD (instead of a
    bytes.find over the whole file) guarantees the rewrite can never
    touch strip bytes that happen to contain the tag pattern."""
    if data[:4] != b"II*\x00":
        raise ValueError("retag_tiff_ifd supports little-endian TIFF")
    out = bytearray(data)
    (offset,) = struct.unpack_from("<I", data, 4)
    seen = set()
    while offset and offset not in seen:
        seen.add(offset)
        (n_entries,) = struct.unpack_from("<H", data, offset)
        for i in range(n_entries):
            at = offset + 2 + 12 * i
            (tag,) = struct.unpack_from("<H", data, at)
            if tag in mapping:
                out[at:at + 2] = struct.pack("<H", mapping[tag])
        (offset,) = struct.unpack_from(
            "<I", data, offset + 2 + 12 * n_entries)
    return bytes(out)


_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}   # BYTE, SHORT, LONG, UNDEFINED


def _tiff_ifd_values(data: bytes, offset: int,
                     end: str) -> dict[int, list[int]]:
    try:
        return _tiff_ifd_values_unsafe(data, offset, end)
    except struct.error as e:
        raise ImageDecodeError(f"truncated IFD: {e}") from e


def _tiff_ifd_values_unsafe(data: bytes, offset: int,
                            end: str) -> dict[int, list[int]]:
    (n_entries,) = struct.unpack_from(end + "H", data, offset)
    values: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = offset + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(end + "HHI", data, at)
        if typ not in _TIFF_TYPE_SIZE:
            continue                    # rational/ascii etc — not needed
        size = _TIFF_TYPE_SIZE[typ] * cnt
        if size <= 4:
            src = at + 8
        else:
            (src,) = struct.unpack_from(end + "I", data, at + 8)
            if src + size > len(data):
                raise ImageDecodeError("IFD value offset out of bounds")
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        values[tag] = list(struct.unpack_from(end + str(cnt) + fmt,
                                              data, src))
    return values


def decode_tiff(data: bytes, frame: int = 0) -> np.ndarray:
    """8-bit gray/RGB TIFF frame → uint8 array.

    Compression: none (1), CCITT fax — Modified Huffman (2), Group 3
    1-D and 2-D (3, per T4Options bit 0) and Group 4 (4) bilevel via
    extract/ccitt.py, honoring MinIsWhite — LZW (5, incl. the
    horizontal predictor tag 317=2), new-style JPEG (7, per-strip JPEG
    streams spliced with the shared JPEGTables tag 347 when present),
    Adobe deflate (8, legacy 32946), PackBits (32773), and old-style
    JPEG (6, via the JPEGInterchangeFormat pointer or SOI-led strips;
    the retracted tables-split form raises honestly) — the formats
    PIL covers for the reference's multi-frame TIFFs
    (tests/test_document_processor.py:157-176).  Anything else raises
    ``UnsupportedImageError``; truncated IFD chains surface as
    ImageDecodeError, never struct.error."""
    if data[:4] == b"II*\x00":
        end = "<"
    elif data[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ImageDecodeError("not a TIFF payload")
    try:
        (offset,) = struct.unpack_from(end + "I", data, 4)
        seen: set[int] = set()
        for _ in range(frame):
            if offset == 0 or offset in seen:
                raise ImageDecodeError(f"no frame {frame}")
            seen.add(offset)
            (n_entries,) = struct.unpack_from(end + "H", data, offset)
            (offset,) = struct.unpack_from(end + "I", data,
                                           offset + 2 + 12 * n_entries)
    except struct.error as e:
        raise ImageDecodeError(f"truncated TIFF: {e}") from e
    if offset == 0 or offset + 2 > len(data):
        raise ImageDecodeError(f"no frame {frame}")
    v = _tiff_ifd_values(data, offset, end)
    try:
        w, h = v[256][0], v[257][0]
    except KeyError as e:
        raise ImageDecodeError(f"missing required TIFF tag {e}") from e
    compression = v.get(259, [1])[0]
    if compression not in (1, 2, 3, 4, 5, 6, 7, 8, 32946, 32773):
        raise UnsupportedImageError(
            f"unsupported TIFF compression {compression}")

    if compression == 6:
        # old-style JPEG (TIFF 6.0 §22): the JPEGInterchangeFormat
        # pointer (513/514) embeds a complete JPEG stream — the form
        # real writers emit; strips holding a full SOI-led stream are
        # the common fallback layout.  The §22 tables-split form
        # (JPEGQTables/JPEGDCTables per component, raw entropy strips)
        # was retracted by TechNote 2 and is honestly unsupported.
        from .jpeg import decode_jpeg

        if 513 in v:
            off6 = v[513][0]
            ln6 = v.get(514, [len(data) - off6])[0]
            if off6 + ln6 > len(data):
                raise ImageDecodeError(
                    "old-style JPEG interchange stream out of bounds")
            stream = data[off6:off6 + ln6]
        else:
            offs, cnts = v.get(273, []), v.get(279, [])
            if (offs and len(offs) == len(cnts)
                    and data[offs[0]:offs[0] + 2] == b"\xff\xd8"):
                if any(o + c > len(data) for o, c in zip(offs, cnts)):
                    raise ImageDecodeError("strip out of bounds")
                stream = b"".join(data[o:o + c]
                                  for o, c in zip(offs, cnts))
            else:
                raise UnsupportedImageError(
                    "old-style JPEG (6) tables-split form not supported "
                    "(no interchange stream)")
        arr = decode_jpeg(bytes(stream))
        if arr.shape[:2] != (h, w):
            raise ImageDecodeError(
                "old-style JPEG dimensions disagree with IFD")
        return arr

    try:
        strip_offs, strip_cnts = v[273], v[279]
    except KeyError as e:
        raise ImageDecodeError(f"missing required TIFF tag {e}") from e

    jpeg_tables = bytes(v[347]) if compression == 7 and 347 in v else None
    spp = v.get(277, [1])[0]
    # TIFF 6.0 default BitsPerSample is 1; minimal fax writers omit the
    # tag, so default by compression family
    bits = v.get(258, [1] if compression in (2, 3, 4) else [8])
    if compression in (2, 3, 4):
        if spp != 1 or bits != [1]:
            raise ImageDecodeError(
                f"fax TIFF must be bilevel, got spp={spp} bits={bits}")
    elif spp not in (1, 3) or any(b != 8 for b in bits):
        raise ImageDecodeError(f"unsupported TIFF spp={spp} bits={bits}")
    if len(strip_offs) != len(strip_cnts):
        raise ImageDecodeError("strip offset/count mismatch")
    rows_per_strip = v.get(278, [h])[0] or h
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(strip_offs, strip_cnts)):
        if off + cnt > len(data):
            raise ImageDecodeError("strip out of bounds")
        chunk = data[off:off + cnt]
        rows_here = min(rows_per_strip, h - si * rows_per_strip)
        if rows_here <= 0:
            break
        if compression in (2, 3, 4):
            from .ccitt import (decode_g3_1d, decode_g3_2d, decode_g4,
                                decode_mh)

            fax = {2: decode_mh, 4: decode_g4,
                   3: (decode_g3_2d if v.get(292, [0])[0] & 1
                       else decode_g3_1d)}
            # emit black=255/white=0; the generic MinIsWhite invert
            # below (262==0, the fax default) flips to display-normal
            chunk = (fax[compression](bytes(chunk), w, rows_here)
                     * np.uint8(255)).tobytes()
        elif compression == 5:
            chunk = _tiff_lzw_decode(chunk, rows_here * w * spp)
        elif compression == 7:
            from .jpeg import decode_jpeg

            if jpeg_tables is not None and len(jpeg_tables) > 4:
                # splice: SOI + shared tables (sans SOI/EOI) + strip
                # stream (sans its SOI) — TIFF6 TechNote 2
                stream = b"\xff\xd8" + jpeg_tables[2:-2] + chunk[2:]
            else:
                stream = bytes(chunk)
            strip_arr = decode_jpeg(stream)
            if strip_arr.shape[:2] != (rows_here, w) or \
                    (strip_arr.ndim == 3) != (spp == 3):
                raise ImageDecodeError(
                    "JPEG strip dimensions disagree with IFD")
            chunk = strip_arr.tobytes()
        elif compression in (8, 32946):
            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as e:
                raise ImageDecodeError(
                    f"bad deflate TIFF strip: {e}") from e
            if len(chunk) != rows_here * w * spp:
                raise ImageDecodeError("deflate strip size mismatch")
        elif compression == 32773:
            chunk = _packbits_decode(chunk, rows_here * w * spp)
        raw += chunk
    if len(raw) != w * h * spp:
        raise ImageDecodeError("pixel data size mismatch")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    arr = arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, 3)
    if v.get(317, [1])[0] == 2:         # horizontal predictor: undo the
        arr = np.cumsum(arr, axis=1, dtype=np.uint8)  # per-row differencing
    if v.get(262, [1])[0] == 0:         # WhiteIsZero → invert to common
        arr = 255 - arr
    return arr


def count_tiff_frames(data: bytes, max_frames: int = 100_000) -> int:
    """Number of IFDs in the TIFF directory chain
    (app/document_processor.py:130-153's n_frames, sans decoder).

    Raises ``ImageDecodeError`` on a malformed header or a cyclic /
    out-of-bounds chain.
    """
    if data[:4] == b"II*\x00":
        u16, u32 = "<H", "<I"
    elif data[:4] == b"MM\x00*":
        u16, u32 = ">H", ">I"
    else:
        raise ImageDecodeError("not a TIFF payload")
    (offset,) = struct.unpack_from(u32, data, 4)
    seen: set[int] = set()
    frames = 0
    while offset:
        if offset in seen or offset + 2 > len(data) or frames >= max_frames:
            raise ImageDecodeError("malformed IFD chain")
        seen.add(offset)
        try:
            (n_entries,) = struct.unpack_from(u16, data, offset)
            next_at = offset + 2 + 12 * n_entries
            if next_at + 4 > len(data):
                raise ImageDecodeError("truncated IFD")
            (offset,) = struct.unpack_from(u32, data, next_at)
        except struct.error as e:
            raise ImageDecodeError(f"truncated IFD: {e}") from e
        frames += 1
    return frames


# -- GIF ----------------------------------------------------------------------

def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a GIF sub-block chain without copying bytes."""
    while True:
        if pos >= len(data):
            raise ImageDecodeError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        if pos + n > len(data):
            raise ImageDecodeError("truncated GIF sub-block")
        pos += n


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ImageDecodeError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ImageDecodeError("truncated GIF sub-block")
        out += data[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR/EOI,
    table capped at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if prev is None:
                if code >= len(table):
                    raise ImageDecodeError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ImageDecodeError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    if len(out) < n_pixels:
        raise ImageDecodeError("LZW stream ended early")
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes, frame: int = 0) -> np.ndarray:
    """GIF87a/89a frame → (H,W,3) uint8 via a pure-Python LZW decoder.
    Frames are decoded standalone (no animation compositing — each
    frame's own rectangle and palette), which is what feature extraction
    and thumbnailing need."""
    if data[:6] not in GIF_MAGICS:
        raise ImageDecodeError("missing GIF signature")
    if len(data) < 13:
        raise ImageDecodeError("truncated GIF header")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = np.frombuffer(data[pos:pos + n], dtype=np.uint8) \
            .reshape(-1, 3)
        pos += n
    seen = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            pos += 1                            # label
            pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ImageDecodeError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ImageDecodeError("truncated image descriptor")
        w, h = struct.unpack_from("<HH", data, pos + 4)
        ipacked = data[pos + 8]
        pos += 9
        lct = None
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            lct = np.frombuffer(data[pos:pos + n], dtype=np.uint8) \
                .reshape(-1, 3)
            pos += n
        if pos >= len(data):
            raise ImageDecodeError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        if seen != frame:                       # skip: no byte copying
            pos = _skip_subblocks(data, pos)
            seen += 1
            continue
        lzw, pos = _gif_subblocks(data, pos)
        if seen == frame:
            if not 2 <= min_code <= 8:
                raise ImageDecodeError(f"bad LZW min code {min_code}")
            palette = lct if lct is not None else gct
            if palette is None:
                raise ImageDecodeError("GIF frame without a color table")
            idx = np.frombuffer(
                _lzw_decode(lzw, min_code, w * h), dtype=np.uint8) \
                .reshape(h, w)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            return palette[np.minimum(idx, len(palette) - 1)]
        seen += 1
    raise ImageDecodeError(f"no frame {frame}")


def count_gif_frames(data: bytes) -> int:
    """Number of image descriptors in a GIF (animation frame count)."""
    if data[:6] not in GIF_MAGICS:
        raise ImageDecodeError("missing GIF signature")
    packed = data[10] if len(data) > 10 else 0
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ImageDecodeError(f"unknown GIF block 0x{block:02x}")
        ipacked = data[pos + 8] if pos + 9 <= len(data) else 0
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1                                # LZW min code size
        pos = _skip_subblocks(data, pos)
        frames += 1
    return frames


def encode_gif_gray(frames: list[np.ndarray]) -> bytes:
    """8-bit gray frames → GIF89a with a 256-gray palette, written with
    the classic "uncompressed LZW" trick (literal codes + a CLEAR before
    the table would widen past 9 bits) — fixture writer proving
    ``decode_gif`` round-trips."""
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not arrs or any(a.ndim != 2 for a in arrs):
        raise ValueError("encode_gif_gray takes (H,W) uint8 frames")
    w0, h0 = arrs[0].shape[1], arrs[0].shape[0]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w0, h0, 0x80 | 0x07, 0, 0)  # GCT 256
    out += bytes(v for g in range(256) for v in (g, g, g))
    for a in arrs:
        h, w = a.shape
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x08"                          # LZW min code size
        clear, eoi = 256, 257
        codes = []
        for i, px in enumerate(a.tobytes()):
            if i % 254 == 0:
                codes.append(clear)
            codes.append(px)
        codes.append(eoi)
        acc = bits = 0
        payload = bytearray()
        for code in codes:                      # constant 9-bit width
            acc |= code << bits
            bits += 9
            while bits >= 8:
                payload.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
        if bits:
            payload.append(acc & 0xFF)
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): box-downsample the grayscale to
    9×8, take the horizontal gradient sign — the standard perceptual
    hash for image near-dup (robust to re-encode/resize, cheap to
    compare by Hamming distance).  Returns a signed int64 (two's
    complement) so it rides in a Spark long."""
    g = to_grayscale(img)
    small = resize_box(g, 9, 8).astype(np.int16)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint8).reshape(64)
    val = np.packbits(bits, bitorder="little").view(np.uint64)[0]
    return int(np.int64(val))


# -- OCR-style quality analysis + adaptive preprocessing (O1/O2/O3) ------------

def analyze_image_quality(img: np.ndarray) -> dict:
    """Value-identical restatement of the reference's quality analysis
    (app/ocr_service.py:100-133): sharpness = Laplacian variance,
    contrast = stddev, brightness = mean, plus the exact threshold flags
    (contrast < 50, brightness < 80 / > 180) and needs_enhancement."""
    s = pixel_stats(img)
    is_low_contrast = s["contrast"] < 50
    is_dark = s["brightness"] < 80
    is_bright = s["brightness"] > 180
    return s | {
        "is_low_contrast": is_low_contrast,
        "is_dark": is_dark,
        "is_bright": is_bright,
        "needs_enhancement": is_low_contrast or is_dark or is_bright,
    }


def select_enhance_level(quality: dict, requested: str = "auto") -> str:
    """The reference's auto level selection, value-for-value
    (app/ocr_service.py:158-166): aggressive only for dark AND
    low-contrast; medium when enhancement is needed or sharpness < 80;
    light otherwise."""
    if requested != "auto":
        return requested
    if quality["is_dark"] and quality["is_low_contrast"]:
        return "aggressive"
    if quality["needs_enhancement"] or quality["sharpness"] < 80:
        return "medium"
    return "light"


def determine_psm(width: int, height: int) -> int:
    """Tesseract page-segmentation-mode auto-selection, value-for-value
    (app/ocr_service.py:282-297): raw line for very wide, single column
    for very tall, uniform block for near-square, automatic otherwise.
    No OCR runtime here — the decision logic is the portable part."""
    aspect = width / height
    if aspect > 5:
        return 13
    if aspect < 0.3:
        return 4
    if 0.7 < aspect < 1.5:
        return 6
    return 3


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's global threshold (the cv2.THRESH_OTSU the reference's
    aggressive path uses): maximize between-class variance over the
    256-bin histogram."""
    hist = np.bincount(gray.astype(np.uint8).reshape(-1),
                       minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0)
    return int(np.argmax(sigma_b))


def _sharpen(gray: np.ndarray) -> np.ndarray:
    """PIL ImageFilter.SHARPEN's documented 3×3 kernel
    ((-2,…,32,…,-2)/16), edge-replicated borders."""
    p = np.pad(gray.astype(np.float64), 1, mode="edge")
    out = (32 * p[1:-1, 1:-1]
           - 2 * (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                  + p[1:-1, :-2] + p[1:-1, 2:]
                  + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])) / 16.0
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _gaussian_blur(gray: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur (σ = PIL's ``radius``), edge-replicated.
    Analytic form of PIL's triple-box approximation — the documented
    stand-in since the exact box cascade is an implementation detail."""
    half = max(int(3.0 * sigma + 0.5), 1)
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    h, w = gray.shape
    p = np.pad(gray.astype(np.float64), half, mode="edge")
    # separable passes as k shifted slice-adds each — fully vectorized
    # (same pattern as bilateral_filter), no per-row Python dispatch
    tmp = np.zeros((h + 2 * half, w), dtype=np.float64)
    for i, kv in enumerate(k):
        tmp += kv * p[:, i:i + w]
    out = np.zeros((h, w), dtype=np.float64)
    for i, kv in enumerate(k):
        out += kv * tmp[i:i + h, :]
    return out


def unsharp_mask(gray: np.ndarray, radius: float = 1.0,
                 percent: int = 150, threshold: int = 3) -> np.ndarray:
    """PIL ImageFilter.UnsharpMask(radius, percent, threshold) — the
    reference's STEP 7 edge enhancement for non-binarized output
    (app/ocr_service.py:250-255): sharpen by percent/100 of the
    (image − blur) difference wherever |difference| ≥ threshold."""
    src = gray.astype(np.float64)
    diff = src - _gaussian_blur(gray, radius)
    out = np.where(np.abs(diff) >= threshold,
                   src + diff * (percent / 100.0), src)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _box_mean(gray: np.ndarray, block: int) -> np.ndarray:
    """Local mean over a block×block window via integral image."""
    half = block // 2
    p = np.pad(gray.astype(np.float64), half + 1, mode="edge")
    ii = p.cumsum(axis=0).cumsum(axis=1)
    h, w = gray.shape
    b = 2 * half + 1
    s = (ii[b:b + h, b:b + w] - ii[:h, b:b + w]
         - ii[b:b + h, :w] + ii[:h, :w])
    return s / (b * b)


def clahe(gray: np.ndarray, clip_limit: float = 2.0,
          tiles: int = 8) -> np.ndarray:
    """CLAHE — the cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8))
    algorithm (OpenCV modules/imgproc/src/clahe.cpp) in pure numpy,
    closing the reference's STEP 1 (app/ocr_service.py:174-176):

    - pad bottom/right (border-replicate) to tile multiples;
    - per-tile 256-bin histogram, clipped at
      max(int(clip_limit * tile_area / 256), 1) with the excess
      redistributed uniformly (+ OpenCV's strided residual spread);
    - per-tile LUT = round(cdf * 255 / tile_area);
    - per-pixel bilinear interpolation between the 4 nearest tile LUTs.
    """
    h, w = gray.shape
    th = -(-h // tiles)
    tw = -(-w // tiles)
    p = np.pad(gray, ((0, th * tiles - h), (0, tw * tiles - w)),
               mode="edge")
    tiled = (p.reshape(tiles, th, tiles, tw)
             .transpose(0, 2, 1, 3).reshape(tiles, tiles, th * tw))
    area = th * tw
    clip = max(int(clip_limit * area / 256), 1)
    hist = np.zeros((tiles, tiles, 256), dtype=np.int64)
    for i in range(tiles):
        for j in range(tiles):
            hist[i, j] = np.bincount(tiled[i, j], minlength=256)
    excess = np.maximum(hist - clip, 0).sum(axis=2)
    hist = np.minimum(hist, clip) + (excess // 256)[..., None]
    residual = (excess % 256).astype(np.int64)
    for i in range(tiles):
        for j in range(tiles):
            r = int(residual[i, j])
            if r:                         # OpenCV: stride 256//r, r bins
                hist[i, j, np.arange(0, 256, max(256 // r, 1))[:r]] += 1
    lut = np.clip(np.rint(hist.cumsum(axis=2) * (255.0 / area)),
                  0, 255).astype(np.uint8)

    ty = (np.arange(h) + 0.5) / th - 0.5
    tx = (np.arange(w) + 0.5) / tw - 0.5
    y0 = np.floor(ty).astype(np.int64)
    x0 = np.floor(tx).astype(np.int64)
    fy = (ty - y0)[:, None]
    fx = (tx - x0)[None, :]
    y0c = np.clip(y0, 0, tiles - 1)[:, None]
    y1c = np.clip(y0 + 1, 0, tiles - 1)[:, None]
    x0c = np.clip(x0, 0, tiles - 1)[None, :]
    x1c = np.clip(x0 + 1, 0, tiles - 1)[None, :]
    g = gray.astype(np.int64)
    v00 = lut[y0c, x0c, g].astype(np.float64)
    v01 = lut[y0c, x1c, g].astype(np.float64)
    v10 = lut[y1c, x0c, g].astype(np.float64)
    v11 = lut[y1c, x1c, g].astype(np.float64)
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def bilateral_filter(gray: np.ndarray, d: int = 5,
                     sigma_color: float = 50.0,
                     sigma_space: float = 50.0) -> np.ndarray:
    """cv2.bilateralFilter(img, 5, 50, 50) — the reference's STEP 3 noise
    reduction (app/ocr_service.py:187-189) — in numpy: circular
    d-diameter neighborhood, spatial Gaussian exp(-r²/2σs²) × range
    Gaussian on the intensity difference, border-replicate."""
    r = d // 2
    src = gray.astype(np.float64)
    p = np.pad(src, r, mode="edge")
    cc = -0.5 / (sigma_color * sigma_color)
    sc = -0.5 / (sigma_space * sigma_space)
    num = np.zeros_like(src)
    den = np.zeros_like(src)
    h, w = gray.shape
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            rr = dy * dy + dx * dx
            if rr > r * r:                # OpenCV masks to the disc
                continue
            nb = p[r + dy:r + dy + h, r + dx:r + dx + w]
            wgt = np.exp(sc * rr + cc * (nb - src) ** 2)
            num += wgt * nb
            den += wgt
    return np.clip(np.rint(num / den), 0, 255).astype(np.uint8)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over (N,2) points → hull vertices CCW."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list[np.ndarray] = []
        for q in points:
            while len(out) >= 2 and np.cross(
                    out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect_angle(points: np.ndarray) -> float:
    """Angle of the minimum-area bounding rectangle in OpenCV's legacy
    convention (∈ [-90, 0), what the reference's deskew consumes at
    app/ocr_service.py:229-234 via cv2.minAreaRect(coords)[-1]).
    ``points`` is whatever the caller stacks — the reference passes
    (row, col) pairs from np.where, and this mirrors that contract."""
    hull = _convex_hull(np.asarray(points, dtype=np.float64))
    if len(hull) <= 2:
        return -90.0
    best_area, best_phi = None, 0.0
    edges = np.roll(hull, -1, axis=0) - hull
    for e in edges:
        n = np.hypot(e[0], e[1])
        if n == 0:
            continue
        c, s = e[0] / n, e[1] / n
        u = hull @ np.array([c, s])
        v = hull @ np.array([-s, c])
        span = (u.max() - u.min()) * (v.max() - v.min())
        if best_area is None or span < best_area:
            best_area = span
            best_phi = np.degrees(np.arctan2(s, c)) % 90.0
    return best_phi - 90.0


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> list[np.ndarray]:
    """BiCubic weights for offsets (-1, 0, 1, 2), OpenCV's a=-0.75."""
    def k(x):
        ax = np.abs(x)
        return np.where(
            ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
            np.where(ax < 2,
                     a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                     0.0))
    return [k(t + 1), k(t), k(t - 1), k(t - 2)]


def rotate_image(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """cv2.warpAffine(img, getRotationMatrix2D((w//2, h//2), angle, 1.0),
    (w, h), INTER_CUBIC, BORDER_REPLICATE) — the reference's deskew
    rotation (app/ocr_service.py:237-246) — via inverse mapping + bicubic
    sampling with replicated borders."""
    h, w = img.shape[:2]
    cx, cy = w // 2, h // 2
    th = np.radians(angle_deg)
    cth, sth = np.cos(th), np.sin(th)
    # inverse of the rotation: rotate output coords by -angle about center
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    sx = cth * (xs - cx) - sth * (ys - cy) + cx
    sy = sth * (xs - cx) + cth * (ys - cy) + cy
    ix = np.floor(sx).astype(np.int64)
    iy = np.floor(sy).astype(np.int64)
    wx = _cubic_weights(sx - ix)
    wy = _cubic_weights(sy - iy)
    src = img.astype(np.float64)
    out = np.zeros_like(src)
    for j in range(4):
        row = np.clip(iy + (j - 1), 0, h - 1)
        acc = np.zeros_like(src)
        for i in range(4):
            col = np.clip(ix + (i - 1), 0, w - 1)
            acc += wx[i] * src[row, col]
        out += wy[j] * acc
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def deskew_angle(binary: np.ndarray) -> float:
    """The reference's deskew decision (app/ocr_service.py:227-236):
    white-pixel coords (row, col), legacy minAreaRect angle, then the
    fold  angle < -45 → -(90+angle), else -angle."""
    coords = np.column_stack(np.where(binary > 0))
    if len(coords) == 0:
        return 0.0
    angle = min_area_rect_angle(coords)
    return -(90.0 + angle) if angle < -45 else -angle


def preprocess_image(img: np.ndarray,
                     enhance_level: str = "auto") -> tuple[np.ndarray, dict]:
    """Adaptive OCR-style preprocessing (the O2 surface,
    app/ocr_service.py:135-226) with numpy kernels:

    - light: sharpen only (PIL SHARPEN kernel);
    - medium/aggressive: CLAHE (clipLimit 2.0, 8×8 tiles) for dark or
      low-contrast input, the reference's exact brightness scaling
      (×1.3+30 dark, ×0.8−20 bright), bilateral(5, 50, 50) on the
      aggressive blurry path, then Otsu binarization on the aggressive
      path / local-mean adaptive threshold (block 31, C=10 — box mean
      stands in for cv2's Gaussian window) on the medium low-contrast
      path; the aggressive binarized output is deskewed when the
      minAreaRect angle exceeds 0.5° (STEP 5's 1×1-kernel morphology is
      an identity and stays a no-op).

    Returns (image, decision dict incl. enhance_level, the auto-selected
    PSM, and the clahe/bilateral/deskew_angle decisions)."""
    gray = np.clip(np.rint(to_grayscale(img)), 0, 255).astype(np.uint8)
    quality = analyze_image_quality(gray)
    level = select_enhance_level(quality, enhance_level)
    decisions = quality | {
        "enhance_level": level,
        "psm": determine_psm(gray.shape[1], gray.shape[0]),
        "thresholded": False,
        "clahe": False,
        "bilateral": False,
        "deskew_angle": 0.0,
    }
    if level == "light":
        return _sharpen(gray), decisions

    # STEP 1 (app/ocr_service.py:173-176): CLAHE for low contrast / dark
    out_u8 = gray
    if quality["is_low_contrast"] or quality["is_dark"]:
        out_u8 = clahe(out_u8, clip_limit=2.0, tiles=8)
        decisions["clahe"] = True

    # STEP 2: brightness correction
    out = out_u8.astype(np.float64)
    if quality["is_dark"]:
        out = out * 1.3 + 30           # convertScaleAbs(alpha=1.3, beta=30)
    elif quality["is_bright"]:
        out = out * 0.8 - 20
    # convertScaleAbs = saturate(|alpha*x + beta|): abs BEFORE clipping
    out = np.clip(np.rint(np.abs(out)), 0, 255).astype(np.uint8)

    # STEP 3 (:187-189): bilateral noise reduction, aggressive+blurry only
    if quality["sharpness"] < 100 and level == "aggressive":
        out = bilateral_filter(out, 5, 50.0, 50.0)
        decisions["bilateral"] = True

    if level == "aggressive" and (quality["is_low_contrast"]
                                  or quality["is_dark"]):
        t = otsu_threshold(out)
        out = np.where(out > t, 255, 0).astype(np.uint8)
        decisions["thresholded"] = True
        # STEP 5 morphology uses a 1×1 kernel — an identity, kept as such.
        # STEP 6 (:226-246): deskew the binarized page when warranted
        angle = deskew_angle(out)
        if abs(angle) > 0.5:
            out = rotate_image(out, angle)
            decisions["deskew_angle"] = float(angle)
    elif level == "medium" and quality["is_low_contrast"]:
        local = _box_mean(out, 31) - 10
        out = np.where(out > local, 255, 0).astype(np.uint8)
        decisions["thresholded"] = True

    # STEP 7 (:250-258): final edge enhancement — UnsharpMask for
    # grayscale output, plain SHARPEN for medium binary, nothing for
    # aggressive binary (the reference's exact branch)
    if not decisions["thresholded"]:
        out = unsharp_mask(out, radius=1.0, percent=150, threshold=3)
    elif level == "medium":
        out = _sharpen(out)
    return out, decisions


def encode_tiff_g4(frames: list[np.ndarray]) -> bytes:
    """Bilevel frames (0=white, nonzero=black) → CCITT Group 4 TIFF
    (Compression=4, BitsPerSample=1, PhotometricInterpretation=0
    MinIsWhite — the fax-standard layout).  Fixture writer proving
    decode_tiff's G4 branch round-trips."""
    from .ccitt import encode_g4

    if not frames:
        raise ValueError("need at least one frame")
    out = bytearray(b"II*\x00")
    strips = [encode_g4(np.asarray(a)) for a in frames]
    body = bytearray()
    offs = []
    base = 8
    for s in strips:
        offs.append(base + len(body))
        body += s
    ifd_start = base + len(body)
    n_entries = 10
    ifd_size = 2 + 12 * n_entries + 4
    out += struct.pack("<I", ifd_start)
    out += body
    for k, a in enumerate(frames):
        h, w = np.asarray(a).shape
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
            (259, 3, 1, 4),                       # CCITT Group 4
            (262, 3, 1, 0),                       # MinIsWhite
            (273, 4, 1, offs[k]),
            (277, 3, 1, 1),
            (278, 3, 1, h),
            (279, 4, 1, len(strips[k])),
            (284, 3, 1, 1),
        ]
        ifd = struct.pack("<H", n_entries)
        for tag, typ, cnt, val in entries:
            packed = (struct.pack("<HH", val, 0) if typ == 3
                      else struct.pack("<I", val))
            ifd += struct.pack("<HHI4s", tag, typ, cnt, packed)
        nxt = (ifd_start + (k + 1) * ifd_size
               if k + 1 < len(frames) else 0)
        ifd += struct.pack("<I", nxt)
        out += ifd
    return bytes(out)
