"""Pure-Python baseline JPEG codec (no libjpeg/PIL in this container).

Decoder: sequential baseline DCT (SOF0), 8-bit, grayscale or YCbCr with
any sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart markers,
byte stuffing.  Encoder: the fixture writer (gray or 4:4:4 color, Annex-K
quantization/Huffman tables, quality scaling) proving round-trips.

Validation stance (stated honestly): there is no libjpeg in this
environment to differential-test against, so correctness rests on
(a) the zigzag order and Annex-K tables being copied from the public
spec, (b) the IDCT being checked against the textbook definition in
tests, and (c) encoder↔decoder round-trips within quantization
tolerance on random and structured images.

Reference surface: app/document_processor.py:99-176 decodes JPEG via
PIL; this gives the engine the same capability for feature extraction
and thumbnails (extract/images.py wires it into the media path).
"""

from __future__ import annotations

import struct

import numpy as np

from .images import ImageDecodeError, UnsupportedImageError

# ITU-T T.81 Figure A.6 zigzag order (index: zigzag pos → block pos)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# Annex K.1 quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: spatial = M.T @ coef @ M
_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                for x in range(8)] for u in range(8)])


def idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _build_huffman_codes(bits: list[int],
                         values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int],
                        values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(ln, code): sym
            for sym, (code, ln) in _build_huffman_codes(bits, values).items()}


class _BitReader:
    """MSB-first entropy-coded segment reader with FF00 unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ImageDecodeError("entropy data ran out")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker()
            else:
                raise ImageDecodeError("marker inside entropy data")
        else:
            self.pos += 1
        # mask to live bits first: an unbounded Python-int accumulator
        # would copy its whole history on every shift (quadratic decode)
        self.acc = (((self.acc & ((1 << self.bits) - 1)) << 8) | b)
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume the restart marker and byte-align."""
        self.acc = 0
        self.bits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ImageDecodeError("expected restart marker")


class _RestartMarker(Exception):
    pass


def _decode_huffman(reader: _BitReader,
                    table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ImageDecodeError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG sign extension (T.81 F.12)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (H,W) gray or (H,W,3) RGB."""
    if not data.startswith(b"\xff\xd8"):
        raise ImageDecodeError("missing JPEG SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageDecodeError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI before SOS
            raise ImageDecodeError("no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                            # standalone, no length
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                if p + 65 > len(seg):
                    raise ImageDecodeError("truncated DQT")
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise UnsupportedImageError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1:p + 65],
                                            dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ImageDecodeError("truncated DHT")
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                if p + 17 + n > len(seg):
                    raise ImageDecodeError("truncated DHT")
                values = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), \
                seg[5]
            if precision != 8:
                raise UnsupportedImageError("non-8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ImageDecodeError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, pos + seg_len, frame, scan_tables,
                                qtables, htables, restart_interval)
        pos += seg_len
    raise ImageDecodeError("truncated JPEG")


def _decode_scan(data, pos, frame, scan_tables, qtables, htables,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise UnsupportedImageError("sampling factors beyond 2x2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t = htables.get((0, scan_tables[c["id"]][0]))
                ac_t = htables.get((1, scan_tables[c["id"]][1]))
                q = qtables.get(c["tq"])
                if dc_t is None or ac_t is None or q is None:
                    raise ImageDecodeError("missing Huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            coef = _decode_block(reader, dc_t, ac_t, pred,
                                                 ci)
                        except _RestartMarker as e:
                            raise ImageDecodeError(
                                "unexpected restart marker") from e
                        block = idct2(coef * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ImageDecodeError(f"{len(out_planes)}-component JPEG "
                               "unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_t, ac_t, pred, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.float64)
    size = _decode_huffman(reader, dc_t)
    diff = _extend(reader.read_bits(size), size)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                         # ZRL: 16 zeros
                k += 16
                continue
            break                               # EOB
        k += r
        if k > 63:
            raise ImageDecodeError("AC run past block end")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = zz
    return block.reshape(8, 8)


# -- encoder (fixture writer) --------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.acc &= (1 << self.bits) - 1    # keep the int bounded
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)           # byte stuffing

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)     # 1-fill to byte boundary


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, coef, q, dc_codes, ac_codes, pred, ci) -> None:
    qz = np.rint(coef / q).astype(np.int64)
    # zigzag-order the quantized coefficients
    zz = qz.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(v, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            bw.write(zc, zl)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]
        bw.write(ec, el)


def _block_at(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8×8 tile at (ys, xs), edge-replicated past the plane border."""
    h, w = plane.shape
    yi = np.clip(np.arange(ys, ys + 8), 0, h - 1)
    xi = np.clip(np.arange(xs, xs + 8), 0, w - 1)
    return plane[np.ix_(yi, xi)]


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 box mean with edge replication to even dimensions."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 1::2]) / 4.0


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """8-bit gray (H,W) or RGB (H,W,3) → baseline JPEG (Annex-K tables
    scaled by ``quality``; ``subsampling`` '444' or '420'; optional
    DRI/RSTn markers every ``restart_interval`` MCUs).  Deterministic
    fixture writer."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg takes (H,W) gray or (H,W,3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    sub = subsampling == "420" and not gray
    hv_luma = (2, 2) if sub else (1, 1)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        qmap = [0]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub:
            cb, cr = _downsample2(cb), _downsample2(cr)
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qmap = [0, 1, 1]
        samp = [hv_luma, (1, 1), (1, 1)]

    out = bytearray(b"\xff\xd8")                # SOI
    for tq, tbl in ((0, ql),) + (((1, qc),) if not gray else ()):
        zz = tbl.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zz)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, samp[i][0] << 4 | samp[i][1], qmap[i]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = ((0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)) + (
        ((0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)) if not gray else ())
    for tc, th, (bits, values) in tables:
        payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        tt = 0x00 if i == 0 else 0x11
        sos += bytes([i + 1, tt])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _build_huffman_codes(*HUFF_DC_LUMA)
    ac_l = _build_huffman_codes(*HUFF_AC_LUMA)
    dc_c = _build_huffman_codes(*HUFF_DC_CHROMA)
    ac_c = _build_huffman_codes(*HUFF_AC_CHROMA)
    bw = _BitWriter()
    pred = [0] * nc
    hmax, vmax = hv_luma
    mcus_y, mcus_x = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0
                                 + (mcu_idx // restart_interval - 1) % 8])
                pred = [0] * nc
            mcu_idx += 1
            for ci, plane in enumerate(planes):
                ch, cv = samp[ci]
                q = ql if qmap[ci] == 0 else qc
                codes = (dc_l, ac_l) if qmap[ci] == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        blk = _block_at(plane, (my * cv + by) * 8,
                                        (mx * ch + bx) * 8)
                        _encode_block(bw, dct2(blk), q, codes[0],
                                      codes[1], pred, ci)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                          # EOI
    return bytes(out)
