"""WebP lossless (VP8L) codec — pure Python, same discipline as the
PNG/JPEG/TIFF encoders in this package.

Closes the reference's thumbnail output-format triple: the reference
emits PNG/JPEG/WEBP thumbnails (app/thumbnail_generator.py:60,80,229 —
PIL handles the encode there); this engine now encodes lossless VP8L
(RFC 9649 §3, the WebP lossless bitstream) and decodes its own subset.

Encoder envelope: ARGB stream with per-channel canonical prefix codes
(simple 1/2-symbol codes where a channel is near-constant, normal
DEFLATE-style code-length-coded Huffman otherwise); ``backrefs=True``
adds LZ77 backward references (dist-1 runs + copy-row-above),
``subtract_green=True`` / ``palette=True`` emit those two §3.4
transforms (palette indices bit-bundled below 17 colors).  Every
emitted feature is spec-conformant, so any compliant WebP decoder
reads the output.

Decoder envelope: VP8L with color cache, LZ77 backward references
(full length/distance prefix scheme + the 120-entry 2-D neighbor
distance map) and ALL FOUR §3.4 transforms — predictor (14 modes,
sequential inverse bounded by ``MAX_PREDICTOR_PIXELS``), color
transform (sign-extended int8 deltas), subtract-green, and color
indexing with bit bundling — applied in reverse read order with the
packed-width bookkeeping bundling requires.  The predictor edge rules
follow the spec's contiguous-row addressing (rightmost-column TR =
first pixel of the current row) and every mode is pinned by
channel-wise reference vectors in tests.  Meta prefix codes (the
entropy-image code-group tiling) decode through a bounded slow path.
The ONLY remaining gap is lossy-VP8 pixel decode (a full intra video
codec — out of scope); ``parse_webp_meta`` recovers its dimensions
as metadata-only rows (the audio-codec precedent).
"""

from __future__ import annotations

import struct

import numpy as np

from .images import ImageDecodeError, UnsupportedImageError

# kCodeLengthCodeOrder — the storage order of the code-length code's own
# lengths (RFC 9649 §3.7.1.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
             9, 10, 11, 12, 13, 14, 15, 16]
_GREEN_ALPHABET = 256 + 24          # literals + length codes (cache 0)
_DIST_ALPHABET = 40
_CACHE_MULT = 0x1E35A7BD
# decode envelope: ~4M pixels (2048×2048) ≈ 8 s of pure-Python pixel
# loop — beyond that the decoder raises honestly instead of stalling
# an executor task for minutes on a crafted or merely huge file
MAX_DECODE_PIXELS = 1 << 22
_MAX_LZ77_LENGTH = 4096


def _build_dist_map() -> list[tuple[int, int]]:
    """The 120-entry 2-D neighbor map for short distance codes
    (RFC 9649 §3.7.2.3).  Generated, not transcribed: candidates are
    (x, y) with y=0, 1≤x≤8 plus 1≤y≤7, −7≤x≤8, ordered by squared
    euclidean distance, ties broken by larger y first, then smaller
    |x|, positive x before negative — this reproduces the spec's
    listed table exactly (spot-pinned in tests at both ends and at
    every distance-tie boundary)."""
    cand = [(x, 0) for x in range(1, 9)]
    cand += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                             abs(p[0]), 0 if p[0] > 0 else 1))
    return cand


_DIST_MAP = _build_dist_map()
assert len(_DIST_MAP) == 120 and _DIST_MAP[0] == (0, 1) \
    and _DIST_MAP[1] == (1, 0) and _DIST_MAP[119] == (8, 7)


def _lz77_prefix_value(code: int, read_extra) -> int:
    """LZ77 length/distance prefix code → value (RFC 9649 §3.7.2.2):
    codes 0–3 are literal values 1–4; beyond that each code pair
    doubles the range with (code−2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + read_extra(extra) + 1


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of ``_lz77_prefix_value``: value → (prefix_code,
    extra_bits, extra_value)."""
    if value < 5:
        return value - 1, 0, 0
    x = value - 1
    hb = x.bit_length() - 1
    second = (x >> (hb - 1)) & 1
    return 2 * hb + second, hb - 1, x & ((1 << (hb - 1)) - 1)


# -- bit i/o (LSB-first stream, prefix-code bits written MSB-first) ----------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        # prefix-code bits go most-significant-first into the LSB-first
        # stream (the DEFLATE convention VP8L shares)
        for b in range(length - 1, -1, -1):
            self.write((code >> b) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = self.n = 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ImageDecodeError("VP8L bitstream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v


# -- canonical prefix codes ---------------------------------------------------

def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Code lengths for a canonical Huffman code over ``freqs`` (0 =
    unused symbol), length-limited by frequency-flattening rebuilds.
    Needs ≥2 used symbols (callers route 0/1/2-symbol cases to simple
    codes or pad)."""
    import heapq

    f = [int(x) for x in freqs]
    while True:
        heap = [(w, i, ("leaf", i)) for i, w in enumerate(f) if w > 0]
        heapq.heapify(heap)
        tiebreak = len(f)
        while len(heap) > 1:
            w1, _, t1 = heapq.heappop(heap)
            w2, _, t2 = heapq.heappop(heap)
            heapq.heappush(heap, (w1 + w2, tiebreak, ("node", t1, t2)))
            tiebreak += 1
        lengths = [0] * len(f)

        def walk(tree, depth):
            stack = [(tree, depth)]
            while stack:
                t, d = stack.pop()
                if t[0] == "leaf":
                    lengths[t[1]] = max(d, 1)
                else:
                    stack.append((t[1], d + 1))
                    stack.append((t[2], d + 1))

        walk(heap[0][2], 0)
        if max(lengths) <= max_len:
            return lengths
        f = [(x + 1) >> 1 if x > 0 else 0 for x in f]


def _canonical_codes(lengths: list[int]) -> list[int]:
    """RFC 1951 canonical code assignment from lengths."""
    max_l = max(lengths) if lengths else 0
    bl_count = [0] * (max_l + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_l + 2)
    for bits in range(1, max_l + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = [0] * len(lengths)
    for i, ln in enumerate(lengths):
        if ln:
            out[i] = next_code[ln]
            next_code[ln] += 1
    return out


class _PrefixDecoder:
    """Bit-by-bit canonical decoder (puff-style walk)."""

    def __init__(self, lengths: list[int]) -> None:
        used = [(ln, i) for i, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ImageDecodeError("empty prefix code")
        if len(used) == 1:
            self.single: int | None = used[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {(ln, codes[i]): i
                      for i, ln in enumerate(lengths) if ln > 0}
        # completeness check: an over/under-subscribed code is corrupt
        kraft = sum(1 / (1 << ln) for ln, _ in used)
        if abs(kraft - 1.0) > 1e-9:
            raise ImageDecodeError("incomplete prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while length <= 15:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ImageDecodeError("prefix code walk exceeded 15 bits")

    def build_fast(self) -> None:
        """One-level lookup table (zlib-style): index = the next
        ``max_len`` stream bits MSB-first → (symbol, code length)."""
        if self.single is not None:
            self.max_len = 0
            return
        self.max_len = max(ln for ln, _ in self.table)
        size = 1 << self.max_len
        self.fsym = np.full(size, -1, dtype=np.int32)
        self.flen = np.zeros(size, dtype=np.int32)
        for (ln, code), sym in self.table.items():
            lo = code << (self.max_len - ln)
            hi = (code + 1) << (self.max_len - ln)
            self.fsym[lo:hi] = sym
            self.flen[lo:hi] = ln


# -- encoder ------------------------------------------------------------------

def _write_prefix_code(bw: _BitWriter, freqs: list[int]
                       ) -> tuple[list[int], list[int]]:
    """Serialize one prefix code chosen from ``freqs`` (simple for ≤2
    used symbols, normal code-length-coded otherwise); returns (codes,
    lengths) for the payload writer."""
    used = [i for i, f in enumerate(freqs) if f > 0]
    if len(used) <= 2 and (len(used) < 2 or max(used) <= 255):
        syms = used or [0]
        bw.write(1, 1)                        # simple
        bw.write(len(syms) - 1, 1)            # num_symbols - 1
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)                    # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)                    # 8-bit first symbol
            bw.write(first, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        lengths = [0] * len(freqs)
        for s in syms:
            lengths[s] = 1
        codes = [0] * len(freqs)
        if len(syms) == 2:
            codes[syms[0]], codes[syms[1]] = 0, 1
            return codes, lengths
        # single symbol: zero-bit code
        return codes, [0] * len(freqs)

    lengths = _huffman_lengths(freqs, 15)
    codes = _canonical_codes(lengths)

    bw.write(0, 1)                            # normal code
    cl_freq = [0] * 19
    for ln in lengths:
        cl_freq[ln] += 1
    if sum(1 for f in cl_freq if f > 0) == 1:
        # pad a never-emitted second symbol so the code-length code is
        # Kraft-complete (two 1-bit codes) instead of a lone length
        only = next(i for i, f in enumerate(cl_freq) if f > 0)
        cl_lengths = [0] * 19
        cl_lengths[only] = 1
        cl_lengths[0 if only != 0 else 1] = 1
    else:
        cl_lengths = _huffman_lengths(cl_freq, 7)
    cl_codes = _canonical_codes(cl_lengths)

    num_cl = max(i for i, s in enumerate(_CL_ORDER)
                 if cl_lengths[s] > 0) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)                            # no max_symbol shortcut
    for ln in lengths:                        # literal lengths, no RLE
        bw.write_code(cl_codes[ln], cl_lengths[ln])
    return codes, lengths


def _riff_wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _finish_backref_encode(bw: _BitWriter, g, r, b, a,
                           h: int, w: int) -> bytes:
    """LZ77 token path: greedy dist-1 (horizontal run) and dist-width
    (copy-row-above) detection, then bit-serial emission.  Opt-in —
    the literal path stays vectorized and byte-stable for the pinned
    thumbnail goldens."""
    n = h * w
    px = np.stack([c.ravel() for c in (g, r, b, a)], axis=-1)
    eq1 = np.zeros(n, dtype=bool)
    if n > 1:
        eq1[1:] = np.all(px[1:] == px[:-1], axis=1)
    eqw = np.zeros(n, dtype=bool)
    if n > w:
        eqw[w:] = np.all(px[w:] == px[:-w], axis=1)
    eq1 = eq1.tolist()
    eqw = eqw.tolist()
    pxl = px.tolist()

    tokens: list[tuple[int, int]] = []   # (0, pixel_idx) | (1|2, length)
    i = 0
    while i < n:
        if eq1[i]:                        # dist 1: horizontal run
            j = i
            while j < n and eq1[j] and j - i < _MAX_LZ77_LENGTH:
                j += 1
            tokens.append((1, j - i))
            i = j
        elif eqw[i]:                      # dist w: copy the row above
            j = i
            while j < n and eqw[j] and j - i < _MAX_LZ77_LENGTH:
                j += 1
            tokens.append((2, j - i))
            i = j
        else:
            tokens.append((0, i))
            i += 1

    freq_g = [0] * _GREEN_ALPHABET
    freq_r = [0] * 256
    freq_b = [0] * 256
    freq_a = [0] * 256
    freq_d = [0] * _DIST_ALPHABET
    for kind, v in tokens:
        if kind == 0:
            gg, rr, bb, aa = pxl[v]
            freq_g[gg] += 1
            freq_r[rr] += 1
            freq_b[bb] += 1
            freq_a[aa] += 1
        else:
            code, _, _ = _lz77_prefix_encode(v)
            freq_g[256 + code] += 1
            # dist 1 → dist_code 2 → prefix sym 1; dist w → dist_code 1
            # → prefix sym 0 (2-D neighbor plane codes (1,0) and (0,1))
            freq_d[1 if kind == 1 else 0] += 1
    if not any(freq_d):
        freq_d[0] = 1                     # unused but Kraft-valid

    (gc, gl) = _write_prefix_code(bw, freq_g)
    (rc, rl) = _write_prefix_code(bw, freq_r)
    (bc, bl) = _write_prefix_code(bw, freq_b)
    (ac, al) = _write_prefix_code(bw, freq_a)
    (dc, dl) = _write_prefix_code(bw, freq_d)

    for kind, v in tokens:
        if kind == 0:
            gg, rr, bb, aa = pxl[v]
            bw.write_code(gc[gg], gl[gg])
            bw.write_code(rc[rr], rl[rr])
            bw.write_code(bc[bb], bl[bb])
            bw.write_code(ac[aa], al[aa])
        else:
            code, eb, ev = _lz77_prefix_encode(v)
            s = 256 + code
            bw.write_code(gc[s], gl[s])
            bw.write(ev, eb)
            ds = 1 if kind == 1 else 0
            bw.write_code(dc[ds], dl[ds])
    return _riff_wrap(bw.done())


def _encode_subimage(bw: _BitWriter, argbs: list[int]) -> None:
    """Entropy-coded sub-image writer (transform data / palette
    deltas): no color cache, literal-only five-prefix-code stream."""
    bw.write(0, 1)                            # no color cache
    _encode_spatial(bw, argbs)


def _encode_spatial(bw: _BitWriter, argbs: list[int]) -> None:
    """Five prefix codes + literal pixel stream (no cache/meta bits —
    the caller owns the preceding header layout)."""
    chans = [[(v >> 8) & 0xFF for v in argbs],     # g
             [(v >> 16) & 0xFF for v in argbs],    # r
             [v & 0xFF for v in argbs],            # b
             [(v >> 24) & 0xFF for v in argbs]]    # a
    freqs = []
    for k, ch in enumerate(chans):
        fr = [0] * (_GREEN_ALPHABET if k == 0 else 256)
        for v in ch:
            fr[v] += 1
        freqs.append(fr)
    freqs.append([1] + [0] * (_DIST_ALPHABET - 1))
    cl = [_write_prefix_code(bw, fr) for fr in freqs]
    for i in range(len(argbs)):
        for k in range(4):
            cd, ln = cl[k]
            v = chans[k][i]
            bw.write_code(cd[v], ln[v])


def encode_webp_lossless(pixels: np.ndarray, *,
                         backrefs: bool = False,
                         subtract_green: bool = False,
                         palette: bool = False) -> bytes:
    """8-bit gray (H,W), LA (H,W,2), RGB (H,W,3) or RGBA (H,W,4)
    array → lossless WebP (VP8L) bytes.  Same accepted shapes as
    ``encode_png``; raises ValueError beyond the 16384-pixel VP8L
    dimension limit.

    ``subtract_green=True`` emits the SUBTRACT_GREEN transform
    (residual r/b channels); ``palette=True`` emits COLOR_INDEXING
    (≤256 unique colors required; indices bit-bundled below 17
    colors) — both real RFC 9649 §3.4 transforms any compliant
    decoder reads, and the honest round-trip exercise for this
    module's inverse-transform path.  The two are mutually exclusive
    here (spec allows it; this encoder keeps the matrix simple).

    Shape contract with decode_webp: the VP8L header's alpha hint is
    set only when some alpha byte != 255, and decode_webp returns
    (H,W,4) only when that hint is set — so an LA/RGBA input whose
    alpha plane is fully opaque round-trips to (H,W,3).  Callers
    comparing round-trips must carry the had-alpha marker out-of-band
    (pixel VALUES are always preserved; only the redundant opaque
    plane is dropped)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        r = g = b = arr
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 2:
        r = g = b = arr[..., 0]
        a = arr[..., 1]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        a = None
    elif arr.ndim == 3 and arr.shape[2] == 4:
        r, g, b, a = (arr[..., i] for i in range(4))
    else:
        raise ValueError("encode_webp_lossless supports (H,W) gray, "
                         "(H,W,2) LA, (H,W,3) RGB or (H,W,4) RGBA")
    h, w = r.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(f"VP8L dimensions out of range: {w}x{h}")
    alpha_used = a is not None and bool(np.any(a != 255))
    if a is None:
        a = np.full((h, w), 255, dtype=np.uint8)

    if subtract_green and palette:
        raise ValueError("subtract_green and palette are mutually "
                         "exclusive in this encoder")

    bw = _BitWriter()
    bw.write(0x2F, 8)                         # VP8L signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)                            # version

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                        # SUBTRACT_GREEN
        r = (r - g).astype(np.uint8)          # uint8 wrap == mod 256
        b = (b - g).astype(np.uint8)
    if palette:
        argb = ((a.astype(np.uint32) << 24)
                | (r.astype(np.uint32) << 16)
                | (g.astype(np.uint32) << 8)
                | b.astype(np.uint32))
        colors = sorted(int(v) for v in np.unique(argb))
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError(
                f"palette encode needs <= 256 unique colors, "
                f"got {n_colors}")
        bw.write(1, 1)
        bw.write(3, 2)                        # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        deltas, prev = [], 0
        for cur in colors:
            dlt = 0
            for sh in (24, 16, 8, 0):
                dlt |= ((((cur >> sh) - (prev >> sh)) & 0xFF) << sh)
            deltas.append(dlt)
            prev = cur
        _encode_subimage(bw, deltas)
        idx = np.searchsorted(np.asarray(colors, np.uint32),
                              argb).astype(np.uint8)
        width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                      else 1 if n_colors <= 16 else 0)
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            pw = (w + per - 1) // per
            padded = np.zeros((h, pw * per), np.uint32)
            padded[:, :w] = idx
            weights = (1 << (np.arange(per) * bpp)).astype(np.uint32)
            packed = (padded.reshape(h, pw, per)
                      * weights[None, None, :]).sum(axis=2)
            g = packed.astype(np.uint8)
        else:
            g = idx
        r = np.zeros_like(g)
        b = np.zeros_like(g)
        a = np.full_like(g, 255)

    bw.write(0, 1)                            # end of transforms
    bw.write(0, 1)                            # no color cache
    bw.write(0, 1)                            # no meta prefix codes

    ph, pw = g.shape                          # payload (packed) dims
    if backrefs:
        return _finish_backref_encode(bw, g, r, b, a, ph, pw)

    flat = [c.ravel() for c in (g, r, b, a)]  # stream order G,R,B,A
    freq_g = [0] * _GREEN_ALPHABET
    for v, n in zip(*np.unique(flat[0], return_counts=True)):
        freq_g[int(v)] = int(n)
    channel_freqs = [freq_g]
    for ch in flat[1:]:
        fr = [0] * 256
        for v, n in zip(*np.unique(ch, return_counts=True)):
            fr[int(v)] = int(n)
        channel_freqs.append(fr)
    channel_freqs.append([1] + [0] * (_DIST_ALPHABET - 1))  # unused dist

    codes_lengths = [_write_prefix_code(bw, fr) for fr in channel_freqs]

    # vectorized payload pack: per-pixel (code, length) for the four
    # interleaved channels → one MSB-first bit expansion → one LSB-first
    # byte pack (np.packbits little = the VP8L/DEFLATE stream order)
    n = ph * pw
    codes = np.empty(4 * n, dtype=np.int64)
    lens = np.empty(4 * n, dtype=np.int64)
    for k, ((cd, ln), ch) in enumerate(zip(codes_lengths[:4], flat)):
        codes[k::4] = np.asarray(cd, dtype=np.int64)[ch]
        lens[k::4] = np.asarray(ln, dtype=np.int64)[ch]
    # chunked bit expansion: the index arrays cost ~25 bytes per
    # payload bit, so expand ~1M codes at a time and keep only the
    # 1-byte-per-bit output — bounds encoder memory on large frames
    chunks = []
    CHUNK = 1 << 20
    for c0 in range(0, 4 * n, CHUNK):
        cc = codes[c0:c0 + CHUNK]
        cl = lens[c0:c0 + CHUNK]
        total_c = int(cl.sum())
        sym_idx = np.repeat(np.arange(len(cc)), cl)
        starts = np.cumsum(cl) - cl
        j = np.arange(total_c) - starts[sym_idx]    # bit pos within code
        shift = cl[sym_idx] - 1 - j
        chunks.append(((cc[sym_idx] >> shift) & 1).astype(np.uint8))
    payload_bits = (np.concatenate(chunks) if chunks
                    else np.zeros(0, dtype=np.uint8))
    pending = np.array([(bw.acc >> k) & 1 for k in range(bw.n)],
                       dtype=np.uint8)
    bw.acc = bw.n = 0
    head = bytes(bw.buf)
    packed = np.packbits(np.concatenate([pending, payload_bits]),
                         bitorder="little")
    payload = head + packed.tobytes()
    return _riff_wrap(payload)


# -- decoder ------------------------------------------------------------------

def _decode_subimage(br: _BitReader, w: int, h: int) -> list[int]:
    """Entropy-coded sub-image (transform data / palettes, RFC 9649
    §3.4): its own optional color cache + five prefix codes + pixel
    stream with LZ77 backrefs, decoded through the slow bit-by-bit
    path (sub-images are tiny — predictor/color-transform block grids
    and ≤256-entry palettes).  Returns ARGB ints in scan order."""
    cache_bits = 0
    cache: list[int] | None = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ImageDecodeError(f"bad color-cache size {cache_bits}")
        cache = [0] * (1 << cache_bits)
    green_alpha = _GREEN_ALPHABET + ((1 << cache_bits) if cache_bits
                                     else 0)
    dec_g = _read_prefix_code(br, green_alpha)
    dec_r = _read_prefix_code(br, 256)
    dec_b = _read_prefix_code(br, 256)
    dec_a = _read_prefix_code(br, 256)
    dec_d = _read_prefix_code(br, _DIST_ALPHABET)

    n = w * h
    out: list[int] = []
    while len(out) < n:
        s = dec_g.read(br)
        if s < 256:
            g = s
            r = dec_r.read(br)
            b = dec_b.read(br)
            a = dec_a.read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            out.append(argb)
        elif s < _GREEN_ALPHABET:
            length = _lz77_prefix_value(s - 256, br.read)
            dist_code = _lz77_prefix_value(dec_d.read(br), br.read)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            i = len(out)
            if dist > i or i + length > n:
                raise ImageDecodeError(
                    "sub-image backward reference out of range")
            for k in range(length):
                out.append(out[i - dist + k])
            if cache is not None:
                for argb in out[i:i + length]:
                    cache[(_CACHE_MULT * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
            continue
        else:
            out.append(cache[s - _GREEN_ALPHABET])
            continue
        if cache is not None:
            cache[(_CACHE_MULT * argb & 0xFFFFFFFF)
                  >> (32 - cache_bits)] = argb
    return out


def _read_prefix_code(br: _BitReader, alphabet_size: int
                      ) -> _PrefixDecoder:
    if br.read(1):                            # simple code
        lengths = [0] * alphabet_size
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ImageDecodeError("simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise ImageDecodeError("simple-code symbol out of range")
            if s1 == s0:
                # a duplicate second symbol would leave one used length
                # and silently degrade to a 0-bit single-symbol code —
                # reject the stream as corrupt instead of misdecoding
                raise ImageDecodeError("simple-code duplicate symbol")
            lengths[s1] = 1
        if num_symbols == 1:
            lengths = [0] * alphabet_size
            lengths[s0] = 1
            dec = _PrefixDecoder.__new__(_PrefixDecoder)
            dec.single = s0
            dec.table = {}
            return dec
        return _PrefixDecoder(lengths)

    cl_lengths = [0] * 19
    num_cl = 4 + br.read(4)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)

    if br.read(1):                            # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            slot = code_len - 16
            repeat = br.read((2, 3, 7)[slot]) + (3, 3, 11)[slot]
            fill = prev_len if code_len == 16 else 0
            if symbol + repeat > alphabet_size:
                raise ImageDecodeError("code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixDecoder(lengths)


def _slow_pixels(br: _BitReader, w: int, h: int, groups: list[tuple],
                 entropy_idx: list[int], etw: int, meta_sb: int,
                 cache: list[int] | None, cache_bits: int) -> bytearray:
    """Per-pixel main-image decode with meta-prefix group selection
    (the slow bit-by-bit path, bounded by the caller's envelope).
    Returns the RGBA bytearray the shared transform tail consumes."""
    n = w * h
    out = bytearray(4 * n)
    i = 0
    while i < n:
        y, x = divmod(i, w)
        gg, gr, gb, ga, gd = groups[
            entropy_idx[(y >> meta_sb) * etw + (x >> meta_sb)]]
        s = gg.read(br)
        if s < 256:
            g = s
            r = gr.read(br)
            b = gb.read(br)
            a = ga.read(br)
        elif s < _GREEN_ALPHABET:
            length = _lz77_prefix_value(s - 256, br.read)
            dist_code = _lz77_prefix_value(gd.read(br), br.read)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n:
                raise ImageDecodeError(
                    "VP8L backward reference out of range")
            src = (i - dist) * 4
            dst = i * 4
            end = dst + length * 4
            while dst < end:
                chunk = min(dst - src, end - dst)
                out[dst:dst + chunk] = out[src:src + chunk]
                dst += chunk
            if cache is not None:
                for k in range(i, i + length):
                    b4 = 4 * k
                    argb = ((out[b4 + 3] << 24) | (out[b4] << 16)
                            | (out[b4 + 1] << 8) | out[b4 + 2])
                    cache[(_CACHE_MULT * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
            i += length
            continue
        else:
            argb = cache[s - _GREEN_ALPHABET]
            g = (argb >> 8) & 0xFF
            r = (argb >> 16) & 0xFF
            b = argb & 0xFF
            a = (argb >> 24) & 0xFF
        base = 4 * i
        out[base] = r
        out[base + 1] = g
        out[base + 2] = b
        out[base + 3] = a
        if cache is not None:
            argb = (a << 24) | (r << 16) | (g << 8) | b
            cache[(_CACHE_MULT * argb & 0xFFFFFFFF)
                  >> (32 - cache_bits)] = argb
        i += 1
    return out


# -- inverse transforms (RFC 9649 §3.4) --------------------------------------

# predictor envelope: the mode dispatch is a per-pixel Python loop —
# bounded honestly rather than stalling a task on a huge frame
MAX_PREDICTOR_PIXELS = 1 << 20


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    img[..., 0] += img[..., 1]          # uint8 wrap == mod 256
    img[..., 2] += img[..., 1]
    return img


def _inv_color_transform(img: np.ndarray, sb: int, tdata: list[int],
                         tw: int) -> np.ndarray:
    """Per-block ColorTransformElement inverse: red += Δ(g2r, green);
    blue += Δ(g2b, green) + Δ(r2b, new_red); Δ(t, c) = (int8 t ×
    int8 c) >> 5 (arithmetic shift — Python's >> on negatives)."""
    h, w = img.shape[:2]
    bx = (np.arange(w) >> sb)
    by = (np.arange(h) >> sb)
    cte = np.array(tdata, dtype=np.uint32)[by[:, None] * tw
                                           + bx[None, :]]

    def s8(v):
        return v.astype(np.uint8).astype(np.int8).astype(np.int32)

    g2r = s8(cte & 0xFF)                # stored in the blue channel
    g2b = s8((cte >> 8) & 0xFF)         # green channel
    r2b = s8((cte >> 16) & 0xFF)        # red channel
    g = s8(img[..., 1].astype(np.uint32))
    red = (img[..., 0].astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    blue = (img[..., 2].astype(np.int32) + ((g2b * g) >> 5)
            + ((r2b * s8(red.astype(np.uint32))) >> 5)) & 0xFF
    img[..., 0] = red.astype(np.uint8)
    img[..., 2] = blue.astype(np.uint8)
    return img


def _inv_color_indexing(img: np.ndarray, palette: list[int],
                        n_colors: int, width_bits: int,
                        full_w: int) -> np.ndarray:
    """Green-channel palette indices (bit-bundled when ≤16 colors) →
    full-width ARGB rows."""
    h = img.shape[0]
    idx = img[:, :, 1].astype(np.int32)
    if width_bits:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        xs = np.arange(full_w)
        src = idx[:, xs >> width_bits]
        shifts = ((xs & (per - 1)) * bpp).astype(np.int32)
        vals = (src >> shifts[None, :]) & ((1 << bpp) - 1)
    else:
        vals = idx[:, :full_w]
    # RFC 9649: indices >= color_table_size decode as 0x00000000
    # (transparent black), not an error
    pal = np.array(palette + [0], dtype=np.uint32)
    argb = pal[np.minimum(vals, len(palette))]
    out = np.empty((h, full_w, 4), np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    out[..., 3] = (argb >> 24) & 0xFF
    return out


_HI = 0xFF00FF00
_LO = 0x00FF00FF


def _padd(x: int, y: int) -> int:
    """Per-channel (a,r,g,b) addition mod 256 on packed ARGB ints."""
    return ((((x & _HI) + (y & _HI)) & _HI)
            | (((x & _LO) + (y & _LO)) & _LO))


def _pavg(x: int, y: int) -> int:
    """Per-channel floor average on packed ARGB ints."""
    return (((x ^ y) & 0xFEFEFEFE) >> 1) + (x & y)


def _psel(L: int, T: int, TL: int) -> int:
    pT = pL = 0
    for sh in (24, 16, 8, 0):
        lc = (L >> sh) & 0xFF
        tc = (T >> sh) & 0xFF
        cc = (TL >> sh) & 0xFF
        p = lc + tc - cc
        pT += abs(p - tc)
        pL += abs(p - lc)
    return T if pT <= pL else L


def _pcaf(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _pcah(av: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (av >> sh) & 0xFF
        b = (TL >> sh) & 0xFF
        q = a - b
        half = (q // 2) if q >= 0 else -((-q) // 2)   # C truncation
        v = a + half
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _inv_predictor(img: np.ndarray, sb: int, tdata: list[int],
                   tw: int) -> np.ndarray:
    """Sequential predictor inverse.  Edge rules per the spec /
    libwebp's contiguous-row addressing: (0,0) predicts opaque black,
    the rest of row 0 predicts L, column 0 predicts T, and TR for the
    rightmost column is ``out[i - w + 1]`` — which by contiguity is
    the FIRST pixel of the current row."""
    h, w = img.shape[:2]
    res = ((img[..., 3].astype(np.uint32) << 24)
           | (img[..., 0].astype(np.uint32) << 16)
           | (img[..., 1].astype(np.uint32) << 8)
           | img[..., 2].astype(np.uint32)).ravel().tolist()
    out = res
    for y in range(h):
        base = y * w
        trow = (y >> sb) * tw
        for x in range(w):
            i = base + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (tdata[trow + (x >> sb)] >> 8) & 0xFF
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = out[i - 1]
                elif mode == 2:
                    pred = out[i - w]
                elif mode == 3:
                    pred = out[i - w + 1]
                elif mode == 4:
                    pred = out[i - w - 1]
                elif mode == 5:
                    pred = _pavg(_pavg(out[i - 1], out[i - w + 1]),
                                 out[i - w])
                elif mode == 6:
                    pred = _pavg(out[i - 1], out[i - w - 1])
                elif mode == 7:
                    pred = _pavg(out[i - 1], out[i - w])
                elif mode == 8:
                    pred = _pavg(out[i - w - 1], out[i - w])
                elif mode == 9:
                    pred = _pavg(out[i - w], out[i - w + 1])
                elif mode == 10:
                    pred = _pavg(_pavg(out[i - 1], out[i - w - 1]),
                                 _pavg(out[i - w], out[i - w + 1]))
                elif mode == 11:
                    pred = _psel(out[i - 1], out[i - w],
                                 out[i - w - 1])
                elif mode == 12:
                    pred = _pcaf(out[i - 1], out[i - w],
                                 out[i - w - 1])
                elif mode == 13:
                    pred = _pcah(_pavg(out[i - 1], out[i - w]),
                                 out[i - w - 1])
                else:
                    raise ImageDecodeError(
                        f"invalid predictor mode {mode}")
            out[i] = _padd(out[i], pred)
    arr = np.array(out, dtype=np.uint32).reshape(h, w)
    img[..., 0] = ((arr >> 16) & 0xFF).astype(np.uint8)
    img[..., 1] = ((arr >> 8) & 0xFF).astype(np.uint8)
    img[..., 2] = (arr & 0xFF).astype(np.uint8)
    img[..., 3] = ((arr >> 24) & 0xFF).astype(np.uint8)
    return img


def _apply_inverse_transforms(img: np.ndarray,
                              transforms: list[tuple]) -> np.ndarray:
    """Reverse-read-order inverse application (shared by the fast and
    meta-prefix decode paths)."""
    for t in reversed(transforms):
        if t[0] == 0:
            img = _inv_predictor(img, t[2], t[3], t[4])
        elif t[0] == 1:
            img = _inv_color_transform(img, t[2], t[3], t[4])
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        else:
            img = _inv_color_indexing(img, t[2], t[3], t[4], t[1])
    return img


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes → uint8 (H,W,3) RGB, or (H,W,4) RGBA when the alpha
    hint is set.  Full VP8L: color cache, LZ77 backward references,
    all four transforms, meta prefix codes (bounded slow path).
    Lossy VP8 / extended VP8X containers raise
    ``UnsupportedImageError`` (use ``parse_webp_meta`` for their
    dimensions)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ImageDecodeError("missing RIFF/WEBP signature")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ImageDecodeError("truncated WebP chunk")
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise UnsupportedImageError(
                f"webp variant {fourcc.decode().strip()} not supported "
                f"(lossless VP8L only)")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ImageDecodeError("no VP8L chunk")

    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ImageDecodeError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ImageDecodeError("unknown VP8L version")
    if h * w > MAX_DECODE_PIXELS:
        # envelope check BEFORE any sub-image decode: a crafted header
        # can declare 16384² pixels and then feed huge transform
        # sub-images — reject on the declared dims, not after burning
        # CPU in the slow path (decode-bomb discipline)
        raise UnsupportedImageError(
            f"VP8L image {w}x{h} exceeds the {MAX_DECODE_PIXELS}-pixel "
            f"pure-python decode envelope")

    # transforms (RFC 9649 §3.4): read in stream order, inverses
    # applied in REVERSE; each transform's block grid / palette is an
    # entropy-coded sub-image sized by the image width AT ITS READ
    # TIME (color-indexing with bit bundling shrinks the width for
    # everything read after it)
    transforms: list[tuple] = []      # (type, read_time_w, *params)
    seen_t: set[int] = set()
    w_cur = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_t:
            raise ImageDecodeError("duplicate VP8L transform")
        seen_t.add(ttype)
        if ttype in (0, 1):
            sb = br.read(3) + 2
            tw = (w_cur + (1 << sb) - 1) >> sb
            th = (h + (1 << sb) - 1) >> sb
            if tw * th > MAX_PREDICTOR_PIXELS:
                # slow-path sub-image: cap commensurate with real
                # block grids (≤ image_pixels / 16)
                raise UnsupportedImageError(
                    "transform sub-image beyond decode envelope")
            if ttype == 0 and h * w_cur > MAX_PREDICTOR_PIXELS:
                raise UnsupportedImageError(
                    f"predictor transform image {w_cur}x{h} exceeds "
                    f"the {MAX_PREDICTOR_PIXELS}-pixel pure-python "
                    f"envelope")
            tdata = _decode_subimage(br, tw, th)
            transforms.append((ttype, w_cur, sb, tdata, tw))
        elif ttype == 2:
            transforms.append((2, w_cur))
        else:
            n_colors = br.read(8) + 1
            deltas = _decode_subimage(br, n_colors, 1)
            palette, prev = [], 0
            for dlt in deltas:
                cur = 0
                for sh in (24, 16, 8, 0):
                    cur |= ((((prev >> sh) + (dlt >> sh)) & 0xFF)
                            << sh)
                palette.append(cur)
                prev = cur
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append((3, w_cur, palette, n_colors,
                               width_bits))
            if width_bits:
                w_cur = (w_cur + (1 << width_bits) - 1) >> width_bits

    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ImageDecodeError(f"bad color-cache size {cache_bits}")
        cache = [0] * (1 << cache_bits)

    # meta prefix codes (RFC 9649 §3.7.1.1): an entropy image maps
    # each block to one of several prefix-code GROUPS; meta-bearing
    # images decode through the slow per-pixel path, bounded by the
    # predictor envelope (the fast segmented machinery assumes one
    # code group for the whole stream)
    entropy_idx = None
    meta_sb = etw = 0
    if br.read(1):
        meta_sb = br.read(3) + 2
        etw = (w_cur + (1 << meta_sb) - 1) >> meta_sb
        eth = (h + (1 << meta_sb) - 1) >> meta_sb
        if etw * eth > MAX_PREDICTOR_PIXELS:
            raise UnsupportedImageError(
                "entropy image beyond decode envelope")
        if h * w_cur > MAX_PREDICTOR_PIXELS:
            raise UnsupportedImageError(
                f"meta-prefix image {w_cur}x{h} exceeds the "
                f"{MAX_PREDICTOR_PIXELS}-pixel slow-path envelope")
        eimg = _decode_subimage(br, etw, eth)
        entropy_idx = [(v >> 8) & 0xFFFF for v in eimg]

    green_alpha = _GREEN_ALPHABET + (1 << cache_bits if cache_bits else 0)
    if entropy_idx is not None:
        groups = []
        for _ in range(max(entropy_idx) + 1):
            groups.append((_read_prefix_code(br, green_alpha),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, _DIST_ALPHABET)))
        out = _slow_pixels(br, w_cur, h, groups, entropy_idx, etw,
                           meta_sb, cache, cache_bits)
        img = np.frombuffer(bytes(out), dtype=np.uint8) \
            .reshape(h, w_cur, 4).copy()
        img = _apply_inverse_transforms(img, transforms)
        return img if alpha_used else img[..., :3].copy()

    dec_g = _read_prefix_code(br, green_alpha)
    dec_r = _read_prefix_code(br, 256)
    dec_b = _read_prefix_code(br, 256)
    dec_a = _read_prefix_code(br, 256)
    dec_d = _read_prefix_code(br, _DIST_ALPHABET)

    if h * w > MAX_DECODE_PIXELS:
        # pure-Python decode envelope: a crafted header can declare up
        # to 16384² (268M) pixels against a tiny payload — without a
        # cap that is a decode bomb (minutes of CPU + GBs of output
        # buffer) on every arbitrary-payload media path
        raise UnsupportedImageError(
            f"VP8L image {w}x{h} exceeds the {MAX_DECODE_PIXELS}-pixel "
            f"pure-python decode envelope")

    # table-based symbol reads over SEGMENTED window lists: window
    # values are precomputed vectorized per ~256k-bit segment and
    # converted to plain-Python lists for the hot loop (list indexing
    # is ~10× numpy scalar indexing), but never for the whole payload
    # at once — full-file Python-int windows cost ~300 bytes per
    # payload BIT, which OOMs executors on multi-MB real-world files
    decoders = (dec_g, dec_r, dec_b, dec_a, dec_d)
    for d in decoders:
        d.build_fast()
    nbits = len(payload) * 8
    max_l = max((d.max_len for d in decoders), default=0)
    lengths_needed = sorted({d.max_len for d in decoders if d.max_len})
    pay_arr = np.frombuffer(payload, dtype=np.uint8)

    SEG_BITS = 1 << 18
    seg_lists: dict[int, list] = {}
    seg_start = -(SEG_BITS + 1)

    def load_segment(start_bit: int) -> None:
        nonlocal seg_start, seg_lists
        seg_start = start_bit
        end_bit = min(start_bit + SEG_BITS, nbits)
        lo_byte = start_bit >> 3
        hi_byte = min((end_bit + max_l + 7) >> 3, len(pay_arr))
        seg_bits = np.unpackbits(pay_arr[lo_byte:hi_byte],
                                 bitorder="little")
        off = start_bit - lo_byte * 8
        count = end_bit - start_bit
        padded = np.concatenate(
            [seg_bits[off:],
             np.zeros(max_l, dtype=np.uint8)]).astype(np.int32)
        seg_lists = {}
        for length in lengths_needed:
            win = np.zeros(count, dtype=np.int32)
            for j in range(length):
                win = (win << 1) | padded[j:j + count]
            seg_lists[length] = win.tolist()

    pos = br.pos * 8 - br.n
    if max_l:
        load_segment(pos)

    def plan(dec):
        if dec.single is not None:
            return None
        return (dec.max_len, dec.fsym.tolist(), dec.flen.tolist())

    plans = [plan(d) for d in decoders]
    singles = [d.single for d in decoders]

    def read_sym(c: int) -> int:
        """One prefix-coded symbol from decoder ``c`` at ``pos`` (the
        cold-path twin of the inlined literal reads below)."""
        nonlocal pos
        p = plans[c]
        if p is None:
            return singles[c]
        if pos >= nbits:
            raise ImageDecodeError("VP8L pixel stream truncated")
        if pos - seg_start >= SEG_BITS:
            load_segment(pos)
        wv = seg_lists[p[0]][pos - seg_start]
        s = p[1][wv]
        if s < 0:
            raise ImageDecodeError("invalid prefix code in pixel stream")
        pos += p[2][wv]
        return s

    def read_raw(nb: int) -> int:
        """``nb`` raw LSB-first bits at ``pos`` (LZ77 extra bits)."""
        nonlocal pos
        if nb == 0:
            return 0
        if pos + nb > nbits:
            raise ImageDecodeError("VP8L bitstream truncated")
        lo = pos >> 3
        hi = (pos + nb + 7) >> 3
        v = (int.from_bytes(payload[lo:hi], "little")
             >> (pos & 7)) & ((1 << nb) - 1)
        pos += nb
        return v

    n = h * w_cur
    out = bytearray(4 * n)
    i = 0
    while i < n:
        vals = [0, 0, 0, 0]
        copied = False
        for c in range(4):
            p = plans[c]
            if p is None:
                s = singles[c]
            else:
                if pos >= nbits:
                    raise ImageDecodeError("VP8L pixel stream truncated")
                if pos - seg_start >= SEG_BITS:
                    load_segment(pos)
                wv = seg_lists[p[0]][pos - seg_start]
                s = p[1][wv]
                if s < 0:
                    raise ImageDecodeError(
                        "invalid prefix code in pixel stream")
                pos += p[2][wv]
            if c == 0 and s >= 256:
                if s < _GREEN_ALPHABET:
                    # LZ77 backward reference: length from the green
                    # symbol, distance from the distance tree, short
                    # distance codes mapped through the 2-D neighbor
                    # table (RFC 9649 §3.7.2.3)
                    length = _lz77_prefix_value(s - 256, read_raw)
                    dist_code = _lz77_prefix_value(read_sym(4), read_raw)
                    if dist_code > 120:
                        dist = dist_code - 120
                    else:
                        dx, dy = _DIST_MAP[dist_code - 1]
                        dist = dx + dy * w_cur
                        if dist < 1:
                            dist = 1
                    if dist > i or i + length > n:
                        raise ImageDecodeError(
                            "VP8L backward reference out of range")
                    src = (i - dist) * 4
                    dst = i * 4
                    end = dst + length * 4
                    while dst < end:
                        # doubling copy: everything before dst is
                        # written, so overlapping refs replicate the
                        # dist-period pattern correctly
                        chunk = min(dst - src, end - dst)
                        out[dst:dst + chunk] = out[src:src + chunk]
                        dst += chunk
                    if cache is not None:
                        # spec: every produced pixel enters the cache
                        for k in range(i, i + length):
                            b4 = 4 * k
                            argb = ((out[b4 + 3] << 24)
                                    | (out[b4] << 16)
                                    | (out[b4 + 1] << 8) | out[b4 + 2])
                            cache[(_CACHE_MULT * argb & 0xFFFFFFFF)
                                  >> (32 - cache_bits)] = argb
                    i += length
                    copied = True
                    break
                argb = cache[s - _GREEN_ALPHABET]
                # vals layout is (g, r, b, a) — the literal stream order
                vals = [(argb >> 8) & 0xFF, (argb >> 16) & 0xFF,
                        argb & 0xFF, (argb >> 24) & 0xFF]
                break
            vals[c] = s
        if copied:
            continue
        g, r, b, a = vals[0], vals[1], vals[2], vals[3]
        base = 4 * i
        out[base] = r
        out[base + 1] = g
        out[base + 2] = b
        out[base + 3] = a
        if cache is not None:
            argb = (a << 24) | (r << 16) | (g << 8) | b
            cache[(_CACHE_MULT * argb & 0xFFFFFFFF) >> (32 - cache_bits)] \
                = argb
        i += 1
    img = np.frombuffer(bytes(out), dtype=np.uint8) \
        .reshape(h, w_cur, 4).copy()
    img = _apply_inverse_transforms(img, transforms)
    return img if alpha_used else img[..., :3].copy()


def parse_webp_meta(data: bytes) -> dict:
    """Dimensions + variant for ANY WebP container, without pixel
    decode: ``{"variant": "vp8"|"vp8l"|"vp8x", "width", "height"}``.

    The metadata-only path for files outside the pixel-decode envelope
    (lossy VP8, extended VP8X) — the audio-codec precedent: real
    header fields, honest ``metadata_only:*`` rows downstream.
    Raises ``ImageDecodeError`` on malformed containers."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ImageDecodeError("missing RIFF/WEBP signature")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ImageDecodeError("truncated WebP chunk")
        if fourcc == b"VP8L":
            if size < 5 or body[0] != 0x2F:
                raise ImageDecodeError("bad VP8L header")
            br = _BitReader(body)
            br.read(8)
            w = br.read(14) + 1
            h = br.read(14) + 1
            return {"variant": "vp8l", "width": w, "height": h}
        if fourcc == b"VP8 ":
            # RFC 6386 §9.1: 3-byte frame tag; keyframes carry the
            # 9D 01 2A start code then 14-bit width/height (upper two
            # bits of each 16-bit LE field are the rescale hints)
            if size < 10:
                raise ImageDecodeError("truncated VP8 frame header")
            tag = body[0] | (body[1] << 8) | (body[2] << 16)
            if tag & 1:
                raise ImageDecodeError(
                    "VP8 stream starts with an interframe")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ImageDecodeError("bad VP8 keyframe start code")
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return {"variant": "vp8", "width": w, "height": h}
        if fourcc == b"VP8X":
            if size < 10:
                raise ImageDecodeError("truncated VP8X chunk")
            w = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            h = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
            return {"variant": "vp8x", "width": w, "height": h}
        pos += 8 + size + (size & 1)
    raise ImageDecodeError("no VP8/VP8L/VP8X chunk")
