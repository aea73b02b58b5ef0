"""Arithmetic-coded JPEG (SOF9 sequential + SOF10 progressive, QM coder).

Closes the last reference-visible D2 decode gap that is implementable
in this sandbox: the reference's PIL path decodes arithmetic-coded
JPEGs (reference app/document_processor.py:99-176); here the marker
previously raised ``unsupported JPEG coding process (SOF9)``.

Everything below is implemented from the public ITU-T T.81 spec:

- Annex D QM arithmetic coder (encoder Figures D.3-D.14, decoder
  Figures D.15-D.20) in the spec's own register convention — MPS owns
  the lower subinterval ``[0, A-Qe)``, LPS the upper ``[A-Qe, A)``,
  with conditional exchange when the MPS subinterval shrinks below Qe.
- Table D.3 probability-estimation state machine (113 adaptive states
  + 1 non-adaptive "fixed" state for AC sign decisions), as also
  published in the IJG's jaricom.c.  Encoder and decoder share the one
  table, so any transcription slip in an individual row would not
  break self-consistency (round-trip tests cannot detect it) — only
  interop with other encoders, which this container cannot produce.
- Annex F sequential statistical models: DC diff conditioning on the
  previous diff's category (L/U thresholds), AC conditioning on the
  coefficient index k with the Kx low/high split, magnitude-category
  unary chains and fixed-position mantissa bins.

Byte stuffing follows B.1.1.5 (zero byte after any 0xFF in the
entropy-coded segment); the decoder treats any real marker as
end-of-data and feeds zero bytes, per D.2.2.  Restart markers
re-initialize the coder and all statistics areas.
"""

from __future__ import annotations

import struct

import numpy as np

from .images import ImageDecodeError

# T.81 Table D.3 (public; also IJG jaricom.c): per state
# (Qe, next-state after LPS, next-state after MPS, switch-MPS flag).
# State 113 is the non-adaptive near-uniform bin used for AC signs.
_QE_TAB: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),                  # fixed (non-adaptive) bin
)

_FIXED_STATE = 113
DC_STAT_BINS = 49                           # 5*4 contexts + 14 X + 15 M
AC_STAT_BINS = 245                          # 63*3 + 2*(14 X + 14 M)


def _check_qe_table() -> None:
    """One-time transcription check of the 113 adaptive Table D.3 rows.

    Encoder and decoder SHARE the table, so a transcription slip is
    invisible to every round-trip test (it would break interop with
    real files, not self-consistency).  These constants were computed
    independently from the published IJG jaricom.c values: the CRC
    covers every field of every row; the switch-count 10 is the known
    set of MPS-exchange states {0,14,36,64,80,88,95,105,110,112}.
    """
    import struct
    import zlib

    adaptive = _QE_TAB[:113]
    if len(_QE_TAB) != 114 or sum(r[3] for r in adaptive) != 10:
        raise AssertionError("Table D.3 shape/switch-count mismatch")
    packed = b"".join(struct.pack(">HBBB", *r) for r in adaptive)
    if zlib.crc32(packed) & 0xFFFFFFFF != 0xDAA20A5F:
        raise AssertionError(
            "Table D.3 transcription drifted from the published "
            "jaricom.c values (crc mismatch)")


_check_qe_table()


class _Stats:
    """One conditioning-statistics area: per bin, (state index, MPS)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = [0] * n
        self.mps = [0] * n

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


class ArithEncoder:
    """T.81 Annex D.1 QM encoder over an in-memory byte list (carry
    propagates backward through the list; 0xFF stuffing is a final
    pass, after all carries have resolved)."""

    def __init__(self) -> None:
        self.out: list[int] = []
        self.reset()

    def reset(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11

    def encode(self, d: int, stats: _Stats, bin_: int) -> None:
        i = stats.idx[bin_]
        qe, nlps, nmps, switch = _QE_TAB[i]
        mps = stats.mps[bin_]
        t = self.a - qe
        if d == mps:
            if t & 0x8000:
                self.a = t                  # no renorm, no adaptation
                return
            if t < qe:                      # conditional exchange
                self.c += t
                self.a = qe
            else:
                self.a = t
            if i != _FIXED_STATE:
                stats.idx[bin_] = nmps
        else:
            if t < qe:                      # conditional exchange
                self.a = t
            else:
                self.c += t
                self.a = qe
            if i != _FIXED_STATE:
                if switch:
                    stats.mps[bin_] = 1 - mps
                stats.idx[bin_] = nlps
        while self.a < 0x8000:              # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # propagate the carry into already-emitted bytes
            j = len(self.out) - 1
            while j >= 0 and self.out[j] == 0xFF:
                self.out[j] = 0x00
                j -= 1
            if j < 0:
                raise AssertionError("carry out of arithmetic stream")
            self.out[j] += 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """D.1.8 FLUSH: clear as many C bits as possible, emit the
        final bytes, and return the stuffed entropy segment."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        # drop trailing zero bytes (D.1.8 allows it; the decoder feeds
        # zeros past the marker anyway) but keep at least one byte
        while self.out and self.out[-1] == 0x00:
            self.out.pop()
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


class ArithDecoder:
    """T.81 Annex D.2 QM decoder.  Reads from ``data`` starting at
    ``pos``; any real marker ends the entropy segment (zero bytes are
    fed from then on, per D.2.2) and its position is recorded in
    ``marker_pos``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker_pos: int | None = None
        self._init_registers()

    def _init_registers(self) -> None:
        # chigh (bits 16..31) <- the first 16 fraction bits of the code
        # value; the next byte loads at bits 8..15 on the first renorm
        self.c = (self._byte_in() << 24) | (self._byte_in() << 16)
        self.ct = 0
        self.a = 0x10000

    def _byte_in(self) -> int:
        if self.marker_pos is not None:
            return 0
        d = self.data
        if self.pos >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        # 0xFF: stuffed zero -> literal 0xFF byte; else a marker
        if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
            self.pos += 2
            return 0xFF
        self.marker_pos = self.pos
        return 0

    def decode(self, stats: _Stats, bin_: int) -> int:
        i = stats.idx[bin_]
        qe, nlps, nmps, switch = _QE_TAB[i]
        mps = stats.mps[bin_]
        self.a -= qe
        chigh = (self.c >> 16) & 0xFFFF
        if chigh < self.a:
            if self.a & 0x8000:
                return mps                  # fast path: no renorm
            # MPS_EXCHANGE (Figure D.18)
            if self.a < qe:
                d = 1 - mps
                if i != _FIXED_STATE:
                    if switch:
                        stats.mps[bin_] = 1 - mps
                    stats.idx[bin_] = nlps
            else:
                d = mps
                if i != _FIXED_STATE:
                    stats.idx[bin_] = nmps
        else:
            # LPS_EXCHANGE (Figure D.19): subtract the MPS interval
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                if i != _FIXED_STATE:
                    stats.idx[bin_] = nmps
            else:
                d = 1 - mps
                if i != _FIXED_STATE:
                    if switch:
                        stats.mps[bin_] = 1 - mps
                    stats.idx[bin_] = nlps
            self.a = qe
        while self.a < 0x8000:              # RENORMD (Figure D.20)
            if self.ct == 0:
                self.c += self._byte_in() << 8      # BYTEIN
                self.ct = 8
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d


# -- statistical models (Annex F, sequential) ---------------------------------

_DC_X1 = 20                                 # first DC magnitude-chain bin
_AC_X_LOW = 189                             # AC chain, k <= Kx
_AC_X_HIGH = 217                            # AC chain, k > Kx


def _classify_dc(m: int, sign: int, low: int, up: int) -> int:
    """F.1.4.4.1.2: conditioning category of a decoded/encoded diff
    whose magnitude-1 MSB is ``m`` (0 for |diff| == 1)."""
    if m < ((1 << low) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + 4 * sign
    return 4 + 4 * sign


class _DcModel:
    """Per-component DC coder state (shared stats area per table)."""

    def __init__(self, stats: _Stats, low: int, up: int):
        self.stats = stats
        self.low = low
        self.up = up
        self.context = 0
        self.pred = 0

    def reset(self) -> None:
        self.context = 0
        self.pred = 0

    def decode(self, dec: ArithDecoder) -> int:
        st = self.context
        s = self.stats
        if dec.decode(s, st) == 0:
            self.context = 0
            return self.pred
        sign = dec.decode(s, st + 1)
        st2 = st + 2 + sign
        m = 0
        if dec.decode(s, st2):
            st2 = _DC_X1
            m = 1
            while dec.decode(s, st2):
                m <<= 1
                if m == 0x8000:
                    raise ImageDecodeError("DC magnitude overflow")
                st2 += 1
        self.context = _classify_dc(m, sign, self.low, self.up)
        v = m
        stm = st2 + 14
        mm = m
        while mm:
            mm >>= 1
            if mm and dec.decode(s, stm):
                v |= mm
        v += 1
        if sign:
            v = -v
        self.pred += v
        return self.pred

    def encode(self, enc: ArithEncoder, dc: int) -> None:
        diff = dc - self.pred
        self.pred = dc
        st = self.context
        s = self.stats
        if diff == 0:
            enc.encode(0, s, st)
            self.context = 0
            return
        enc.encode(1, s, st)
        sign = 0 if diff > 0 else 1
        enc.encode(sign, s, st + 1)
        st2 = st + 2 + sign
        a = abs(diff) - 1
        m = 0
        if a == 0:
            enc.encode(0, s, st2)
        else:
            enc.encode(1, s, st2)
            st2 = _DC_X1
            m = 1
            while (m << 1) <= a:
                enc.encode(1, s, st2)
                m <<= 1
                st2 += 1
            enc.encode(0, s, st2)
        self.context = _classify_dc(m, sign, self.low, self.up)
        stm = st2 + 14
        mm = m
        while mm:
            mm >>= 1
            if mm:
                enc.encode(1 if a & mm else 0, s, stm)


class _AcModel:
    """AC coder over one stats area (per table), conditioned on k.

    The band/point-transform parameters (``ss``, ``se``, ``al``)
    default to the full sequential spectrum; progressive scans (Annex
    G.2) pass their spectral-selection window and successive-
    approximation shift.  Statistics areas are per SCAN in progressive
    mode (the caller allocates fresh ones), matching G.2's per-scan
    initialization."""

    def __init__(self, stats: _Stats, kx: int):
        self.stats = stats
        self.kx = kx
        self.fixed = _Stats(1)
        self.fixed.idx[0] = _FIXED_STATE

    def decode_block(self, dec: ArithDecoder, zz: np.ndarray,
                     ss: int = 1, se: int = 63, al: int = 0) -> None:
        """Fill zigzag-order coefficients ``ss..se`` of ``zz`` in
        place, each decoded value left-shifted by ``al`` (G.2.3; the
        sequential call is the ss=1, se=63, al=0 special case)."""
        s = self.stats
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if dec.decode(s, st):
                return                      # EOB
            while dec.decode(s, st + 1) == 0:
                st += 3
                k += 1
                if k > se:
                    raise ImageDecodeError("AC index past band end")
            sign = dec.decode(self.fixed, 0)
            st += 2
            m = dec.decode(s, st)
            if m and dec.decode(s, st):
                m = 2
                st = _AC_X_LOW if k <= self.kx else _AC_X_HIGH
                while dec.decode(s, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ImageDecodeError("AC magnitude overflow")
                    st += 1
            v = m
            stm = st + 14
            mm = m
            while mm:
                mm >>= 1
                if mm and dec.decode(s, stm):
                    v |= mm
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1

    def encode_block(self, enc: ArithEncoder, zz: np.ndarray,
                     ss: int = 1, se: int = 63, al: int = 0) -> None:
        s = self.stats
        nz = [k for k in range(ss, se + 1) if abs(int(zz[k])) >> al]
        eob = nz[-1] + 1 if nz else ss
        k = ss
        while k < eob:
            st = 3 * (k - 1)
            enc.encode(0, s, st)            # not EOB yet
            while abs(int(zz[k])) >> al == 0:
                enc.encode(0, s, st + 1)
                st += 3
                k += 1
            enc.encode(1, s, st + 1)
            v = int(zz[k])
            enc.encode(1 if v < 0 else 0, self.fixed, 0)
            st += 2
            a = (abs(v) >> al) - 1
            if a == 0:
                enc.encode(0, s, st)
            else:
                enc.encode(1, s, st)
                if a == 1:
                    enc.encode(0, s, st)
                else:
                    enc.encode(1, s, st)
                    m = 2
                    st = _AC_X_LOW if k <= self.kx else _AC_X_HIGH
                    while (m << 1) <= a:
                        enc.encode(1, s, st)
                        m <<= 1
                        st += 1
                    enc.encode(0, s, st)
                    stm = st + 14
                    mm = m
                    while mm:
                        mm >>= 1
                        if mm:
                            enc.encode(1 if a & mm else 0, s, stm)
            k += 1
        if eob <= se:
            enc.encode(1, s, 3 * (eob - 1))  # EOB decision

    # -- AC refinement scans (G.2.4; the decision layout also appears
    # in the IJG's jdarith.c/jcarith.c).  Unlike Huffman refinement,
    # NO correction bits follow the EOB decision, and the correction
    # bit itself is a coded decision at st+2 (conditioned on k), not a
    # raw bit.  The EOB search is band-bounded: equivalent to the
    # whole-block search for any position the scan can reach (a
    # below-band kex only ever means "EOB decisions start at Ss").

    def decode_refine(self, dec: ArithDecoder, zz: np.ndarray,
                      ss: int, se: int, al: int) -> None:
        s = self.stats
        p1 = 1 << al
        kex = ss - 1                        # last history-nonzero in band
        for k in range(se, ss - 1, -1):
            if int(zz[k]):
                kex = k
                break
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex and dec.decode(s, st):
                return                      # EOB: no trailing corrections
            while True:
                c = int(zz[k])
                if c:                       # history-nonzero: correction
                    if dec.decode(s, st + 2):
                        zz[k] = c + (p1 if c >= 0 else -p1)
                    break
                if dec.decode(s, st + 1):   # newly nonzero
                    zz[k] = -p1 if dec.decode(self.fixed, 0) else p1
                    break
                st += 3
                k += 1
                if k > se:
                    raise ImageDecodeError("AC refinement past band end")
            k += 1

    def encode_refine(self, enc: ArithEncoder, zz: np.ndarray,
                      ss: int, se: int, al: int) -> None:
        s = self.stats
        ke = ss - 1                         # EOB index at this precision
        for k in range(se, ss - 1, -1):
            if abs(int(zz[k])) >> al:
                ke = k
                break
        kex = ss - 1                        # EOB index BEFORE this scan
        for k in range(min(ke, se), ss - 1, -1):
            if abs(int(zz[k])) >> (al + 1):
                kex = k
                break
        k = ss
        while k <= ke:
            st = 3 * (k - 1)
            if k > kex:
                enc.encode(0, s, st)        # not EOB yet
            while True:
                t = abs(int(zz[k])) >> al
                if t:
                    if t >> 1:              # history-nonzero: one bit
                        enc.encode(t & 1, s, st + 2)
                    else:                   # newly nonzero
                        enc.encode(1, s, st + 1)
                        enc.encode(1 if int(zz[k]) < 0 else 0,
                                   self.fixed, 0)
                    break
                enc.encode(0, s, st + 1)
                st += 3
                k += 1
            k += 1
        if ke < se:
            enc.encode(1, s, 3 * ke)        # EOB decision for k = ke+1


# -- scan decode (mirrors jpeg._decode_scan) ----------------------------------

def decode_scan_arith(data: bytes, pos: int, frame: dict,
                      scan_tables: dict, qtables: dict,
                      conditioning: dict, restart_interval: int):
    """Sequential arithmetic SOS → list of per-component spatial
    planes (same contract as the Huffman ``_decode_scan`` front half).
    ``conditioning`` maps (class, id) → L/U (DC) or Kx (AC) from DAC
    markers; defaults L=0, U=1, Kx=5 per F.1.4.4.1.2 / F.1.4.4.2."""
    from .jpeg import idct2

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        from .images import UnsupportedImageError
        raise UnsupportedImageError("sampling factors beyond 2x2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                       dtype=np.float64) for c in comps]

    dc_stats: dict[int, _Stats] = {}
    ac_stats: dict[int, _Stats] = {}
    dc_models: list[_DcModel] = []
    ac_models: list[_AcModel] = []
    quants = []
    for c in comps:
        tsel = scan_tables.get(c["id"])
        if tsel is None:
            # legal per T.81 (non-interleaved sequential files) but
            # outside this engine's single-interleaved-scan envelope
            from .images import UnsupportedImageError
            raise UnsupportedImageError(
                f"non-interleaved scan (omits component {c['id']})")
        td, ta = tsel
        if td not in dc_stats:
            dc_stats[td] = _Stats(DC_STAT_BINS)
        if ta not in ac_stats:
            ac_stats[ta] = _Stats(AC_STAT_BINS)
        low, up = conditioning.get((0, td), (0, 1))
        kx = conditioning.get((1, ta), 5)
        dc_models.append(_DcModel(dc_stats[td], low, up))
        ac_models.append(_AcModel(ac_stats[ta], kx))
        q = qtables.get(c["tq"])
        if q is None:
            raise ImageDecodeError("missing quant table")
        quants.append(q)

    from .jpeg import ZIGZAG

    dec = ArithDecoder(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                dec = _sync_restart_arith(data, dec)
                for st in dc_stats.values():
                    st.reset()
                for st in ac_stats.values():
                    st.reset()
                for m in dc_models:
                    m.reset()
            mcu_count += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        zz[0] = dc_models[ci].decode(dec)
                        ac_models[ci].decode_block(dec, zz)
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        spatial = idct2(blk.reshape(8, 8)
                                        * quants[ci]) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    return planes, hmax, vmax


def _sync_restart_arith(data: bytes, dec: ArithDecoder) -> ArithDecoder:
    """Advance past the pending RSTn marker and return a fresh coder."""
    pos = dec.marker_pos
    if pos is None:
        # scan forward to the marker the encoder emitted
        pos = dec.pos
        while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] != 0x00):
            pos += 1
    while pos + 1 < len(data) and data[pos] == 0xFF \
            and data[pos + 1] == 0xFF:
        pos += 1
    if pos + 1 >= len(data) or data[pos] != 0xFF \
            or not 0xD0 <= data[pos + 1] <= 0xD7:
        raise ImageDecodeError("expected restart marker")
    return ArithDecoder(data, pos + 2)


def decode_progressive_scan_arith(data: bytes, pos: int, frame: dict,
                                  scan: dict, conditioning: dict,
                                  coefs: list, restart_interval: int
                                  ) -> int:
    """One progressive-arithmetic SOS (SOF10 — T.81 Annex G.2):
    accumulate into the per-component zigzag coefficient grids
    allocated by ``jpeg._alloc_coef_grids``; returns the stream offset
    just past the consumed entropy bytes.

    Statistics areas are fresh per scan (G.2 start-of-scan
    initialization) and reset again at every restart marker.  DC first
    scans reuse the sequential DC model over point-transformed values
    (stored ``pred << Al``); DC refinements are one fixed-bin decision
    per block OR-ing in ``1 << Al``; AC first scans are the sequential
    AC model over the scan's band with the ``<< Al`` store; AC
    refinements use the Annex G.2 correction model (coded decisions,
    no trailing correction bits after EOB).
    """
    from .jpeg import _comp_block_dims

    comps = frame["comps"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    sel = scan["comps"]
    dec = ArithDecoder(data, pos)
    unit = 0

    if ss == 0:                             # DC scan
        dc_stats: dict[int, _Stats] = {}
        models: dict[int, _DcModel] = {}
        if ah == 0:
            for ci, td, _ in sel:
                stats = dc_stats.setdefault(td, _Stats(DC_STAT_BINS))
                low, up = conditioning.get((0, td), (0, 1))
                models[ci] = _DcModel(stats, low, up)
        fixed = _Stats(1)
        fixed.idx[0] = _FIXED_STATE
        p1 = 1 << al
        if len(sel) > 1:                    # interleaved MCU order
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            units = [[(ci, my * comps[ci]["v"] + by,
                       mx * comps[ci]["h"] + bx)
                      for ci, _, _ in sel
                      for by in range(comps[ci]["v"])
                      for bx in range(comps[ci]["h"])]
                     for my in range(-(-frame["h"] // (8 * vmax)))
                     for mx in range(-(-frame["w"] // (8 * hmax)))]
        else:
            ci0 = sel[0][0]
            bh, bw = _comp_block_dims(frame, comps[ci0])
            units = [[(ci0, by, bx)]
                     for by in range(bh) for bx in range(bw)]
        for blocks in units:
            if restart_interval and unit and \
                    unit % restart_interval == 0:
                dec = _sync_restart_arith(data, dec)
                for stats in dc_stats.values():
                    stats.reset()
                for m in models.values():
                    m.reset()
            unit += 1
            for ci, by, bx in blocks:
                blk = coefs[ci][by, bx]
                if ah == 0:
                    blk[0] = models[ci].decode(dec) << al
                elif dec.decode(fixed, 0):
                    blk[0] = int(blk[0]) | p1
    else:                                   # AC scan: one component
        ci, _, ta = sel[0]
        kx = conditioning.get((1, ta), 5)
        ac_stats = _Stats(AC_STAT_BINS)
        model = _AcModel(ac_stats, kx)
        bh, bw = _comp_block_dims(frame, comps[ci])
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    dec = _sync_restart_arith(data, dec)
                    ac_stats.reset()
                unit += 1
                blk = coefs[ci][by, bx]
                if ah == 0:
                    model.decode_block(dec, blk, ss, se, al)
                else:
                    model.decode_refine(dec, blk, ss, se, al)
    return dec.marker_pos if dec.marker_pos is not None else dec.pos


def parse_dac(seg: bytes, conditioning: dict) -> None:
    """DAC segment (B.2.4.3) → conditioning dict entries."""
    p = 0
    while p + 2 <= len(seg):
        tc, tb = seg[p] >> 4, seg[p] & 0x0F
        cs = seg[p + 1]
        if tc == 0:
            low, up = cs & 0x0F, cs >> 4
            if up < low:
                raise ImageDecodeError("DAC requires L <= U")
            conditioning[(0, tb)] = (low, up)
        else:
            if not 1 <= cs <= 63:
                raise ImageDecodeError("DAC Kx out of range")
            conditioning[(1, tb)] = cs
        p += 2


# -- fixture encoder ----------------------------------------------------------

def encode_jpeg_arith(pixels: np.ndarray, quality: int = 90,
                      subsampling: str = "444",
                      restart_interval: int = 0) -> bytes:
    """8-bit gray (H,W) or RGB (H,W,3) → arithmetic-coded sequential
    JPEG (SOF9).  Deterministic fixture writer; same quant/sampling
    front half as the baseline encoder, DAC with the default
    conditioning (L=0, U=1, Kx=5) written explicitly."""
    from .jpeg import ZIGZAG, _quantized_zigzag

    grids, meta = _quantized_zigzag(np.asarray(pixels, dtype=np.uint8),
                                    quality, subsampling)
    h, w = meta["h"], meta["w"]
    nc = len(grids)
    samp, qmap = meta["samp"], meta["qmap"]

    out = bytearray(b"\xff\xd8")
    tabs = ((0, meta["ql"]),) + (((1, meta["qc"]),) if nc == 3 else ())
    for tq, tbl in tabs:
        zz = tbl.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zz)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, samp[i][0] << 4 | samp[i][1], qmap[i]])
    out += b"\xff\xc9" + struct.pack(">H", len(sof) + 2) + sof  # SOF9
    # DAC: defaults, explicit (DC tables: Cs = U<<4 | L; AC: Cs = Kx)
    dac = b""
    for tb in sorted(set(qmap)):
        dac += bytes([0x00 | tb, (1 << 4) | 0]) + bytes([0x10 | tb, 5])
    out += b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        tb = qmap[i]
        sos += bytes([i + 1, tb << 4 | tb])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_stats = {t: _Stats(DC_STAT_BINS) for t in set(qmap)}
    ac_stats = {t: _Stats(AC_STAT_BINS) for t in set(qmap)}
    dc_models = [_DcModel(dc_stats[qmap[i]], 0, 1) for i in range(nc)]
    ac_models = [_AcModel(ac_stats[qmap[i]], 5) for i in range(nc)]

    enc = ArithEncoder()
    mcu_idx = 0
    rst = 0
    for my in range(meta["mcus_y"]):
        for mx in range(meta["mcus_x"]):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                enc = ArithEncoder()
                for st in dc_stats.values():
                    st.reset()
                for st in ac_stats.values():
                    st.reset()
                for m in dc_models:
                    m.reset()
            mcu_idx += 1
            for ci in range(nc):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = grids[ci][my * cv + by, mx * ch + bx]
                        dc_models[ci].encode(enc, int(zz[0]))
                        ac_models[ci].encode_block(enc, zz)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_arith(pixels: np.ndarray, quality: int = 90,
                                  subsampling: str = "444",
                                  restart_interval: int = 0,
                                  bands: tuple = ((1, 5), (6, 63)),
                                  dc_al: int = 1, ac_al: int = 1
                                  ) -> bytes:
    """Progressive arithmetic-coded JPEG (SOF10) fixture writer: the
    same parameterized scan script as the Huffman progressive encoder
    (interleaved DC first at ``dc_al`` + per-bit refinements, then per
    component the AC ``bands`` first at ``ac_al`` refined bit-by-bit
    to 0), entropy-coded by the Annex D QM coder with the Annex G.2
    progressive models.  Encodes the same quantized coefficients as
    ``encode_jpeg``, so all encoder variants decode to identical
    pixels.  Statistics areas are fresh per scan; restart markers
    flush the coder and reset statistics (numbering restarts per
    scan)."""
    from .jpeg import ZIGZAG, _quantized_zigzag

    grids, meta = _quantized_zigzag(np.asarray(pixels, dtype=np.uint8),
                                    quality, subsampling)
    h, w = meta["h"], meta["w"]
    nc = len(grids)
    samp, qmap = meta["samp"], meta["qmap"]

    out = bytearray(b"\xff\xd8")
    tabs = ((0, meta["ql"]),) + (((1, meta["qc"]),) if nc == 3 else ())
    for tq, tbl in tabs:
        zz = tbl.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in zz)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, samp[i][0] << 4 | samp[i][1], qmap[i]])
    out += b"\xff\xca" + struct.pack(">H", len(sof) + 2) + sof  # SOF10
    dac = b""
    for tb in sorted(set(qmap)):
        dac += bytes([0x00 | tb, (1 << 4) | 0]) + bytes([0x10 | tb, 5])
    out += b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def emit_sos(comps_tt: list, ss: int, se: int, ah: int,
                 al: int) -> None:
        sos = bytes([len(comps_tt)])
        for cid, tt in comps_tt:
            sos += bytes([cid, tt])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)

    mcus = [(my, mx) for my in range(meta["mcus_y"])
            for mx in range(meta["mcus_x"])]

    def comp_blocks(ci: int) -> list:
        ch, cv = samp[ci]
        comp_w = -(-w * ch // meta["hmax"])
        comp_h = -(-h * cv // meta["vmax"])
        bw_, bh_ = -(-comp_w // 8), -(-comp_h // 8)
        return [(by, bx) for by in range(bh_) for bx in range(bw_)]

    def run_scan(units: list, per_unit, reset) -> None:
        """Entropy-code one scan: ``per_unit(enc, u)`` per restart
        unit, flushing + RSTn + statistics reset every interval."""
        enc = ArithEncoder()
        rst = 0
        for i, u in enumerate(units):
            if restart_interval and i and i % restart_interval == 0:
                out.extend(enc.flush())
                out.extend(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                enc = ArithEncoder()
                reset()
            per_unit(enc, u)
        out.extend(enc.flush())

    def mcu_blocks(my: int, mx: int) -> list:
        return [(ci, my * samp[ci][1] + by, mx * samp[ci][0] + bx)
                for ci in range(nc)
                for by in range(samp[ci][1])
                for bx in range(samp[ci][0])]

    all_comps_dc = [(i + 1, qmap[i] << 4) for i in range(nc)]

    # DC first scan (interleaved, point transform dc_al)
    emit_sos(all_comps_dc, 0, 0, 0, dc_al)
    dc_stats = {t: _Stats(DC_STAT_BINS) for t in set(qmap)}
    dc_models = [_DcModel(dc_stats[qmap[i]], 0, 1) for i in range(nc)]

    def dc_first(enc: ArithEncoder, u) -> None:
        for ci, by, bx in mcu_blocks(*u):
            dc_models[ci].encode(enc, int(grids[ci][by, bx, 0]) >> dc_al)

    def dc_reset() -> None:
        for stats in dc_stats.values():
            stats.reset()
        for m in dc_models:
            m.reset()

    run_scan(mcus, dc_first, dc_reset)

    # DC refinements, one bit per block per scan
    for a in range(dc_al - 1, -1, -1):
        emit_sos(all_comps_dc, 0, 0, a + 1, a)
        fixed = _Stats(1)
        fixed.idx[0] = _FIXED_STATE

        def dc_refine(enc: ArithEncoder, u, _a=a, _f=fixed) -> None:
            for ci, by, bx in mcu_blocks(*u):
                enc.encode((int(grids[ci][by, bx, 0]) >> _a) & 1, _f, 0)

        run_scan(mcus, dc_refine, lambda: None)

    # AC band scans: first pass at ac_al, then per-bit refinements
    def ac_scan(ci: int, ss: int, se: int, ah: int, a: int) -> None:
        emit_sos([(ci + 1, qmap[ci])], ss, se, ah, a)
        stats = _Stats(AC_STAT_BINS)
        model = _AcModel(stats, 5)

        def body(enc: ArithEncoder, u) -> None:
            blk = grids[ci][u[0], u[1]]
            if ah == 0:
                model.encode_block(enc, blk, ss, se, a)
            else:
                model.encode_refine(enc, blk, ss, se, a)

        run_scan(comp_blocks(ci), body, stats.reset)

    for ci in range(nc):
        for ss, se in bands:
            ac_scan(ci, ss, se, 0, ac_al)
    for a in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            for ss, se in bands:
                ac_scan(ci, ss, se, a + 1, a)
    out += b"\xff\xd9"
    return bytes(out)
