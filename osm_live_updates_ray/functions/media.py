"""Real media codecs for the multimodal stages — no imaging libraries
required for the uncompressed formats:

- **P6 PPM** image decode/encode (pure numpy header parse + frombuffer)
- **24-bit uncompressed BMP** decode (BITMAPINFOHEADER, bottom-up rows,
  4-byte row padding)
- **PCM WAV** decode/encode (stdlib ``wave``; 16-bit mono/stereo)
- **PPMV** — a trivial length-prefixed concatenation of P6 frames used
  as the video container for tests (real frame extraction: seek by the
  frame index, no full decode of the other frames)
- **PNG** decode/encode (stdlib zlib + numpy; all five filters)
- **GIF87a/89a** decode (real LZW, global/local palettes, interlace,
  transparency; first frame) + an exact-palette GIF89a encoder
- **JPEG** baseline + progressive live in ``functions/jpeg.py``
- **G.711 / IMA ADPCM WAV** and **MJPEG-AVI** below

Undecodable or unrecognized payloads raise and surface as
decode-failure NULL rows in the actor stages — features are never
synthesized from raw bytes.
"""

from __future__ import annotations

import io
import struct

import numpy as np


def sniff(payload: bytes) -> str:
    """Container sniff: 'ppm' | 'bmp' | 'png' | 'gif' | 'jpeg' | 'wav'
    | 'ppmv' | 'avi' | 'unknown'."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"PPMV":
        return "ppmv"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return "unknown"


# -- images -----------------------------------------------------------------
def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary P6 PPM."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> HxWx3 uint8 (comments tolerated in the header)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    n = w * h * 3
    if maxval > 255:
        # 16-bit P6: big-endian two-byte samples; render the high
        # byte scaled by maxval (the standard 8-bit presentation)
        arr = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
        return ((arr.astype(np.uint32) * 255) // maxval).astype(
            np.uint8).reshape(h, w, 3)
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> HxWx3 uint8 (RGB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_off
    ).reshape(h, row)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR -> RGB


# -- PNG (stdlib zlib; no imaging library) -----------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_filter_rows(rows: np.ndarray, ch: int, filter_type: int
                     ) -> bytearray:
    """Filter a (sub-)image's rows (2D int64 (n, stride)) with one
    filter type; returns filter-byte-prefixed scanline bytes."""
    n, stride = rows.shape
    prev = np.zeros(stride, dtype=np.int64)
    out = bytearray()
    for y in range(n):
        cur = rows[y]
        left = np.zeros(stride, dtype=np.int64)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(stride, dtype=np.int64)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc_ = np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError("filter_type must be 0-4")
        out.append(filter_type)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return out


def encode_png(img: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """uint8 image -> PNG.  (h,w) => grayscale, (h,w,3) => RGB,
    (h,w,4) => RGBA; 8-bit.  ``filter_type`` applies one scanline
    filter (0-4) to every row — the decoder's filter reconstruction is
    exercised against all five in tests.  ``interlace=True`` writes
    Adam7 (7 passes, each filtered independently) so tests pin the
    deinterlacing decoder against known pixels."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ct, ch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ct, ch = 6, 4
        flat = img
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = flat.shape[:2]
    if interlace:
        out = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = flat[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            out += _png_filter_rows(
                sub.reshape(ph, pw * ch).astype(np.int64), ch, filter_type
            )
    else:
        out = _png_filter_rows(
            flat.reshape(h, w * ch).astype(np.int64), ch, filter_type
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0,
                       1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec 8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, offset: int, sub_h: int, stride: int,
                  ch: int) -> tuple[np.ndarray, int]:
    """Reconstruct one (sub-)image's scanlines from ``raw`` starting at
    ``offset``; returns (rows as (sub_h, stride) uint8, next offset).
    ``ch`` is the filter byte-distance (bytes per pixel — channels x
    bytes-per-sample, per spec 9.2).  Filters 0-2 vectorized (uint8
    wrap == mod-256 per spec); avg/Paeth per-byte (sequential in x by
    definition)."""
    if len(raw) - offset < sub_h * (stride + 1):
        raise ValueError("PNG IDAT truncated")
    recon = np.zeros((sub_h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(sub_h):
        base = offset + y * (stride + 1)
        f = raw[base]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=base + 1).copy()
        if f == 0:
            pass
        elif f == 2:
            cur += prev  # uint8 wrap == mod-256 per spec
        elif f == 1:
            for i in range(ch):
                np.add.accumulate(cur[i::ch], out=cur[i::ch])
        elif f == 3:
            c = cur.astype(np.int64)
            p = prev.astype(np.int64)
            for x in range(stride):
                a = int(c[x - ch]) if x >= ch else 0
                c[x] = (c[x] + ((a + int(p[x])) >> 1)) & 0xFF
            cur = c.astype(np.uint8)
        elif f == 4:
            c = cur.astype(np.int64)
            p = prev.astype(np.int64)
            for x in range(stride):
                a = int(c[x - ch]) if x >= ch else 0
                b = int(p[x])
                cc = int(p[x - ch]) if x >= ch else 0
                q = a + b - cc
                qa, qb, qc = abs(q - a), abs(q - b), abs(q - cc)
                pred = a if (qa <= qb and qa <= qc) else (b if qb <= qc else cc)
                c[x] = (c[x] + pred) & 0xFF
            cur = c.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        recon[y] = cur
        prev = cur
    return recon, offset + sub_h * (stride + 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8, pure stdlib-zlib + numpy: 8-bit depth,
    color types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA, alpha
    dropped); all five scanline filters; non-interlaced AND Adam7
    interlaced (7-pass deinterlace, each pass filter-reconstructed
    independently per spec 8.2).  16-bit raises NotImplementedError —
    surfaced as decode-failure null rows by the featurize stage."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth not in (8, 16) or interlace not in (0, 1) \
            or ct not in (0, 2, 3, 6) or (depth == 16 and ct == 3):
        raise NotImplementedError(
            f"PNG depth={depth} color={ct} interlace={interlace} unsupported"
        )
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
    bps = depth // 8  # bytes per sample; filters act on BYTES (9.2)
    bpp = ch * bps
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        recon, _ = _png_unfilter(raw, 0, h, w * bpp, bpp)
    else:
        recon = np.zeros((h, w * bpp), dtype=np.uint8)
        grid = recon.reshape(h, w, bpp)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue  # empty pass emits NO scanlines (spec 8.2)
            sub, off = _png_unfilter(raw, off, ph, pw * bpp, bpp)
            grid[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if depth == 16:
        # big-endian samples: the HIGH byte is the standard 8-bit
        # rendering (what viewers/thumbnailers show)
        recon = recon.reshape(h, w * ch, 2)[:, :, 0].reshape(h, w * ch)
    if ct == 2:
        return recon.reshape(h, w, 3)
    if ct == 6:
        return recon.reshape(h, w, 4)[:, :, :3]
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[recon.reshape(h, w)]
    return np.repeat(recon.reshape(h, w, 1), 3, axis=2)  # grayscale


# -- GIF (87a/89a: LZW, global/local palettes, interlace) -------------------
def encode_gif(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (at most 256 distinct colors) -> GIF89a bytes with
    an exact palette and a real LZW-compressed image stream — the
    fixture role encode_png/encode_jpeg play for their decoders."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    # palette size padded to a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1) << 4 | (bits - 1),
                       0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code = max(2, bits)
    out.append(min_code)
    out += _lzw_encode(idx.astype(np.int64), min_code)
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW (variable code width, CLEAR/EOI codes, LSB-first
    bit packing, 255-byte sub-blocks) — ITU/W3C GIF89a Appendix F."""
    clear = 1 << min_code
    eoi = clear + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    run: tuple = ()
    for v in indices.tolist():
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        run = (v,)
    if run:
        put(table[run])
    put(eoi)
    if nbits:
        body.append(acc & 0xFF)
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_out: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < n_out:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break  # truncated stream: tolerate like the JPEG reader
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_out]), dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a -> HxWx3 uint8 RGB (FIRST frame; transparency
    composited onto the logical-screen background color; interlaced
    row order restored).  Animation beyond frame 0 is out of scope for
    featurization — the first frame is what a crawl thumbnailer
    renders."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF (or truncated header)")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        gpal = np.frombuffer(payload, np.uint8, gsize * 3, pos).reshape(-1, 3)
        pos += gsize * 3
    transparent = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and pos + 4 < len(payload) and \
                    payload[pos] >= 4:  # GCE
                gflags = payload[pos + 1]
                if gflags & 1:
                    transparent = payload[pos + 4]
            while pos < len(payload) and payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            pal = gpal
            if iflags & 0x80:
                lsize = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload, np.uint8, lsize * 3, pos).reshape(-1, 3)
                pos += lsize * 3
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            # truncation-tolerant sub-block walk (JPEG-reader
            # discipline): EOF mid-stream ends the data, never raises
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if pal is None:
                raise ValueError("GIF image without a color table")
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if len(idx) < iw * ih:  # truncated: pad with background
                idx = np.concatenate([
                    idx, np.full(iw * ih - len(idx), bg, np.uint8)])
            grid = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: restore row order
                # rows[y] = storage position of display row y
                rows = np.empty(ih, dtype=np.int64)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        rows[y] = src
                        src += 1
                grid = grid[rows]
            safe = np.minimum(grid.astype(np.int64), len(pal) - 1)
            rgb = pal[safe]
            if transparent is not None:
                bg_rgb = pal[min(bg, len(pal) - 1)]
                rgb = np.where(
                    (grid == transparent)[..., None], bg_rgb, rgb)
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
            canvas[:, :] = (gpal[min(bg, len(gpal) - 1)]
                            if gpal is not None else 0)
            ey, ex = min(iy + ih, h), min(ix + iw, w)
            canvas[iy:ey, ix:ex] = rgb[: ey - iy, : ex - ix]
            return canvas
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif_anim(frames: list[np.ndarray], frame_ms: int = 100
                    ) -> bytes:
    """Frame list (same dims, <=256 distinct colors ACROSS all frames)
    -> animated GIF89a: NETSCAPE loop extension + per-frame GCE delay
    + one LZW image stream per frame over a shared global palette."""
    import struct as _st

    h, w = frames[0].shape[:2]
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    palette, idx = np.unique(
        stack.reshape(-1, 3), axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif_anim needs <= 256 distinct colors")
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    idx = idx.reshape(len(frames), h * w)
    out = bytearray(b"GIF89a")
    out += _st.pack("<HHBBB", w, h, 0x80 | (bits - 1) << 4 | (bits - 1),
                    0, 0)
    out += pal.tobytes()
    # NETSCAPE 2.0 loop-forever extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    delay_cs = max(1, frame_ms // 10)
    for f in range(len(frames)):
        out += bytes([0x21, 0xF9, 4, 0x00]) + _st.pack("<H", delay_cs) \
            + b"\x00\x00"
        out += _st.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        out += _lzw_encode(idx[f].astype(np.int64), min_code)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_walk_frames(payload: bytes):
    """Yield (gce_bytes_or_None, descriptor+palette+data bytes) per
    frame by SUB-BLOCK WALKING only — no LZW decode of any frame."""
    import struct as _st

    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += (2 << (flags & 0x07)) * 3
    pending_gce = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:
            label = payload[pos + 1]
            start = pos
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            if label == 0xF9:
                pending_gce = payload[start:pos]
        elif b0 == 0x2C:
            start = pos
            iflags = payload[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += (2 << (iflags & 0x07)) * 3
            pos += 1  # LZW min code size
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            yield pending_gce, payload[start:pos]
            pending_gce = None
        elif b0 == 0x3B:
            return
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")


def gif_info(payload: bytes) -> tuple[int, int]:
    """(n_frames, frame_ms) from the block structure only (delay from
    the first GCE, x10 ms; 100 ms default when absent)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    import struct as _st

    n = 0
    frame_ms = 100
    for gce, _img in _gif_walk_frames(payload):
        if n == 0 and gce is not None and len(gce) >= 6:
            d = _st.unpack_from("<H", gce, 4)[0]
            if d:
                frame_ms = d * 10
        n += 1
    return n, frame_ms


def gif_frame_bytes(payload: bytes, index: int) -> bytes:
    """ONE frame as a standalone single-frame GIF (header + global
    palette + that frame's blocks + trailer) — decodable by
    :func:`decode_gif`; frames before it are only block-walked, never
    LZW-decoded."""
    flags = payload[10]
    head_end = 13 + ((2 << (flags & 0x07)) * 3 if flags & 0x80 else 0)
    for i, (gce, img) in enumerate(_gif_walk_frames(payload)):
        if i == index:
            return (payload[:head_end] + (gce or b"") + img + b"\x3b")
    raise IndexError(f"frame {index} not in GIF")


def decode_gif_frame(payload: bytes, index: int) -> np.ndarray:
    return decode_gif(gif_frame_bytes(payload, index))


def decode_image(payload: bytes) -> np.ndarray:
    """Sniffed decode: PPM/BMP/PNG/GIF/JPEG (baseline + progressive)
    natively; anything else needs PIL (absent here — surfaces as a
    decode-failure row)."""
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "gif":
        return decode_gif(payload)
    if kind == "jpeg":
        from . import jpeg

        return jpeg.decode_jpeg(payload)
    try:
        from PIL import Image  # noqa: F401  (absent in this container)
    except ImportError:
        raise NotImplementedError(
            f"compressed image decode needs PIL (payload kind: {kind})"
        )
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (vectorized index gather)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


# -- audio ------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(np.ascontiguousarray(samples, np.int16).tobytes())
    return buf.getvalue()


def _riff_chunks(payload: bytes):
    """Yield (chunk_id, data) for a RIFF/WAVE payload (word-aligned)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        yield cid, payload[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)


# G.711 decode tables built once from the spec formulas (Sun g711.c,
# public domain): 256-entry byte -> linear int16 lookups, so batch
# decode is one vectorized np.take.
def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # ulaw: stored complemented
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)

    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return ulaw, alaw


_ULAW_DEC, _ALAW_DEC = _g711_tables()

# IMA ADPCM (WAV fmt tag 0x11) tables, from the IMA/DVI spec.
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)


def _ima_decode_blocks(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM data chunk -> int16 samples.  Blocks are
    independent (4-byte header: predictor int16, step index u8, pad),
    so the sequential inner loop runs once per sample-in-block while
    numpy vectorizes ACROSS blocks — the decode is O(block_size) steps
    regardless of how many blocks a batch carries."""
    nb = len(data) // block_align
    if nb == 0:
        return np.zeros(0, dtype=np.int16)
    blocks = np.frombuffer(data[: nb * block_align], dtype=np.uint8)
    blocks = blocks.reshape(nb, block_align)
    pred = (blocks[:, 0].astype(np.int64)
            | (blocks[:, 1].astype(np.int64) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    idx = np.clip(blocks[:, 2].astype(np.int64), 0, 88)
    payload = blocks[:, 4:]
    nib = np.empty((nb, payload.shape[1] * 2), dtype=np.int64)
    nib[:, 0::2] = payload & 0x0F  # low nibble first per spec
    nib[:, 1::2] = payload >> 4
    ns = nib.shape[1]
    out = np.empty((nb, 1 + ns), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for s in range(ns):
        n = nib[:, s]
        step = _IMA_STEP[idx]
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        pred = np.clip(pred + np.where(n & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[n], 0, 88)
        out[:, s + 1] = pred.astype(np.int16)
    return out.ravel()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (float32 mono samples in [-1, 1], sample rate).

    Handles PCM (fmt tag 1: 8/16-bit), G.711 mu-law (7) and A-law (6)
    via vectorized table lookups, and mono IMA ADPCM (0x11) via the
    block-parallel decoder — the compressed-audio formats a crawl
    corpus actually carries in RIFF containers.  Other tags raise
    NotImplementedError (surfaced as decode-failure rows)."""
    fmt = data = None
    for cid, chunk in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, rate, _brate, balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
            x = x.astype(np.float32) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV not supported")
    elif tag in (6, 7):  # G.711 A-law / mu-law
        table = _ALAW_DEC if tag == 6 else _ULAW_DEC
        x = table[np.frombuffer(data, dtype=np.uint8)].astype(np.float32)
        x /= 32768.0
    elif tag == 0x11:  # IMA ADPCM
        if nch != 1:
            raise NotImplementedError("multi-channel IMA ADPCM not supported")
        x = _ima_decode_blocks(data, balign).astype(np.float32) / 32768.0
    else:
        raise NotImplementedError(f"WAV format tag {tag} not supported")
    if tag in (1, 6, 7) and nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def _wav_container(tag: int, nch: int, rate: int, bits: int,
                   block_align: int, data: bytes, extra: bytes = b"") -> bytes:
    """Assemble a RIFF/WAVE payload around an encoded data chunk."""
    fmt = struct.pack("<HHIIHH", tag, nch, rate,
                      rate * block_align if tag != 0x11 else rate, block_align,
                      bits) + extra
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + (b"\x00" if len(fmt) & 1 else b"")
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def encode_g711_wav(samples: np.ndarray, rate: int = 8_000,
                    law: str = "ulaw") -> bytes:
    """int16 mono -> G.711 mu-law/A-law WAV.  Encoding is exact
    nearest-codeword quantization against the decode table (the optimal
    companding encoder by construction — no second spec to get wrong)."""
    table = _ULAW_DEC if law == "ulaw" else _ALAW_DEC
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int64)
    x = np.ascontiguousarray(samples, np.int16).astype(np.int64)
    pos = np.searchsorted(sorted_vals, x)
    lo = np.clip(pos - 1, 0, 255)
    hi = np.clip(pos, 0, 255)
    pick = np.where(
        np.abs(sorted_vals[hi] - x) < np.abs(x - sorted_vals[lo]), hi, lo
    )
    codes = order[pick].astype(np.uint8)
    return _wav_container(6 if law == "alaw" else 7, 1, rate, 8, 1,
                          codes.tobytes())


def encode_ima_adpcm_wav(samples: np.ndarray, rate: int = 8_000,
                         block_align: int = 256) -> bytes:
    """int16 mono -> mono IMA ADPCM WAV (reference greedy encoder; the
    decoder above is the spec side under test)."""
    x = np.ascontiguousarray(samples, np.int16).astype(np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block
    nb = max(1, -(-len(x) // spb))
    x = np.pad(x, (0, nb * spb - len(x)))
    out = bytearray()
    idx = 0
    for b in range(nb):
        seg = x[b * spb : (b + 1) * spb]
        pred = int(seg[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in seg[1:]:
            step = int(_IMA_STEP[idx])
            delta = int(s) - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = max(-32768, min(32767, pred + (-diff if n & 8 else diff)))
            idx = max(0, min(88, idx + int(_IMA_INDEX[n])))
            nibbles.append(n)
        pairs = np.array(nibbles, dtype=np.uint8).reshape(-1, 2)
        out += (pairs[:, 0] | (pairs[:, 1] << 4)).tobytes()
    extra = struct.pack("<HH", 2, spb)  # cbSize, wSamplesPerBlock
    return _wav_container(0x11, 1, rate, 4, block_align, bytes(out), extra)


# -- video (PPMV: length-prefixed P6 frame sequence) ------------------------
def encode_ppmv(frames: list[np.ndarray], frame_ms: int = 500) -> bytes:
    """Frames (HxWx3 uint8) -> PPMV container.

    Layout: b'PPMV' | u32 n_frames | u32 frame_ms | n x (u32 size, P6)."""
    blobs = [encode_ppm(f) for f in frames]
    head = b"PPMV" + struct.pack("<II", len(blobs), frame_ms)
    return head + b"".join(struct.pack("<I", len(b)) + b for b in blobs)


def ppmv_info(payload: bytes) -> tuple[int, int]:
    """(n_frames, frame_ms) without touching frame data."""
    if payload[:4] != b"PPMV":
        raise ValueError("not a PPMV container")
    return struct.unpack_from("<II", payload, 4)


def ppmv_frame_bytes(payload: bytes, index: int) -> bytes:
    """The raw P6 bytes of ONE frame (seeks by the size prefixes — real
    frame extraction, no decode of the frames before it)."""
    n, _ = ppmv_info(payload)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} of {n}")
    pos = 12
    for _ in range(index):
        pos += 4 + struct.unpack_from("<I", payload, pos)[0]
    size = struct.unpack_from("<I", payload, pos)[0]
    return payload[pos + 4 : pos + 4 + size]


def decode_ppmv_frame(payload: bytes, index: int) -> np.ndarray:
    return decode_ppm(ppmv_frame_bytes(payload, index))


# -- video (MJPEG-AVI: RIFF 'AVI ' container, '00dc' JPEG frames, idx1) ----
#
# The real-world cousin of PPMV: a standard AVI-1.0 RIFF layout
# (hdrl(avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) ) +
# movi + idx1) whose frames are baseline JPEGs from functions/jpeg.py.
# Frame extraction seeks via the idx1 index — no frame before the
# requested one is read, the access pattern a sampling stage needs.
def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 2,
                     quality: int = 90) -> bytes:
    """Frames (HxWx3 uint8, equal sizes) -> MJPEG AVI bytes."""
    from . import jpeg as _jpeg

    if not frames:
        raise ValueError("MJPEG-AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [_jpeg.encode_jpeg(f, quality=quality) for f in frames]
    usec = 1_000_000 // fps
    maxb = max(len(b) for b in blobs)

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(tag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", tag + data)

    avih = struct.pack(
        "<14I", usec, maxb * fps, 0, 0x10,  # AVIF_HASINDEX
        len(blobs), 0, 1, maxb, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(blobs),
                      maxb, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    idx = b""
    for b in blobs:
        # idx1 offsets are movi-relative: measured from the 'movi'
        # fourcc, so the first chunk header sits at offset 4
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body),
                                     len(b))
        movi_body += chunk(b"00dc", b)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_chunks(payload: bytes):
    """Yield (fourcc, payload_offset, size) for the top-level chunks of
    the RIFF body; LIST chunks yield their list-type as fourcc with the
    offset pointing past the type tag."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    i, n = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while i + 8 <= n:
        tag = payload[i:i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        if tag == b"LIST":
            yield payload[i + 8:i + 12], i + 12, size - 4
        else:
            yield tag, i + 8, size
        i += 8 + size + (size & 1)


def avi_info(payload: bytes) -> tuple[int, int, int, int]:
    """(n_frames, frame_ms, width, height) from the avih header only."""
    for tag, off, _size in _avi_chunks(payload):
        if tag == b"hdrl":
            if payload[off:off + 4] != b"avih":
                break
            usec, _, _, _, nfr = struct.unpack_from("<5I", payload, off + 8)
            w, h = struct.unpack_from("<II", payload, off + 8 + 32)
            return nfr, usec // 1000, w, h
    raise ValueError("no avih header")


def avi_frame_bytes(payload: bytes, index: int) -> bytes:
    """Raw JPEG bytes of ONE frame, located via the idx1 index — no
    other frame's bytes are touched (handles both movi-relative and
    absolute idx1 offsets, as real demuxers must)."""
    movi_pos = idx_off = idx_size = None
    for tag, off, size in _avi_chunks(payload):
        if tag == b"movi":
            movi_pos = off - 4  # position of the 'movi' fourcc
        elif tag == b"idx1":
            idx_off, idx_size = off, size
    if idx_off is None or movi_pos is None:
        raise ValueError("no idx1 index")
    n = idx_size // 16
    if not 0 <= index < n:
        raise IndexError(f"frame {index} of {n}")
    e = idx_off + 16 * index
    off, size = struct.unpack_from("<II", payload, e + 8)
    base = movi_pos if payload[movi_pos + off:movi_pos + off + 4] == b"00dc" \
        else 0
    return payload[base + off + 8:base + off + 8 + size]


def decode_avi_frame(payload: bytes, index: int) -> np.ndarray:
    from . import jpeg as _jpeg

    return _jpeg.decode_jpeg(avi_frame_bytes(payload, index))


def image_meta(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) from the CONTAINER HEADER only — no
    decode, no imaging library: PNG (IHDR), GIF87a/89a (logical screen
    descriptor), JPEG (first SOFn marker scan), BMP (BITMAPINFOHEADER)
    and P6 PPM (ASCII header).  The header-sniff path every crawl
    pipeline runs before deciding whether a payload is worth decoding;
    returns ("unknown", -1, -1) for unrecognized or truncated bytes."""
    import struct

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            return "png", int(w), int(h)
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return "gif", int(w), int(h)
        if payload[:2] == b"\xff\xd8":  # JPEG SOI; scan for SOFn
            i, n = 2, len(payload)
            while i + 9 < n:
                if payload[i] != 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker == 0xFF:  # fill byte (legal padding, T.81 B.1.1.2)
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return "jpeg", int(w), int(h)
                i += 2 + seglen
            return "unknown", -1, -1
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return "bmp", int(w), abs(int(h))  # negative h = top-down rows
        if payload[:2] == b"P6":
            head = payload[:64].split()
            return "ppm", int(head[1]), int(head[2])
    except (struct.error, IndexError, ValueError):
        pass
    return "unknown", -1, -1


def audio_meta(payload: bytes) -> tuple[str, int, int, int]:
    """(format, sample_rate, n_channels, duration_ms) from the RIFF/fmt
    chunk HEADER only — no sample decode: walks the chunk list (fmt
    then data), reads rate/channels/width from fmt and derives duration
    from the data chunk's byte length.  The audio sibling of
    :func:`image_meta`; returns ("unknown", -1, -1, -1) for
    unrecognized or truncated bytes."""
    import struct

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return "unknown", -1, -1, -1
        i, n = 12, len(payload)
        tag = rate = nch = width = balign = data_len = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                tag, nch, rate = struct.unpack("<HHI", payload[i + 8 : i + 16])
                balign, width = struct.unpack("<HH", payload[i + 20 : i + 24])
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if rate and nch and width and data_len is not None:
            if tag == 0x11 and balign:  # IMA ADPCM: samples per block
                n_frames = (data_len // balign) * ((balign - 4) * 2 + 1)
            else:
                n_frames = data_len // (nch * max(1, width // 8))
            return "wav", int(rate), int(nch), int(n_frames * 1000 // rate)
    except (struct.error, IndexError, ValueError, ZeroDivisionError):
        pass
    return "unknown", -1, -1, -1
