"""Pure-stdlib media codecs: PNG (zlib) and WAV (struct) encode/decode.

The container ships no PIL/soundfile, but PNG's format is zlib-deflated
filtered scanlines and WAV PCM is raw little-endian samples — both fully
decodable with the standard library plus NumPy. These codecs make the
multimodal pipeline REAL end-to-end for image and audio payloads: the
binary column holds genuine PNG/WAV bytes, and decode/resize/feature
stages operate on actual pixels/samples instead of the deterministic fake
(operators/multimodal.py's decode_media sniffs magic bytes and routes
real PNG/BMP/GIF payloads here, keeping its deterministic byte-stat
fallback only for opaque payloads — the oracled byte-stat queries feed
it text bytes; the codec queries in plans/multimodalq2.py carry exact
encode→decode roundtrip pytests and hash-oracled md5 twins).

Supported subset (documented, asserted):
- PNG: 8-bit, greyscale (color type 0) and RGB (color type 2), no
  interlace. The encoder emits filter 0 scanlines; the decoder implements
  ALL five PNG filters (None/Sub/Up/Average/Paeth) so externally produced
  baseline PNGs of these color types decode too.
- WAV: PCM 16-bit little-endian, mono or interleaved stereo.
- BMP: uncompressed (BI_RGB) 8-bit indexed (greyscale palette on encode,
  arbitrary palette on decode) and 24-bit; bottom-up on encode, bottom-up
  or top-down on decode; 4-byte row padding per spec.
- GIF87a: single-image 8-bit with a REAL variable-width LZW compressor
  (9→12-bit codes, LSB-first packing, CLEAR-code table resets); decode
  also accepts GIF89a with extension blocks (skipped) and arbitrary
  palettes; no interlace.
- TIFF: baseline uncompressed 8-bit greyscale (BlackIsZero) and RGB;
  encode is little-endian single-strip with an ascending-tag IFD and
  the out-of-line 3xSHORT BitsPerSample array RGB requires; decode
  accepts either byte order and any strip layout.

Scale: codecs are per-row NumPy kernels invoked inside Arrow-batched
mapInPandas — partition-parallel, no driver involvement, payload bytes
colocated with metadata in parquet row groups (same shape as the fake
path; see multimodal.py module docstring).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) greyscale or (h, w, 3) RGB → baseline PNG bytes
    (bit depth 8, filter 0 scanlines, single IDAT)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"encode_png wants (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Baseline PNG bytes → uint8 array (h, w) or (h, w, 3). Supports bit
    depth 8, color types 0/2, no interlace; all five scanline filters."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color_type} "
                    f"interlace={interlace} (supported: 8-bit grey/RGB baseline)"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        # Filter arithmetic is done in Python int (not uint8 scalars): the
        # recurrences are modular by spec, and a uint8 add would wrap with a
        # NumPy RuntimeWarning per pixel — noisy in executor logs and able to
        # mask a real overflow bug. `& 0xFF` gives the intended mod-256.
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    if channels == 1:
        return out
    return out.reshape(height, width, 3)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w[, c]) — index-mapped, no loops."""
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 array (n,) mono or (n, 2) stereo → RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16, got {samples.dtype}")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    payload = samples.tobytes()  # numpy default little-endian on this arch
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    data_hdr = b"data" + struct.pack("<I", len(payload))
    riff_len = 4 + (8 + len(fmt)) + (8 + len(payload))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + data_hdr
        + payload
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → (int16 array [n] or [n,2], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} bits={bits} "
                    "(supported: PCM 16-bit)"
                )
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels)
    return samples.astype(np.int16, copy=False), rate


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) grey or (h, w, 3) RGB → Windows BMP bytes.

    Grey encodes as 8-bit indexed with the identity greyscale palette;
    RGB encodes as 24-bit BI_RGB. Pixel rows are stored bottom-up with
    each row padded to a 4-byte boundary, per the BITMAPINFOHEADER spec.
    """
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_bmp wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        bits, channels = 8, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        bits, channels = 24, 3
    else:
        raise ValueError(f"encode_bmp wants (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    row_bytes = w * channels
    pad = (-row_bytes) % 4
    if channels == 3:
        pix = arr[:, :, ::-1]  # RGB -> BGR storage order
    else:
        pix = arr
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += pix[y].tobytes() + b"\x00" * pad
    palette = b""
    if bits == 8:
        # identity greyscale palette: BGRA quads
        palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    data_offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bits, 0, len(body), 2835, 2835,
        256 if bits == 8 else 0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset
    )
    return header + info + palette + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 array (h, w) grey or (h, w, 3) RGB. Supports
    uncompressed (BI_RGB) 8-bit-indexed and 24-bit files, bottom-up or
    top-down row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    _sig, _size, _r1, _r2, data_offset = struct.unpack("<2sIHHI", data[:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    _hs, w, h, _planes, bits, comp, _isz, _xp, _yp, clr_used, _ci = struct.unpack(
        "<IiiHHIIiiII", data[14:54]
    )
    if comp != 0 or bits not in (8, 24):
        raise ValueError(
            f"unsupported BMP: bits={bits} compression={comp} "
            "(supported: uncompressed 8-bit indexed / 24-bit)"
        )
    top_down = h < 0
    h = abs(h)
    channels = 1 if bits == 8 else 3
    palette = None
    if bits == 8:
        n_colors = clr_used or 256
        poff = 14 + hdr_size
        praw = np.frombuffer(data, np.uint8, count=n_colors * 4, offset=poff)
        palette = praw.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
    row_bytes = w * channels
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((h, row_bytes), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        off = data_offset + i * stride
        out[y] = np.frombuffer(data, np.uint8, count=row_bytes, offset=off)
    if channels == 1:
        grey = out
        if palette is not None and not (
            np.array_equal(palette[:, 0], np.arange(len(palette)))
            and np.array_equal(palette[:, 0], palette[:, 1])
            and np.array_equal(palette[:, 1], palette[:, 2])
        ):
            # non-identity palette: map indices through it (still grey iff
            # R==G==B per entry; otherwise expand to RGB)
            rgb = palette[grey]
            if np.array_equal(rgb[..., 0], rgb[..., 1]) and np.array_equal(
                rgb[..., 1], rgb[..., 2]
            ):
                return rgb[..., 0].astype(np.uint8)
            return rgb.astype(np.uint8)
        return grey
    return out.reshape(h, w, 3)[:, :, ::-1].copy()  # BGR -> RGB


def _lzw_encode(pixels, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable-width codes 9..12 bits packed LSB-first,
    CLEAR emitted on table overflow. Encoder adds the new table entry
    AFTER emitting the prefix code and widens when the newly-added index
    reaches 1 << code_size — the exact mirror of the decoder below."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def fresh_table():
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix: tuple = ()
    for p in pixels:
        p = int(p)
        cand = prefix + (p,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (p,)
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> list[int]:
    """Inverse of _lzw_encode (GIF spec §appendix): decoder adds its entry
    one code behind the encoder and widens when its next-index counter
    reaches 1 << code_size, which lands the width change on the same
    stream position as the encoder's."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = bitbuf = bitcnt = 0

    def read(width: int) -> int:
        nonlocal pos, bitbuf, bitcnt
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        v = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        return v

    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple | None = None
    while True:
        c = read(width)
        if c == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if c == eoi:
            return out
        if c < next_code:
            entry = table[c]
        elif c == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"GIF LZW: invalid code {c} (next={next_code})")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + (entry[0],))
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) greyscale → GIF87a bytes: 256-entry greyscale
    global color table, single image, REAL variable-width LZW."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError(f"encode_gif wants uint8 (h,w), got {arr.dtype} {arr.shape}")
    h, w = arr.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit color res, 256 entries
    for v in range(256):
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])  # LZW minimum code size
    data = _lzw_encode(arr.flatten().tolist())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes → uint8 (h, w) grey or (h, w, 3) RGB (palette
    applied; grey iff every palette entry has R==G==B). Supports a single
    image, no interlace; extension blocks are skipped."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(data, np.uint8, count=n * 3, offset=pos).reshape(
            n, 3
        )
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise ValueError("unsupported GIF: interlaced image")
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    data, np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(_lzw_decode(bytes(lzw), min_code), dtype=np.uint8)
            if len(idx) != w * h:
                raise ValueError("GIF pixel count mismatch")
            img = idx.reshape(h, w)
            if palette is None:
                return img
            rgb = palette[img]
            if np.array_equal(rgb[..., 0], rgb[..., 1]) and np.array_equal(
                rgb[..., 1], rgb[..., 2]
            ):
                return rgb[..., 0].copy()
            return rgb
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF missing image data")


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed, little-endian)
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    256: "width",
    257: "height",
    258: "bits",
    259: "compression",
    262: "photometric",
    273: "strip_offsets",
    277: "spp",
    278: "rows_per_strip",
    279: "strip_counts",
}


def encode_tiff(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) grey or (h, w, 3) RGB → baseline TIFF bytes
    (little-endian 'II', uncompressed, one strip, single IFD; grey is
    PhotometricInterpretation=1 BlackIsZero, RGB is =2 with
    SamplesPerPixel=3 and an out-of-line 3xSHORT BitsPerSample array,
    as the 4-byte IFD value slot requires)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_tiff wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        spp, photometric = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise ValueError(f"encode_tiff wants (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    strip = arr.tobytes()  # top-down interleaved, TIFF native order
    # TIFF6 requires every offset to be word-aligned; an odd strip
    # length (any odd h*w greyscale image) would otherwise place the
    # IFD — and the RGB BitsPerSample value offset derived from it —
    # on an odd byte. Pad the strip, but keep StripByteCounts at the
    # UNPADDED length (the pad is dead space, not pixel data).
    pad = b"\x00" * (len(strip) % 2)
    ifd_off = 8 + len(strip) + len(pad)
    n_entries = 9
    extra_off = ifd_off + 2 + 12 * n_entries + 4

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    extra = b""
    if spp == 3:
        bits_value = extra_off  # offset of the 3xSHORT array below
        extra = struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"  # word-align
    else:
        bits_value = 8
    # tags must be ascending per the TIFF6 spec
    ifd = struct.pack("<H", n_entries)
    ifd += entry(256, 4, 1, w)
    ifd += entry(257, 4, 1, h)
    ifd += entry(258, 3, spp, bits_value)
    ifd += entry(259, 3, 1, 1)  # no compression
    ifd += entry(262, 3, 1, photometric)
    ifd += entry(273, 4, 1, 8)  # strip starts right after the header
    ifd += entry(277, 3, 1, spp)
    ifd += entry(278, 4, 1, h)
    ifd += entry(279, 4, 1, len(strip))
    ifd += struct.pack("<I", 0)  # no next IFD
    header = b"II" + struct.pack("<HI", 42, ifd_off)
    return header + strip + pad + ifd + extra


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 array (h, w) grey or (h, w, 3) RGB. Supports
    baseline uncompressed 8-bit grey (BlackIsZero) and RGB in either
    byte order ('II'/'MM'), any strip layout."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte order mark)")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError(f"not a TIFF (magic {magic})")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[str, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        name = _TIFF_TAGS.get(tag)
        if name is None or typ not in type_size:
            continue
        total = type_size[typ] * count
        voff = off + 8 if total <= 4 else struct.unpack(bo + "I", data[off + 8 : off + 12])[0]
        vals = list(
            struct.unpack(bo + str(count) + type_fmt[typ], data[voff : voff + total])
        )
        tags[name] = vals
    w, h = tags["width"][0], tags["height"][0]
    spp = tags.get("spp", [1])[0]
    bits = tags.get("bits", [8])
    comp = tags.get("compression", [1])[0]
    photometric = tags.get("photometric", [1])[0]
    if comp != 1 or any(b != 8 for b in bits) or photometric not in (1, 2):
        raise ValueError(
            f"unsupported TIFF: bits={bits} compression={comp} "
            f"photometric={photometric} (supported: uncompressed 8-bit "
            "grey/RGB)"
        )
    offs = tags["strip_offsets"]
    counts = tags["strip_counts"]
    body = b"".join(data[o : o + c] for o, c in zip(offs, counts))
    pix = np.frombuffer(body, np.uint8, count=w * h * spp)
    if spp == 1:
        return pix.reshape(h, w).copy()
    return pix.reshape(h, w, 3).copy()
