"""Exact roundtrip verification for the pure-stdlib PNG/WAV codecs —
the verification path for the rows-only multimodal codec queries
(encode→decode must reproduce the array bit-for-bit)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_caic_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)


def _rng(seed):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("shape", [(1, 1), (7, 3), (16, 16), (5, 31)])
def test_png_roundtrip_grey(shape):
    a = _rng(1).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(a))
    assert out.shape == a.shape and (out == a).all()


@pytest.mark.parametrize("shape", [(1, 1, 3), (9, 4, 3), (16, 16, 3)])
def test_png_roundtrip_rgb(shape):
    a = _rng(2).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(a))
    assert out.shape == a.shape and (out == a).all()


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG filter to every scanline (the encoder-side transform our
    decoder must invert)."""
    h, w = img.shape[0], img.shape[1]
    channels = 1 if img.ndim == 2 else img.shape[2]
    bpp = channels
    flat = img.reshape(h, w * channels).astype(np.int32)
    stride = w * channels
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        line = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            line[x] = (cur[x] - pred) & 0xFF
        out += bytes([ftype]) + bytes(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_decoder_inverts_every_filter(ftype, channels):
    shape = (6, 5) if channels == 1 else (6, 5, 3)
    img = _rng(10 + ftype).randint(0, 256, size=shape).astype(np.uint8)
    h, w = img.shape[0], img.shape[1]
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_forward_filter(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_filter_inversion_full_range_no_overflow_warning(ftype):
    """Wraparound stress: values spanning 0–255 force every modular add in
    the filter inversion to wrap. The decode must be exact AND warning-free —
    a uint8 scalar add would emit a NumPy RuntimeWarning per wrapping pixel
    (spamming executor logs inside mapInPandas) even though & 0xFF happens
    to produce the right value."""
    import warnings

    # Rows alternate 0/255 and ramp through the full range so Sub/Up/Average/
    # Paeth predictions all differ from the raw value by >255 somewhere.
    img = np.empty((8, 7), dtype=np.uint8)
    img[0::2] = np.tile(np.array([0, 255, 1, 254, 2, 253, 127], np.uint8), (4, 1))
    img[1::2] = np.linspace(255, 0, 7, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_forward_filter(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = decode_png(png)
    assert (out == img).all()


@pytest.mark.parametrize("shape", [(5, 7), (8, 8), (1, 1), (6, 5, 3), (16, 13, 3)])
def test_bmp_roundtrip(shape):
    from etl_caic_spark.operators.codecs import decode_bmp, encode_bmp

    img = _rng(31 + len(shape)).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == img.shape and (out == img).all()


def test_bmp_decodes_top_down_rows():
    """Externally-produced BMPs may store rows top-down (negative height)."""
    from etl_caic_spark.operators.codecs import decode_bmp, encode_bmp

    img = _rng(77).randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    data = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reverse stored row order
    w, h = 6, 4
    row = w * 3 + ((-w * 3) % 4)
    off = 54
    body = bytes(data[off:])
    rows = [body[i * row : (i + 1) * row] for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    data[22:26] = struct.pack("<i", -h)
    out = decode_bmp(bytes(data))
    assert (out == img).all()


def test_bmp_rejects_unsupported():
    from etl_caic_spark.operators.codecs import decode_bmp, encode_bmp

    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"NOTABMP")
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((3, 3), dtype=np.int32))
    with pytest.raises(ValueError, match="wants"):
        encode_bmp(np.zeros((3, 3, 4), dtype=np.uint8))


@pytest.mark.parametrize("shape", [(5, 7), (1, 1), (64, 64), (3, 200)])
def test_gif_roundtrip(shape):
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    img = _rng(53).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape and (out == img).all()


def test_gif_lzw_table_overflow_and_reset():
    """100x100 random pixels add ~1 LZW entry per pixel, overflowing the
    4096-entry table several times — the CLEAR-code reset path and every
    code width 9..12 are exercised."""
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    img = _rng(54).randint(0, 256, size=(100, 100)).astype(np.uint8)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_lzw_long_runs():
    """Uniform regions hit LZW's best case (long prefix chains) — the
    deferred-entry decode branch (code == next_code) must reconstruct."""
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    img = np.zeros((80, 80), np.uint8)
    img[40:] = 255
    img[:, 40:] ^= 7
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_skips_extension_blocks():
    """GIF89a files carry extension blocks (graphics control etc.) before
    the image descriptor — the decoder must skip them."""
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    img = _rng(55).randint(0, 256, size=(6, 9)).astype(np.uint8)
    data = bytearray(encode_gif(img))
    # splice a graphics-control extension after the global color table
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    insert_at = 13 + 256 * 3
    data[insert_at:insert_at] = gce
    data[0:6] = b"GIF89a"
    assert (decode_gif(bytes(data)) == img).all()


def test_gif_rejects_unsupported():
    from etl_caic_spark.operators.codecs import decode_gif, encode_gif

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF!")
    with pytest.raises(ValueError, match="wants"):
        encode_gif(np.zeros((3, 3, 3), dtype=np.uint8))  # RGB unsupported


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2), dtype=np.float64))


def test_resize_nearest_exact_factors():
    a = _rng(3).randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    half = resize_nearest(a, 4, 4)
    assert half.shape == (4, 4, 3)
    assert (half == a[::2, ::2]).all()
    up = resize_nearest(a, 16, 16)
    assert up.shape == (16, 16, 3)
    assert (up[::2, ::2] == a).all()


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip(channels):
    n = 500
    shape = (n,) if channels == 1 else (n, 2)
    s = _rng(4).randint(-(2**15), 2**15, size=shape).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert out.shape == s.shape and (out == s).all()


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope" * 10)


@pytest.mark.parametrize("shape", [(1, 1), (7, 11), (13, 5, 3), (1, 9, 3)])
def test_tiff_roundtrip(shape):
    from etl_caic_spark.operators.codecs import decode_tiff, encode_tiff

    a = _rng(9).randint(0, 256, size=shape).astype(np.uint8)
    out = decode_tiff(encode_tiff(a))
    assert out.shape == a.shape and (out == a).all()


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (7, 11), (5, 5, 3)])
def test_tiff_offsets_word_aligned(shape):
    """TIFF6 requires every offset to be even; an odd h*w greyscale
    strip must be padded before the IFD (strict external readers reject
    odd IFD / value offsets even though our own decoder tolerates
    them). StripByteCounts stays the UNPADDED pixel length."""
    import struct

    from etl_caic_spark.operators.codecs import decode_tiff, encode_tiff

    a = _rng(3).randint(0, 256, size=shape).astype(np.uint8)
    data = encode_tiff(a)
    (ifd_off,) = struct.unpack("<I", data[4:8])
    assert ifd_off % 2 == 0
    (n_entries,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack("<HHI", data[off : off + 8])
        total = {1: 1, 3: 2, 4: 4}[typ] * count
        if total > 4:  # out-of-line value (RGB BitsPerSample)
            (voff,) = struct.unpack("<I", data[off + 8 : off + 12])
            assert voff % 2 == 0, f"tag {tag} value offset odd"
        if tag == 279:  # StripByteCounts: unpadded pixel length
            (cnt,) = struct.unpack("<I", data[off + 8 : off + 12])
            assert cnt == a.size
    out = decode_tiff(data)
    assert out.shape == a.shape and (out == a).all()


def test_tiff_decodes_big_endian_and_multi_strip():
    """The encoder is single-strip little-endian; the decoder contract
    is wider — either byte order, any strip layout. Build an MM
    two-strip grey file by hand and decode it."""
    import struct

    from etl_caic_spark.operators.codecs import decode_tiff

    a = _rng(10).randint(0, 256, size=(4, 6)).astype(np.uint8)
    strips = [a[:2].tobytes(), a[2:].tobytes()]
    off1, off2 = 8, 8 + len(strips[0])
    ifd_off = off2 + len(strips[1])

    def entry(tag, typ, count, value):
        return struct.pack(">HHI", tag, typ, count) + struct.pack(">I", value)

    extra_off = ifd_off + 2 + 12 * 9 + 4
    ifd = struct.pack(">H", 9)
    ifd += entry(256, 4, 1, 6) + entry(257, 4, 1, 4) + entry(258, 3, 1, 8 << 16)
    ifd += entry(259, 3, 1, 1 << 16) + entry(262, 3, 1, 1 << 16)
    ifd += entry(273, 4, 2, extra_off) + entry(277, 3, 1, 1 << 16)
    ifd += entry(278, 4, 1, 2) + entry(279, 4, 2, extra_off + 8)
    ifd += struct.pack(">I", 0)
    extra = struct.pack(">II", off1, off2) + struct.pack(
        ">II", len(strips[0]), len(strips[1])
    )
    data = (
        b"MM" + struct.pack(">HI", 42, ifd_off) + strips[0] + strips[1] + ifd + extra
    )
    out = decode_tiff(data)
    assert out.shape == a.shape and (out == a).all()


def test_tiff_rejects_unsupported():
    from etl_caic_spark.operators.codecs import decode_tiff

    with pytest.raises(ValueError, match="byte order"):
        decode_tiff(b"XX" + b"\x00" * 20)
