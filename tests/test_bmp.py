"""Hermetic BMP decoder (operators/bmp.py): round-trips against an
independent spec-derived encoder for every supported depth / direction
/ compression, real-encoder file smoke (CPython ships a V5 BITFIELDS
BMP in this container), cross-format dHash identity via the shared
kernel, and the Unsupported-vs-malformed error contract."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators.bmp import (
    UnsupportedBmpError,
    _parse_bmp,
    decode_bmp_meta,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _bmp24(rgb, top_down=False, hdr_size=40):
    """Independent spec-derived 24-bit BI_RGB encoder (bottom-up by
    default, top-down via negative height)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = rgb if top_down else rgb[::-1]
    for r in order:
        row = r[:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    off = 14 + hdr_size
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            hdr_size, w, -h if top_down else h, 1, 24, 0,
            len(pix), 2835, 2835, 0, 0,
        )
        + b"\x00" * (hdr_size - 40)
    )
    return header + pix


def _bmp8(idx, palette, rle=False, n_colors=None):
    """8-bit palette encoder; optional BI_RLE8 (encoded runs only —
    the absolute/delta escapes get hand-built streams below)."""
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    if rle:
        out = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            x = 0
            while x < w:
                run = 1
                while x + run < w and idx[y, x + run] == idx[y, x] \
                        and run < 255:
                    run += 1
                out += bytes([run, idx[y, x]])
                x += run
            out += b"\x00\x00"  # end of line
        out += b"\x00\x01"  # end of bitmap
        pix = bytes(out)
    else:
        stride = (w + 3) & ~3
        pix = b"".join(
            idx[y].tobytes() + b"\x00" * (stride - w)
            for y in range(h - 1, -1, -1)
        )
    off = 14 + 40 + len(pal)
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, 8, 1 if rle else 0,
            len(pix), 0, 0, n_colors or len(palette), 0,
        )
        + pal
        + pix
    )


def _bmp_masked(rgb, bpp, masks=None, compression=None):
    """16/32-bit encoder: BI_RGB defaults or explicit BI_BITFIELDS."""
    h, w, _ = rgb.shape
    if masks is None:
        masks = (0x7C00, 0x03E0, 0x001F) if bpp == 16 else (
            0x00FF0000, 0x0000FF00, 0x000000FF)
        compression = 0 if compression is None else compression
    else:
        compression = 3
    words = np.zeros((h, w), dtype=np.uint64)
    for ch, mask in enumerate(masks):
        shift = (mask & -mask).bit_length() - 1
        bits = (mask >> shift).bit_length()
        vals = rgb[:, :, ch].astype(np.uint64)
        if bits != 8:
            # encode the exact value the decoder's rescale recovers
            vals = (vals * ((1 << bits) - 1) + 127) // 255
        else:
            vals = vals & 0xFF
        words |= vals << shift
    nby = bpp // 8
    stride = (w * nby + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = b"".join(
            int(v).to_bytes(nby, "little") for v in words[y]
        )
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    extra = struct.pack("<III", *masks) if compression == 3 else b""
    off = 14 + 40 + len(extra)
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, bpp, compression, len(pix), 0, 0, 0, 0,
        )
        + extra
        + pix
    )


def test_bmp24_roundtrip_both_directions():
    rgb = _rng(1).integers(0, 256, (7, 5, 3), dtype=np.uint8)
    for top_down in (False, True):
        w, h, got = _parse_bmp(_bmp24(rgb, top_down=top_down))
        assert (w, h) == (5, 7)
        assert (got == rgb).all()


def test_bmp24_v4_v5_header_sizes():
    rgb = _rng(2).integers(0, 256, (3, 3, 3), dtype=np.uint8)
    for hdr in (52, 56, 108, 124):
        assert (_parse_bmp(_bmp24(rgb, hdr_size=hdr))[2] == rgb).all()


def test_bmp8_palette_roundtrip():
    pal = _rng(3).integers(0, 256, (17, 3), dtype=np.uint8)
    idx = _rng(4).integers(0, 17, (6, 9), dtype=np.uint8)
    got = _parse_bmp(_bmp8(idx, pal))[2]
    assert (got == pal[idx]).all()


def test_bmp8_rle8_roundtrip_and_escapes():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.repeat(
        _rng(5).integers(0, 3, (4, 4), dtype=np.uint8), 3, axis=1
    )  # runs to compress
    got = _parse_bmp(_bmp8(idx, pal, rle=True))[2]
    assert (got == pal[idx]).all()
    # hand-built stream: absolute run + delta + early end-of-bitmap on
    # a 4x2 canvas (bottom row: abs run of 3 literals, then delta skips
    # into the top row; untouched pixels read as palette index 0)
    pix = (
        b"\x00\x03\x01\x02\x01\x00"  # absolute: 3 literals + pad
        + b"\x00\x02\x00\x01"  # delta: x+=0, y+=1
        + b"\x01\x02"  # encoded run: 1 x index 2
        + b"\x00\x01"  # end of bitmap
    )
    pal4 = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    off = 14 + 40 + len(pal4)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1,
                      len(pix), 0, 0, 3, 0)
        + pal4 + pix
    )
    got = _parse_bmp(payload)[2]
    want_idx = np.array([[0, 0, 0, 2], [1, 2, 1, 0]], np.uint8)
    assert (got == pal[want_idx]).all()


def test_bmp_16_and_32_bit_masked():
    rgb = _rng(6).integers(0, 256, (5, 4, 3), dtype=np.uint8)
    # 32-bit BI_RGB BGRX: exact
    assert (_parse_bmp(_bmp_masked(rgb, 32))[2] == rgb).all()
    # 32-bit explicit BITFIELDS with the standard masks: exact
    assert (
        _parse_bmp(
            _bmp_masked(rgb, 32,
                        masks=(0x00FF0000, 0x0000FF00, 0x000000FF))
        )[2] == rgb
    ).all()
    # 16-bit 555 and RGB565: quantized round-trip (encoder rounds to
    # the 5/6-bit ladder, decoder floor-rescales: half a ladder step
    # plus the floor, ~6 at 5 bits)
    for masks in (None, (0xF800, 0x07E0, 0x001F)):
        got = _parse_bmp(_bmp_masked(rgb, 16, masks=masks))[2]
        assert int(np.abs(got.astype(int) - rgb.astype(int)).max()) <= 6


def test_bmp_os2_core_header():
    rgb = _rng(7).integers(0, 256, (3, 2, 3), dtype=np.uint8)
    h, w = 3, 2
    stride = (w * 3 + 3) & ~3
    pix = b"".join(
        rgb[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    off = 14 + 12
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IHHHH", 12, w, h, 1, 24)
        + pix
    )
    pw, ph, got = _parse_bmp(payload)
    assert (pw, ph) == (w, h) and (got == rgb).all()


def test_bmp_meta_matches_full_decode():
    rgb = _rng(8).integers(0, 256, (9, 11, 3), dtype=np.uint8)
    p = _bmp24(rgb)
    meta = decode_bmp_meta(p)
    assert meta == {"n_bytes": len(p), "width": 11, "height": 9,
                    "format": "bmp"}


def test_bmp_unsupported_vs_malformed():
    rgb = _rng(9).integers(0, 256, (2, 2, 3), dtype=np.uint8)
    p = bytearray(_bmp24(rgb))
    # RLE4: valid BMP, unsupported subset
    rle4 = bytearray(p)
    struct.pack_into("<H", rle4, 28, 8)
    struct.pack_into("<I", rle4, 30, 2)
    with pytest.raises(UnsupportedBmpError):
        _parse_bmp(bytes(rle4))
    # malformed: magic, truncation, zero dims, weird header size
    with pytest.raises(ValueError, match="not a BMP"):
        _parse_bmp(b"XX" + bytes(p[2:]))
    with pytest.raises(ValueError, match="truncated"):
        _parse_bmp(bytes(p[:-8]))
    zero = bytearray(p)
    struct.pack_into("<i", zero, 18, 0)
    with pytest.raises(ValueError, match="dimensions"):
        _parse_bmp(bytes(zero))
    odd = bytearray(p)
    struct.pack_into("<I", odd, 14, 64)
    with pytest.raises(ValueError, match="header size"):
        _parse_bmp(bytes(odd))
    # palette index past the declared table
    pal = np.array([[1, 2, 3]], np.uint8)
    idx = np.zeros((2, 2), np.uint8)
    idx[0, 0] = 3
    with pytest.raises(ValueError, match="palette index"):
        _parse_bmp(_bmp8(idx, pal))


def test_bmp_real_encoder_file():
    """CPython's 16x16 Python-logo BMP: a V5 (124-byte) header with
    BI_BITFIELDS 32-bit pixels — the layout a real exporter writes."""
    files = sorted(
        glob.glob("/root/.pyenv/versions/*/lib/*/test/imghdrdata/"
                  "python.bmp")
    )
    if not files:
        pytest.skip("container image data files not present")
    payload = open(files[0], "rb").read()
    w, h, rgb = _parse_bmp(payload)
    assert (w, h) == (16, 16)
    assert rgb.std() > 30  # a real logo, not a smeared raster
    assert decode_bmp_meta(payload)["width"] == 16


def test_bmp_dispatch_and_cross_format_hash():
    """decode_real/phash_real route BMPs hermetically, and the same
    pixels in a P6 PPM and a BMP hash identically through the shared
    kernel (no Pillow in this container; with it the real-decode path
    is covered by the fake-Pillow kernel test)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — hermetic fallback never runs")
    except ImportError:
        pass
    rng = _rng(10)
    rgb = np.repeat(
        np.repeat(rng.integers(0, 256, (4, 9, 3), dtype=np.uint8),
                  8, axis=0), 8, axis=1
    )
    p_bmp = _bmp24(rgb)
    meta = M.decode_real(p_bmp)
    assert meta == {"n_bytes": len(p_bmp), "width": 72, "height": 32,
                    "format": "bmp"}
    h_, w_ = rgb.shape[:2]
    ppm = b"P6 %d %d 255\n" % (w_, h_) + rgb.tobytes()
    assert M.phash_real(p_bmp) == M.phash_real(ppm)


def test_bmp_sub_byte_palette_depths():
    """r15 late: 1/2/4-bit palette BMPs decode (MSB-first bit groups,
    4-byte row alignment) — the classic icon/clipart depths."""
    for bpp in (1, 2, 4):
        n = 1 << bpp
        pal = _rng(20 + bpp).integers(0, 256, (n, 3), dtype=np.uint8)
        idx = _rng(30 + bpp).integers(0, n, (5, 11), dtype=np.uint8)
        h, w = idx.shape
        stride = ((w * bpp + 31) // 32) * 4
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            bits = np.zeros(stride * 8, np.uint8)
            for x in range(w):
                for i in range(bpp):
                    bits[x * bpp + i] = (idx[y, x] >> (bpp - 1 - i)) & 1
            rows.append(np.packbits(bits).tobytes())
        pix = b"".join(rows)
        pal4 = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
        off = 14 + 40 + len(pal4)
        payload = (
            b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0,
                          len(pix), 0, 0, n, 0)
            + pal4 + pix
        )
        got = _parse_bmp(payload)[2]
        assert (got == pal[idx]).all(), bpp


def test_ico_real_file_and_best_entry():
    """The real idle.ico CPython ships: 7 entries (4/8/32-bit); the
    decoder must pick the 48x48 32-bit one and decode real pixels,
    and the 4-bit entries must decode too via the sub-byte path."""
    import glob as _glob

    from tower_parse_spark.operators.bmp import (
        _parse_ico,
        decode_ico_meta,
    )

    files = sorted(_glob.glob(
        "/root/.pyenv/versions/*/lib/*/idlelib/Icons/idle.ico"))
    if not files:
        pytest.skip("container image data files not present")
    payload = open(files[0], "rb").read()
    meta = decode_ico_meta(payload)
    assert (meta["width"], meta["height"], meta["format"]) == (
        48, 48, "ico")
    w, h, rgb = _parse_ico(payload)
    assert (w, h) == (48, 48) and rgb.std() > 30
    # malformed directory
    with pytest.raises(ValueError, match="ICO"):
        _parse_ico(b"\x00\x00\x03\x00\x01\x00")
    with pytest.raises(ValueError, match="truncated"):
        _parse_ico(payload[:20])


def test_ico_dispatch():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — hermetic fallback never runs")
    except ImportError:
        pass
    import glob as _glob

    from tower_parse_spark.operators import multimodal as MM

    files = sorted(_glob.glob(
        "/root/.pyenv/versions/*/lib/*/idlelib/Icons/idle.ico"))
    if not files:
        pytest.skip("container image data files not present")
    payload = open(files[0], "rb").read()
    meta = MM.decode_real(payload)
    assert meta["format"] == "ico" and meta["width"] == 48
    assert isinstance(MM.phash_real(payload), int)
