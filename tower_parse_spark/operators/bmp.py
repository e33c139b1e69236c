"""Hermetic BMP decoder — public spec (Windows BITMAPINFOHEADER /
BITMAPV4/V5 layout as documented by Microsoft and the OS/2 1.x core
header), stdlib + numpy only.

Part of the multimodal real-decode family (PPM r13, PNG r14, JPEG
r14-r15): ``decode_real`` / ``phash_real`` route ``BM``-sniffed
payloads here when Pillow is absent, so the uncompressed workhorse
format never needs the optional dependency. Scope: bottom-up and
top-down rows; 1/2/4/8-bit palette (MSB-first bit groups at sub-byte
depths, 4-byte row alignment), 24-bit BGR, and 16/32-bit masked
pixels
(``BI_RGB`` defaults — 555 / BGRX — or explicit ``BI_BITFIELDS``
masks, each contiguous mask rescaled to 8 bits); 8-bit ``BI_RLE8``
run-length compression (absolute and encoded runs, end-of-line/bitmap
and delta escapes, the delta gap reading as the palette's index-0
color exactly as Windows renders it); 40-byte INFO and larger V4/V5
headers plus the 12-byte OS/2 CORE header; and Windows ICO/CUR
containers (:func:`_parse_ico` — best directory entry, doubled-height
DIBs, PNG-compressed Vista entries). Valid-but-unsupported
variants (``BI_RLE4``/``BI_JPEG``/``BI_PNG``
compressions) raise :class:`UnsupportedBmpError` so the dispatch can
name Pillow as the remedy — the same error-class contract as the PNG
and JPEG paths;
malformed payloads (bad magic, truncated headers or pixel data,
palette indexes past the table) raise plain ValueError.

Tests (tests/test_bmp.py) pin round-trips against an independent
spec-derived encoder for every supported depth/direction/compression
combination, byte-level hand-built fixtures, cross-format dHash
identity with PPM via the shared ``_dhash_rgb`` kernel, and the
Unsupported-vs-malformed error contract.
"""

from __future__ import annotations

import struct


class UnsupportedBmpError(ValueError):
    """A VALID BMP using features outside the supported subset
    (RLE4/embedded-codec compressions). Distinct from plain
    ValueError (malformed payload)
    so the Pillow-gated dispatch can name the optional dependency."""


_BI_RGB = 0
_BI_RLE8 = 1
_BI_RLE4 = 2
_BI_BITFIELDS = 3

#: header sizes we can walk: OS/2 CORE (12) and the INFO family
#: (40 = INFO, 52/56 = undocumented-but-seen V2/V3, 108 = V4, 124 = V5).
_INFO_SIZES = (40, 52, 56, 108, 124)


def _decode_rle8(data: bytes, w: int, h: int):
    """BI_RLE8 -> HxW uint8 index raster (row 0 = bottom row, matching
    the bottom-up file order; the caller flips). Pixels the stream
    never writes stay index 0, which is how the delta escape's skipped
    gap renders."""
    import numpy as np

    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("truncated BMP RLE8 stream")
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count:  # encoded run
            if y >= h or x + count > w:
                raise ValueError("BMP RLE8 run past row end")
            idx[y, x : x + count] = val
            x += count
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("truncated BMP RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta out of bounds")
        else:  # absolute run of `val` literal indexes, word-aligned
            if y >= h or x + val > w:
                raise ValueError("BMP RLE8 absolute run past row end")
            if pos + val > n:
                raise ValueError("truncated BMP RLE8 absolute run")
            idx[y, x : x + val] = np.frombuffer(
                data, dtype=np.uint8, count=val, offset=pos
            )
            x += val
            pos += val + (val & 1)


def _parse_bmp(payload: bytes):
    """Full pixel decode: returns ``(width, height, HxWx3 uint8 RGB)``
    with row 0 at the TOP regardless of the file's row direction."""
    import numpy as np

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size == 12:  # OS/2 BITMAPCOREHEADER: u16 dims, no compression
        w, h, _planes, bpp = struct.unpack_from("<HHHH", payload, 18)
        top_down, compression, pal_entry = False, _BI_RGB, 3
        pal_off, n_colors = 14 + 12, 0
    elif hdr_size in _INFO_SIZES:
        if len(payload) < 14 + 40:
            raise ValueError("truncated BMP info header")
        w, h_raw, _planes, bpp, compression = struct.unpack_from(
            "<iiHHI", payload, 18
        )
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        top_down, h = h_raw < 0, abs(h_raw)
        pal_entry, pal_off = 4, 14 + hdr_size
    else:
        raise ValueError(f"unknown BMP header size {hdr_size}")
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    if w * h > 64_000_000:
        raise ValueError("BMP dimensions exceed the 64MP decode cap")
    if bpp not in (1, 2, 4, 8, 16, 24, 32):
        raise ValueError(f"bad BMP bit depth {bpp}")
    if compression == _BI_RLE4:
        raise UnsupportedBmpError("BI_RLE4")
    if compression == _BI_RLE8 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8-bit pixels")
    if compression == _BI_BITFIELDS and bpp not in (16, 32):
        raise ValueError("BI_BITFIELDS requires 16/32-bit pixels")
    if compression not in (_BI_RGB, _BI_RLE8, _BI_BITFIELDS):
        raise UnsupportedBmpError(f"BMP compression {compression}")
    if compression == _BI_RLE8 and top_down:
        raise ValueError("top-down BMP cannot be RLE-compressed")
    masks = None
    if compression == _BI_BITFIELDS:
        # For a 40-byte INFO header the three channel masks follow it;
        # for V4/V5 they are in-header fields — the same file offset
        # either way. The palette (unused at these depths) comes after.
        if len(payload) < 14 + 40 + 12:
            raise ValueError("truncated BMP bitfield masks")
        masks = struct.unpack_from("<III", payload, 14 + 40)
        if hdr_size == 40:
            pal_off += 12
    elif bpp == 16:
        masks = (0x7C00, 0x03E0, 0x001F)  # BI_RGB 16-bit default: 555
    elif bpp == 32:
        masks = (0x00FF0000, 0x0000FF00, 0x000000FF)

    if bpp <= 8:
        n_pal = n_colors or (1 << bpp)
        if n_pal > 256 or pal_off + pal_entry * n_pal > len(payload):
            raise ValueError("truncated BMP palette")
        pal_raw = np.frombuffer(
            payload, dtype=np.uint8, count=pal_entry * n_pal, offset=pal_off
        ).reshape(n_pal, pal_entry)
        palette = pal_raw[:, 2::-1]  # BGR(X) quads -> RGB
        if compression == _BI_RLE8:
            idx = _decode_rle8(payload[pix_off:], w, h)[::-1]
        elif bpp == 8:
            stride = (w + 3) & ~3
            if pix_off + stride * h > len(payload):
                raise ValueError("truncated BMP pixel data")
            idx = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=pix_off
            ).reshape(h, stride)[:, :w]
            if not top_down:
                idx = idx[::-1]
        else:  # 1/2/4-bit: MSB-first bit groups, 4-byte row alignment
            stride = ((w * bpp + 31) // 32) * 4
            if pix_off + stride * h > len(payload):
                raise ValueError("truncated BMP pixel data")
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h,
                offset=pix_off
            ).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            grouped = bits.reshape(h, w, bpp)
            idx = np.zeros((h, w), dtype=np.uint8)
            for i in range(bpp):
                idx |= grouped[:, :, i] << (bpp - 1 - i)
            if not top_down:
                idx = idx[::-1]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP palette index out of range")
        rgb = palette[idx]
    elif bpp == 24:
        stride = (w * 3 + 3) & ~3
        if pix_off + stride * h > len(payload):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=pix_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        rgb = rows[:, :, ::-1]  # BGR -> RGB
    else:  # 16/32-bit: masked little-endian words (BI_RGB defaults or
        # explicit BI_BITFIELDS masks), each channel rescaled to 8 bits
        nby = bpp // 8
        stride = (w * nby + 3) & ~3
        if pix_off + stride * h > len(payload):
            raise ValueError("truncated BMP pixel data")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=pix_off
        ).reshape(h, stride)[:, : w * nby].reshape(h, w, nby)
        words = raw.astype(np.uint32)[:, :, 0]
        for i in range(1, nby):
            words |= raw.astype(np.uint32)[:, :, i] << (8 * i)
        if not top_down:
            words = words[::-1]
        chans = []
        for mask in masks:
            if mask == 0 or mask & (mask + (mask & -mask)):
                raise ValueError(f"non-contiguous BMP channel mask {mask:#x}")
            shift = (mask & -mask).bit_length() - 1
            width_bits = (mask >> shift).bit_length()
            vals = (words & mask) >> shift
            if width_bits != 8:
                vals = vals * 255 // ((1 << width_bits) - 1)
            chans.append(vals.astype(np.uint8))
        rgb = np.stack(chans, axis=2)
    return w, h, np.ascontiguousarray(rgb)


def decode_bmp_meta(payload: bytes) -> dict:
    """Header-only metadata decode (same contract as the PNG/JPEG meta
    paths: dimensions must not pay the full pixel decode)."""
    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size == 12:
        w, h = struct.unpack_from("<HH", payload, 18)
    elif hdr_size in _INFO_SIZES:
        w, h_raw = struct.unpack_from("<ii", payload, 18)
        h = abs(h_raw)
    else:
        raise ValueError(f"unknown BMP header size {hdr_size}")
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    return {"n_bytes": len(payload), "width": w, "height": h,
            "format": "bmp"}


def _parse_ico(payload: bytes):
    """Windows ICO/CUR decode (the ICONDIR layout Microsoft documents):
    walk the icon directory, pick the BEST image (largest area, then
    deepest bpp — what shell thumbnailers render), and decode it.
    Classic entries are headerless DIBs whose BITMAPINFOHEADER height
    is DOUBLED (XOR bitmap + AND transparency mask; the mask is
    ignored — the family renders base colors, the GIF-transparency
    stance); Vista-era entries are whole PNG streams and route to the
    PNG decoder. Returns ``(width, height, HxWx3 uint8 RGB)``."""
    import struct as _struct

    if len(payload) < 6:
        raise ValueError("not an ICO payload")
    res, typ, count = _struct.unpack_from("<HHH", payload, 0)
    if res != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO payload")
    best = None
    for i in range(count):
        base = 6 + i * 16
        if base + 16 > len(payload):
            raise ValueError("truncated ICO directory")
        w8, h8, _colors, _r, _planes, bpp, size, off = \
            _struct.unpack_from("<BBBBHHII", payload, base)
        w = w8 or 256
        h = h8 or 256
        if off + size > len(payload):
            raise ValueError("truncated ICO image data")
        key = (w * h, bpp)
        if best is None or key > best[0]:
            best = (key, off, size)
    _key, off, size = best
    body = payload[off : off + size]
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from tower_parse_spark.operators.multimodal import _parse_png

        return _parse_png(body)
    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    (hdr_size,) = _struct.unpack_from("<I", body, 0)
    if hdr_size != 40:
        raise ValueError(f"unexpected ICO DIB header size {hdr_size}")
    # synthesize a BMP file around the DIB, halving the doubled height
    # (the AND mask rows after the XOR bitmap are simply not read:
    # _parse_bmp stops at the halved raster)
    (h2,) = _struct.unpack_from("<i", body, 8)
    fixed = bytearray(body)
    _struct.pack_into("<i", fixed, 8, h2 // 2)
    (bpp,) = _struct.unpack_from("<H", body, 14)
    (n_colors,) = _struct.unpack_from("<I", body, 32)
    pal_entries = (n_colors or (1 << bpp)) if bpp <= 8 else 0
    pix_off = 14 + 40 + 4 * pal_entries
    shell = (b"BM" + _struct.pack("<IHHI", 14 + len(fixed), 0, 0,
                                  pix_off) + bytes(fixed))
    return _parse_bmp(shell)


def decode_ico_meta(payload: bytes) -> dict:
    """Directory-only metadata: the best entry's dimensions."""
    import struct as _struct

    if len(payload) < 6:
        raise ValueError("not an ICO payload")
    res, typ, count = _struct.unpack_from("<HHH", payload, 0)
    if res != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO payload")
    best = (0, 0, 0, 0)
    for i in range(count):
        base = 6 + i * 16
        if base + 16 > len(payload):
            raise ValueError("truncated ICO directory")
        w8, h8 = payload[base], payload[base + 1]
        (bpp,) = _struct.unpack_from("<H", payload, base + 6)
        w = w8 or 256
        h = h8 or 256
        if (w * h, bpp) > (best[0] * best[1], best[2]):
            best = (w, h, bpp, i)
    return {"n_bytes": len(payload), "width": best[0],
            "height": best[1], "format": "ico"}
