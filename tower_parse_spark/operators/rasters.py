"""Hermetic legacy-raster decoders — public specs (the netpbm formats
P1-P5, Sun Rasterfile as documented in SunOS <rasterfile.h>, SGI RGB
per the Haeberli spec, X11 XBM as emitted by bitmap(1)), stdlib +
numpy only.

Rounds out the multimodal real-decode family: the archival/UNIX
formats a 100 TB scrape inevitably contains in the long tail. Each
parser returns the family's uniform ``(width, height, HxWx3 uint8
RGB)`` and plugs into ``multimodal._hermetic_formats`` (sniff ->
header-only meta fn + pixel fn), so ``decode_real`` / ``phash_real``
handle them with NO optional dependency and identical pixels keep
hashing identically across containers.

Scope:
- netpbm P1/P2/P3 (ASCII bitmap/gray/RGB — P1 digits may abut per the
  spec) and P4/P5 (packed-bit bitmap MSB-first, binary gray incl.
  16-bit big-endian maxval > 255 scaled to 8); P6 stays in
  ``multimodal._parse_ppm`` (r13). Sub-255 maxvals rescale so white
  is white in every variant. In P1/P4, 1 = BLACK (the netpbm
  convention).
- Sun Rasterfile: 8-word big-endian header; RT_STANDARD/RT_OLD (BGR),
  RT_FORMAT_RGB, and RT_BYTE_ENCODED (the 0x80-escape RLE); depths
  1 (bitmap), 8 (gray or colormapped via RMT_EQUAL_RGB), 24 and 32
  (with the pad/alpha byte leading); rows padded to 16 bits.
- SGI image (magic 0x01DA): VERBATIM and RLE storage at bpc=1 plus
  16-bit VERBATIM (bpc=2, high-byte rescale — r15 late),
  dimension 1/2/3 with 1/3/4 channels (luminance replicated, alpha
  dropped), bottom-up rows, per-(row, channel) RLE offset tables.
  bpc=2 RLE (16-bit count/value words) raises the Unsupported class.
- XBM: the C-source text format (#define width/height + hex byte
  array), bits LSB-first, 1 = foreground = black.

Valid-but-unsupported variants raise
:class:`UnsupportedRasterError`; malformed payloads raise plain
ValueError — the family's uniform error contract. Tests
(tests/test_rasters.py) pin round-trips against independent
spec-derived encoders AND the real CPython imghdrdata fixtures, which
all encode the SAME Python logo: the cross-format pixel/dHash
identity extends to python.{ppm,pgm,pbm,ras,sgi,xbm} (the gray/bw
variants collide with the gray/bw renditions of the color ones).
"""

from __future__ import annotations

import struct


class UnsupportedRasterError(ValueError):
    """A VALID legacy raster outside the supported subset (bpc=2 SGI,
    exotic Sun types). Distinct from plain ValueError (malformed) so
    the Pillow-gated dispatch can name the optional dependency."""


# ---------------------------------------------------------------------------
# netpbm P1-P5
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes, n_fields: int):
    """Whitespace/comment tokenizer shared by every netpbm variant;
    returns (fields, position after the single post-header byte)."""
    pos, fields = 2, []
    while len(fields) < n_fields:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) \
                and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        fields.append(payload[start:pos])
    try:
        vals = [int(f) for f in fields]
    except ValueError as exc:
        raise ValueError(f"non-numeric PNM header {fields}") from exc
    return vals, pos + 1  # exactly ONE whitespace byte (spec)


def _ascii_tokens(payload: bytes, pos: int, n: int, bitmap: bool):
    """ASCII sample scan: P2/P3 numbers are whitespace-separated;
    P1 digits may abut (the spec allows '0110')."""
    out = []
    cur = b""
    i = pos
    while i < len(payload) and len(out) < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        if bitmap:
            if c in (b"0", b"1"):
                out.append(0 if c == b"0" else 1)
            elif not c.isspace():
                raise ValueError("bad P1 bitmap character")
        else:
            if c.isspace():
                if cur:
                    out.append(int(cur))
                    cur = b""
            elif c.isdigit():
                cur += c
            else:
                raise ValueError("bad PNM ASCII sample")
        i += 1
    if cur and len(out) < n:
        out.append(int(cur))
    if len(out) < n:
        raise ValueError("PNM ASCII raster truncated")
    return out


def _parse_pnm(payload: bytes):
    """P1-P5 decode (P6 lives in ``multimodal._parse_ppm``)."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5"):
        raise ValueError("not a PNM payload")
    kind = magic[1] - 0x30
    bitmap = kind in (1, 4)
    n_fields = 2 if bitmap else 3
    vals, pos = _pnm_header(payload, n_fields)
    w, h = vals[0], vals[1]
    maxval = 1 if bitmap else vals[2]
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    if w * h > 64_000_000:
        raise ValueError("PNM dimensions exceed the 64MP decode cap")
    if not bitmap and not 0 < maxval < 65536:
        raise ValueError(f"bad PNM maxval {maxval}")
    spp = 3 if kind == 3 else 1
    n = w * h * spp
    if kind in (1, 2, 3):
        if kind == 1:
            pos -= 1  # ASCII variants have no single-byte raster rule
        samples = np.array(
            _ascii_tokens(payload, pos, n, bitmap), dtype=np.int64
        )
    elif kind == 4:
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        raw = payload[pos : pos + need]
        if len(raw) < need:
            raise ValueError("P4 raster truncated")
        samples = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes),
            axis=1,
        )[:, :w].astype(np.int64).ravel()
    else:  # P5
        wide = maxval > 255
        need = n * (2 if wide else 1)
        raw = payload[pos : pos + need]
        if len(raw) < need:
            raise ValueError("P5 raster truncated")
        samples = np.frombuffer(
            raw, dtype=">u2" if wide else np.uint8
        ).astype(np.int64)
    if samples.max(initial=0) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    if bitmap:
        gray = np.where(samples == 1, 0, 255)  # 1 = black
    else:
        gray = samples * 255 // maxval
    px = gray.astype(np.uint8).reshape(h, w, spp)
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return w, h, np.ascontiguousarray(px)


def decode_pnm_meta(payload: bytes) -> dict:
    magic = payload[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5"):
        raise ValueError("not a PNM payload")
    bitmap = magic[1] in (0x31, 0x34)
    vals, _pos = _pnm_header(payload, 2 if bitmap else 3)
    if vals[0] <= 0 or vals[1] <= 0:
        raise ValueError("bad PNM dimensions")
    return {"n_bytes": len(payload), "width": vals[0],
            "height": vals[1],
            "format": {0x31: "pbm", 0x34: "pbm", 0x32: "pgm",
                       0x35: "pgm"}.get(magic[1], "ppm")}


# ---------------------------------------------------------------------------
# Sun Rasterfile
# ---------------------------------------------------------------------------

_SUN_MAGIC = b"\x59\xa6\x6a\x95"


def _sun_unrle(data: bytes, expected: int) -> bytes:
    """RT_BYTE_ENCODED: 0x80 n v = repeat v n+1 times; 0x80 0x00 = a
    literal 0x80; anything else is a literal byte."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        if b == 0x80:
            if i + 1 >= n:
                raise ValueError("truncated Sun RLE escape")
            cnt = data[i + 1]
            if cnt == 0:
                out.append(0x80)
                i += 2
            else:
                if i + 2 >= n:
                    raise ValueError("truncated Sun RLE run")
                out += bytes([data[i + 2]]) * (cnt + 1)
                i += 3
        else:
            out.append(b)
            i += 1
    if len(out) < expected:
        raise ValueError("Sun RLE stream too short")
    return bytes(out[:expected])


def _parse_sun(payload: bytes):
    import numpy as np

    if len(payload) < 32 or payload[:4] != _SUN_MAGIC:
        raise ValueError("not a Sun raster payload")
    w, h, depth, _length, rtype, maptype, maplen = struct.unpack_from(
        ">IIIIIII", payload, 4
    )
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("bad Sun raster dimensions")
    if w * h > 64_000_000:
        raise ValueError("Sun raster exceeds the 64MP decode cap")
    if rtype not in (0, 1, 2, 3):  # old / standard / RLE / RGB-order
        raise UnsupportedRasterError(f"Sun raster type {rtype}")
    if depth not in (1, 8, 24, 32):
        raise UnsupportedRasterError(f"{depth}-bit Sun raster")
    pos = 32
    cmap = None
    if maplen:
        raw_map = payload[pos : pos + maplen]
        if len(raw_map) < maplen:
            raise ValueError("truncated Sun raster colormap")
        if maptype == 1 and maplen % 3 == 0:  # RMT_EQUAL_RGB
            third = maplen // 3
            cmap = np.stack(
                [np.frombuffer(raw_map, np.uint8, third, off)
                 for off in (0, third, 2 * third)], axis=1
            )
        pos += maplen
    row_bits = w * depth
    stride = ((row_bits + 15) // 16) * 2  # rows pad to 16 bits
    need = stride * h
    data = payload[pos:]
    if rtype == 2:
        data = _sun_unrle(data, need)
    elif len(data) < need:
        raise ValueError("truncated Sun raster data")
    rows = np.frombuffer(data[:need], dtype=np.uint8).reshape(h,
                                                              stride)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        gray = np.where(bits == 1, 0, 255).astype(np.uint8)  # 1=black
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
    elif depth == 8:
        idx = rows[:, :w]
        if cmap is not None:
            if int(idx.max(initial=0)) >= len(cmap):
                raise ValueError("Sun raster index out of colormap")
            rgb = cmap[idx]
        else:
            rgb = np.repeat(idx[:, :, None], 3, axis=2)
    else:
        nby = depth // 8
        px = rows[:, : w * nby].reshape(h, w, nby)
        if depth == 32:
            px = px[:, :, 1:]  # pad/alpha byte leads
        # BGR unless RT_FORMAT_RGB
        rgb = px if rtype == 3 else px[:, :, ::-1]
    return int(w), int(h), np.ascontiguousarray(rgb)


def decode_sun_meta(payload: bytes) -> dict:
    if len(payload) < 32 or payload[:4] != _SUN_MAGIC:
        raise ValueError("not a Sun raster payload")
    w, h = struct.unpack_from(">II", payload, 4)
    if w <= 0 or h <= 0:
        raise ValueError("bad Sun raster dimensions")
    return {"n_bytes": len(payload), "width": int(w), "height": int(h),
            "format": "ras"}


# ---------------------------------------------------------------------------
# SGI image
# ---------------------------------------------------------------------------


def _parse_sgi(payload: bytes):
    import numpy as np

    if len(payload) < 512 or payload[:2] != b"\x01\xda":
        raise ValueError("not an SGI image payload")
    storage, bpc = payload[2], payload[3]
    _dim, w, h, channels = struct.unpack_from(">HHHH", payload, 4)
    if storage not in (0, 1):
        raise ValueError(f"bad SGI storage {storage}")
    if bpc not in (1, 2):
        raise ValueError(f"bad SGI bytes-per-channel {bpc}")
    if bpc == 2 and storage == 1:
        # 16-bit RLE runs use 16-bit count/value words — rare enough
        # to stay gated (16-bit VERBATIM decodes below)
        raise UnsupportedRasterError("bpc=2 RLE SGI image")
    if w <= 0 or h <= 0 or channels not in (1, 3, 4):
        raise ValueError("bad SGI geometry")
    if w * h > 64_000_000:
        raise ValueError("SGI dimensions exceed the 64MP decode cap")
    chans = np.empty((channels, h, w), dtype=np.uint8)
    if storage == 0:  # VERBATIM: channel planes, rows bottom-up
        need = 512 + w * h * channels * bpc
        if len(payload) < need:
            raise ValueError("truncated SGI verbatim data")
        if bpc == 2:  # 16-bit big-endian samples -> high byte
            wide = np.frombuffer(
                payload, ">u2", w * h * channels, 512
            ).reshape(channels, h, w)
            planes = (wide >> 8).astype(np.uint8)
        else:
            planes = np.frombuffer(
                payload, np.uint8, w * h * channels, 512
            ).reshape(channels, h, w)
        chans = planes[:, ::-1]  # bottom-up -> top-down
    else:  # RLE: per-(row, channel) offset/length tables
        tab = h * channels
        if len(payload) < 512 + 8 * tab:
            raise ValueError("truncated SGI RLE tables")
        starts = np.frombuffer(payload, ">u4", tab, 512)
        lengths = np.frombuffer(payload, ">u4", tab, 512 + 4 * tab)
        for c in range(channels):
            for y in range(h):
                off = int(starts[c * h + y])
                ln = int(lengths[c * h + y])
                row = _sgi_unrle(payload[off : off + ln], w)
                chans[c, h - 1 - y] = row
    if channels == 1:
        rgb = np.repeat(chans[0][:, :, None], 3, axis=2)
    else:
        rgb = np.stack([chans[0], chans[1], chans[2]], axis=2)
    return int(w), int(h), np.ascontiguousarray(rgb)


def _sgi_unrle(data: bytes, w: int):
    import numpy as np

    out = np.zeros(w, dtype=np.uint8)
    i = o = 0
    n = len(data)
    while i < n:
        b = data[i]
        i += 1
        count = b & 0x7F
        if count == 0:
            break
        if o + count > w:
            raise ValueError("SGI RLE row overflow")
        if b & 0x80:  # literal run
            if i + count > n:
                raise ValueError("truncated SGI RLE literal")
            out[o : o + count] = np.frombuffer(data, np.uint8, count,
                                               i)
            i += count
        else:  # repeat run
            if i >= n:
                raise ValueError("truncated SGI RLE repeat")
            out[o : o + count] = data[i]
            i += 1
        o += count
    if o < w:
        raise ValueError("SGI RLE row underflow")
    return out


def decode_sgi_meta(payload: bytes) -> dict:
    if len(payload) < 12 or payload[:2] != b"\x01\xda":
        raise ValueError("not an SGI image payload")
    _dim, w, h = struct.unpack_from(">HHH", payload, 4)
    if w <= 0 or h <= 0:
        raise ValueError("bad SGI geometry")
    return {"n_bytes": len(payload), "width": int(w), "height": int(h),
            "format": "sgi"}


# ---------------------------------------------------------------------------
# X11 XBM (C source text)
# ---------------------------------------------------------------------------


def _parse_xbm(payload: bytes):
    import re

    import numpy as np

    try:
        text = payload.decode("ascii")
    except UnicodeDecodeError as exc:
        raise ValueError("not an XBM payload") from exc
    dims = dict(re.findall(
        r"#define\s+\w*?_?(width|height)\s+(\d+)", text))
    if "width" not in dims or "height" not in dims:
        raise ValueError("XBM missing width/height defines")
    w, h = int(dims["width"]), int(dims["height"])
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("bad XBM dimensions")
    body = text[text.find("{") + 1 : text.rfind("}")]
    vals = [int(v, 16) for v in re.findall(r"0[xX][0-9a-fA-F]+", body)]
    row_bytes = (w + 7) // 8
    if len(vals) < row_bytes * h:
        raise ValueError("XBM byte array truncated")
    arr = np.array(vals[: row_bytes * h], dtype=np.uint8).reshape(
        h, row_bytes
    )
    bits = np.unpackbits(arr, axis=1, bitorder="little")[:, :w]
    gray = np.where(bits == 1, 0, 255).astype(np.uint8)  # 1=foreground
    return w, h, np.ascontiguousarray(
        np.repeat(gray[:, :, None], 3, axis=2))


def decode_xbm_meta(payload: bytes) -> dict:
    """Header-only: parse just the two #define lines (the registry's
    cheap-dims contract — review r15: the first cut ran the full hex
    scan + bit unpack for a width/height read)."""
    import re

    try:
        head = payload[:4096].decode("ascii", errors="strict")
    except UnicodeDecodeError as exc:
        raise ValueError("not an XBM payload") from exc
    dims = dict(re.findall(
        r"#define\s+\w*?_?(width|height)\s+(\d+)", head))
    if "width" not in dims or "height" not in dims:
        raise ValueError("XBM missing width/height defines")
    w, h = int(dims["width"]), int(dims["height"])
    if w <= 0 or h <= 0:
        raise ValueError("bad XBM dimensions")
    return {"n_bytes": len(payload), "width": w, "height": h,
            "format": "xbm"}
