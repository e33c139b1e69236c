"""Hermetic baseline-TIFF decoder — public spec (Adobe TIFF 6.0,
1992-06-03), stdlib + numpy only.

Joins the multimodal real-decode family (PPM r13, PNG r14, JPEG
r14-r15, GIF/BMP/WebP/WAV r15): ``decode_real`` / ``phash_real``
route ``II*\\0`` / ``MM\\0*``-sniffed payloads here when Pillow is
absent. Scope is baseline TIFF plus the common extensions: both byte
orders; the first IFD with inline and offset values (BYTE/SHORT/LONG
fields); strip assembly (any RowsPerStrip) and the TILED layout
(16-multiple tiles, padded edge tiles, per-tile compression and
per-tile predictor resets — r15 late); Compression 1 (none),
32773 (PackBits), 5 (LZW — the TIFF flavor: MSB-first codes,
early code-width change at 2^w - 1) and 8/32946 (Adobe/old-style
deflate via stdlib zlib, bomb-bounded), all with the
horizontal-differencing Predictor 2; PhotometricInterpretation 0/1 (bilevel/grayscale,
either polarity), 2 (RGB, extra samples such as alpha dropped at the
RGB boundary) and 3 (palette via ColorMap's 16-bit channels);
BitsPerSample 1 (bilevel, row-padded), 8, and 16 (scaled to 8).
Planar configuration 2 decodes for 8/16-bit strips (per-plane
assembly + sample interleave) and new-style JPEG-in-TIFF
(Compression 7, TTN2) decodes each strip through the hermetic T.81
decoder with the JPEGTables abbreviated-stream splice.
Valid-but-unsupported layouts (planar tiles/sub-byte, old-style
type-6 JPEG, CCITT compression, float samples) raise
:class:`UnsupportedTiffError` so the dispatch can name Pillow — the
same error-class contract as every other format here; malformed
payloads raise plain ValueError.

Tests (tests/test_tiff.py) pin round-trips against an independent
spec-derived encoder (both byte orders, every supported
photometric/compression/predictor combination), the real CPython
``python.tiff`` (8-bit RGBA uncompressed), a PackBits vector from the
spec's own worked example, cross-format dHash identity, and the
Unsupported-vs-malformed contract.
"""

from __future__ import annotations

import struct


class UnsupportedTiffError(ValueError):
    """A VALID TIFF using features outside the baseline subset (planar
    layout, CCITT/JPEG compression, float samples). Distinct
    from plain ValueError (malformed payload) so the Pillow-gated
    dispatch can name the optional dependency."""


#: field type -> byte width (only the types a baseline reader needs)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8}


def _read_values(payload: bytes, bo: str, typ: int, count: int,
                 raw: bytes):
    """IFD field values: inline when they fit in 4 bytes, else at the
    offset the value slot holds."""
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError(f"unknown TIFF field type {typ}")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        data = payload[off : off + total]
        if len(data) < total:
            raise ValueError("truncated TIFF field value")
    if typ in (3, 8):
        return list(struct.unpack(bo + "H" * count, data))
    if typ in (4, 9):
        return list(struct.unpack(bo + "I" * count, data))
    if typ in (1, 6, 7, 2):
        return list(data)
    # RATIONAL: pairs -> float
    vals = struct.unpack(bo + "I" * (2 * count), data)
    return [vals[2 * i] / max(vals[2 * i + 1], 1)
            for i in range(count)]


def _unpackbits(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (Apple RLE): n in 0..127 copies n+1 literals,
    n in -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        b = data[pos]
        pos += 1
        if b < 128:  # literal run
            if pos + b + 1 > n:
                raise ValueError("truncated TIFF PackBits literal")
            out += data[pos : pos + b + 1]
            pos += b + 1
        elif b == 128:  # no-op
            continue
        else:  # repeat run: two's complement
            if pos >= n:
                raise ValueError("truncated TIFF PackBits repeat")
            out += bytes([data[pos]]) * (257 - b)
            pos += 1
    if len(out) < expected:
        raise ValueError("TIFF PackBits stream too short")
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, Clear=256 EOI=257,
    EARLY code-width change (at table size 2^w - 1, one code before
    the GIF flavor — TIFF 6.0 section 13)."""
    CLEAR, EOI = 256, 257

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = reset()
    out = bytearray()
    acc = bits = pos = 0
    n = len(data)
    prev = None
    while len(out) < expected:
        while bits < width:
            if pos >= n:
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            bits += 8
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        acc &= (1 << bits) - 1
        if code == CLEAR:
            table, width = reset()
            prev = None
            continue
        if code == EOI:
            raise ValueError("TIFF LZW ended before the strip was full")
        if code < len(table) and (code < 256 or code > 257):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1  # EARLY change
        prev = entry
    return bytes(out[:expected])


def _parse_tiff(payload: bytes):
    """Full pixel decode of the first IFD: ``(width, height,
    HxWx3 uint8 RGB)``."""
    import numpy as np

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_fields,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags = {}
    for i in range(n_fields):
        base = ifd_off + 2 + i * 12
        if base + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        tags[tag] = (typ, count, payload[base + 8 : base + 12])

    def get(tag, default=None):
        if tag not in tags:
            return default
        typ, count, raw = tags[tag]
        return _read_values(payload, bo, typ, count, raw)

    w = (get(256) or [0])[0]
    h = (get(257) or [0])[0]
    if w <= 0 or h <= 0:
        raise ValueError("bad TIFF dimensions")
    if w * h > 64_000_000:
        raise ValueError("TIFF dimensions exceed the 64MP decode cap")
    compression = (get(259) or [1])[0]
    photometric = (get(262) or [1])[0]
    spp = (get(277) or [1])[0]
    bits_list = get(258) or [1]
    planar = (get(284) or [1])[0]
    predictor = (get(317) or [1])[0]
    if planar == 2 and (322 in tags or (get(258) or [1])[0] < 8):
        raise UnsupportedTiffError(
            "planar configuration 2 with tiles/sub-byte samples"
        )
    if compression in (2, 3, 4):
        raise UnsupportedTiffError("CCITT-compressed TIFF")
    if compression == 6:
        raise UnsupportedTiffError("old-style (type 6) JPEG-in-TIFF")
    if compression not in (1, 5, 7, 8, 32773, 32946):
        raise ValueError(f"unknown TIFF compression {compression}")

    if compression == 7:
        # new-style JPEG-in-TIFF (TTN2): each strip is a JPEG stream;
        # a JPEGTables tag (347) holds an abbreviated tables-only
        # stream whose segments splice in after each strip's SOI.
        # Decodes through the hermetic T.81 decoder; photometric is
        # typically 6 (YCbCr) which the JPEG decode already resolves
        # to RGB, so the chunky photometric mapping below is bypassed.
        if 322 in tags:
            raise UnsupportedTiffError("tiled JPEG-in-TIFF")
        if planar == 2:
            raise UnsupportedTiffError("planar JPEG-in-TIFF")
        from tower_parse_spark.operators.jpeg import _parse_jpeg

        offsets = get(273)
        counts = get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing strip layout")
        rows_per_strip = (get(278) or [h])[0] or h
        tv = get(347)
        tables = bytes(tv) if tv else b""
        if tables and (tables[:2] != b"\xff\xd8"
                       or tables[-2:] != b"\xff\xd9"):
            raise ValueError("bad TIFF JPEGTables stream")
        parts = []
        rows_done = 0
        for off, cnt in zip(offsets, counts):
            seg = payload[off : off + cnt]
            if len(seg) < cnt:
                raise ValueError("truncated TIFF strip")
            if seg[:2] != b"\xff\xd8":
                raise ValueError("TIFF JPEG strip missing SOI")
            if tables:
                seg = seg[:2] + tables[2:-2] + seg[2:]
            jw, jh, jrgb = _parse_jpeg(seg)
            n = min(rows_per_strip, h - rows_done)
            if jw < w or jh < n:
                raise ValueError("TIFF JPEG strip smaller than rows")
            parts.append(jrgb[:n, :w])
            rows_done += n
        if rows_done < h:
            raise ValueError(
                "TIFF strips cover fewer rows than the image"
            )
        return w, h, np.ascontiguousarray(
            np.concatenate(parts, axis=0)
        )
    if (get(339) or [1])[0] == 3:
        raise UnsupportedTiffError("float-sample TIFF")
    if len(set(bits_list)) != 1:
        raise UnsupportedTiffError("mixed per-sample bit depths")
    bits = bits_list[0]
    if bits not in (1, 8, 16):
        raise UnsupportedTiffError(f"{bits}-bit TIFF samples")
    if photometric not in (0, 1, 2, 3):
        raise UnsupportedTiffError(
            f"TIFF photometric {photometric}"
        )
    if photometric == 3 and (spp != 1 or bits == 1):
        raise ValueError("palette TIFF must be single-sample 8/16-bit")

    def decompress(seg, expected):
        if compression == 32773:
            return _unpackbits(seg, expected)
        if compression == 5:
            return _lzw_decode_tiff(seg, expected)
        if compression in (8, 32946):  # Adobe/old-style deflate
            import zlib

            d = zlib.decompressobj()
            try:
                # bomb-bounded like the PNG inflate: cap at expected
                out = d.decompress(seg, expected)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt TIFF deflate strip: {exc}"
                ) from exc
            if len(out) < expected:
                raise ValueError("TIFF deflate strip too short")
            return out
        if len(seg) < expected:
            raise ValueError("TIFF strip shorter than its rows")
        return seg[:expected]

    def unit_row_bytes(uw):
        if bits == 1:
            return (uw + 7) // 8
        return uw * spp * (bits // 8)

    if 322 in tags:
        # tiled layout (TIFF 6.0 section 15): fixed-size tiles in
        # row-major order, edge tiles padded to full size; each tile
        # is an independent compression unit — and an independent
        # PREDICTOR unit (the horizontal differencing resets at the
        # tile's left edge, so unfiltering happens per tile, never
        # across the assembled raster)
        tw = (get(322) or [0])[0]
        tl = (get(323) or [0])[0]
        offsets = get(324)
        counts = get(325)
        if tw <= 0 or tl <= 0 or not offsets or not counts \
                or len(offsets) != len(counts):
            raise ValueError("TIFF missing tile layout")
        if tw % 16 or tl % 16:
            raise ValueError(
                f"TIFF tile size {tw}x{tl} not a multiple of 16"
            )
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) < across * down:
            raise ValueError("TIFF tile table shorter than the grid")
        trb = unit_row_bytes(tw)
        canvas = bytearray((across * trb) * (down * tl))
        full_stride = across * trb
        for ti in range(across * down):
            off, cnt = offsets[ti], counts[ti]
            seg = payload[off : off + cnt]
            if len(seg) < cnt:
                raise ValueError("truncated TIFF tile")
            tile = decompress(seg, trb * tl)
            ty, tx = divmod(ti, across)
            for r in range(tl):
                dst = (ty * tl + r) * full_stride + tx * trb
                canvas[dst : dst + trb] = tile[r * trb : (r + 1) * trb]
        # sample-level crop happens below; at bits==1 the tile byte
        # grid only crops cleanly when w is a multiple of 8 per tile —
        # handle by unpacking at the padded width then cropping
        raw = bytes(canvas)
        pad_w = across * tw
        pad_h = down * tl
        unit_w, n_rows = tw, tl  # predictor unit geometry
    elif planar == 2:
        # planar strips: all of channel 0's strips, then channel 1's,
        # ... — decode each PLANE like a single-sample image, then
        # interleave at the sample level so the downstream chunky
        # logic (incl. the per-lane predictor cumsum, which equals the
        # per-plane horizontal differencing) applies unchanged
        offsets = get(273)
        counts = get(279)
        rows_per_strip = (get(278) or [h])[0] or h
        per_ch = -(-h // rows_per_strip)
        if not offsets or not counts \
                or len(offsets) != len(counts) \
                or len(offsets) != per_ch * spp:
            raise ValueError("TIFF missing planar strip layout")
        sampb = bits // 8
        plane_row = w * sampb
        planes = []
        for c in range(spp):
            buf = bytearray()
            rows_done = 0
            for s in range(per_ch):
                i = c * per_ch + s
                seg = payload[offsets[i] : offsets[i] + counts[i]]
                if len(seg) < counts[i]:
                    raise ValueError("truncated TIFF strip")
                n = min(rows_per_strip, h - rows_done)
                buf += decompress(seg, plane_row * n)
                rows_done += n
            planes.append(
                np.frombuffer(bytes(buf), dtype=np.uint8)
                .reshape(h, w, sampb)
            )
        raw = np.stack(planes, axis=2).tobytes()  # (h, w, spp, sampb)
        pad_w, pad_h = w, h
        unit_w = w
    else:
        offsets = get(273)
        counts = get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing strip layout")
        rows_per_strip = (get(278) or [h])[0] or h
        row_bytes = unit_row_bytes(w)
        raw_rows = bytearray()
        rows_done = 0
        for off, cnt in zip(offsets, counts):
            strip = payload[off : off + cnt]
            if len(strip) < cnt:
                raise ValueError("truncated TIFF strip")
            n = min(rows_per_strip, h - rows_done)
            raw_rows += decompress(strip, row_bytes * n)
            rows_done += n
        if rows_done < h:
            raise ValueError(
                "TIFF strips cover fewer rows than the image"
            )
        raw = bytes(raw_rows)
        pad_w, pad_h = w, h
        unit_w = w

    if bits == 1:
        rows = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(pad_h, unit_row_bytes(pad_w)),
            axis=1,
        )[:h, :w]
        gray = np.where(rows == 0, 0, 255).astype(np.uint8)
        if photometric == 0:  # white-is-zero
            gray = 255 - gray
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return w, h, np.ascontiguousarray(rgb)

    if bits == 16:
        raw16 = np.frombuffer(raw,
                              dtype=bo + "u2").astype(np.uint32)
        if photometric == 3:
            # palette INDEXES must not be intensity-scaled: a 16-bit
            # palette image addresses up to 65536 ColorMap entries by
            # the raw sample value (review r15 — >>8 here turned
            # index 1 into entry 0)
            samples = raw16
        else:
            samples = (raw16 >> 8).astype(np.uint8)
    else:
        samples = np.frombuffer(raw, dtype=np.uint8)
    px = samples.reshape(pad_h, pad_w, spp)
    if predictor == 2:
        if bits != 8:
            raise UnsupportedTiffError(
                "predictor 2 with non-8-bit samples"
            )
        # the differencing resets at each compression unit's left
        # edge: full rows for strips, tile columns for tiles — one
        # reshape covers both (strips: across=1, unit_w=w)
        across_units = pad_w // unit_w
        px = (
            np.cumsum(
                px.reshape(pad_h, across_units, unit_w, spp)
                .astype(np.uint64),
                axis=2,
            )
            .astype(np.uint8)
            .reshape(pad_h, pad_w, spp)
        )
    elif predictor != 1:
        raise UnsupportedTiffError(f"TIFF predictor {predictor}")
    px = px[:h, :w]

    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        rgb = px[:, :, :3]  # alpha/extra samples dropped
    elif photometric == 3:
        cmap = get(320)
        if not cmap or len(cmap) < 3 * (1 << bits):
            raise ValueError("palette TIFF missing ColorMap")
        n = 1 << bits
        cm = np.array(cmap[: 3 * n], dtype=np.uint32).reshape(3, n)
        palette = (cm >> 8).astype(np.uint8).T  # 16-bit chans -> 8
        idx = px[:, :, 0]
        rgb = palette[idx]
    else:  # grayscale
        gray = px[:, :, 0]
        if photometric == 0:
            gray = 255 - gray
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
    return w, h, np.ascontiguousarray(rgb)


def decode_tiff_meta(payload: bytes) -> dict:
    """Header-only metadata decode (IFD walk for the dimension tags;
    no strip decode — the cheap-dims contract)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_fields,) = struct.unpack_from(bo + "H", payload, ifd_off)
    w = h = 0
    for i in range(n_fields):
        base = ifd_off + 2 + i * 12
        if base + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        if tag in (256, 257):
            vals = _read_values(payload, bo, typ, count,
                                payload[base + 8 : base + 12])
            if tag == 256:
                w = vals[0]
            else:
                h = vals[0]
    if w <= 0 or h <= 0:
        raise ValueError("bad TIFF dimensions")
    return {"n_bytes": len(payload), "width": int(w), "height": int(h),
            "format": "tiff"}
