"""Hermetic lossless-WebP (VP8L) decoder — public spec (RFC 9649 /
Google's "WebP Lossless Bitstream Specification"), stdlib + numpy
only.

Completes the multimodal real-decode family (PPM r13, PNG r14, JPEG
r14-r15, GIF/BMP r15): ``decode_real`` / ``phash_real`` route
``RIFF....WEBP``-sniffed payloads here when Pillow is absent. Scope is
the FULL lossless format: the RIFF container (simple ``VP8L`` files
and ``VP8X``-extended ones whose image chunk is VP8L), LSB-first
bitstream, canonical prefix codes (simple 1/2-symbol codes and the
code-length-coded form with its 16/17/18 repeat ops and the
max-symbol early-out), color cache, LZ77 backward references with the
120-entry 2D distance map, meta-prefix (entropy-image) code
switching, and all four inverse transforms in reverse order:
PREDICTOR (14 spatial modes with the spec's edge rules), COLOR
(signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN, and
COLOR_INDEXING (palette, including sub-byte pixel bundling at <= 16
colors). Alpha is decoded and dropped at the RGB boundary (the
engine's hash/feature kernels are RGB).

LOSSY WebP (``VP8 `` chunks — a different codec: boolean arithmetic
coding, DCT, loop filters) and encrypted/unknown container layouts
raise :class:`UnsupportedWebpError` so the multimodal dispatch can
name Pillow as the remedy — the same error-class contract as the
PNG/JPEG/BMP paths; malformed payloads raise plain ValueError.

Like the PNG/JPEG paths this is the hermetic correctness reference,
not a throughput engine: the entropy decode is a per-symbol Python
loop (transform inversion is vectorized numpy where it matters —
SUBTRACT_GREEN and COLOR_INDEXING whole-image, PREDICTOR per pixel
by necessity of its data dependency). An installed Pillow takes over
for speed. Tests (tests/test_webp.py) pin round-trips against an
independent spec-derived encoder exercising each feature in
isolation (simple and code-length-coded prefix codes, LZ77 with every
distance-map regime, color cache hits, each transform alone and
stacked), hand-computed byte-level vectors, and the
Unsupported-vs-malformed contract; the container's real
``python.webp`` is lossy VP8, which must raise the Unsupported class
naming Pillow.
"""

from __future__ import annotations

import struct


class UnsupportedWebpError(ValueError):
    """A VALID WebP outside the lossless subset (lossy VP8/animation
    payloads). Distinct from plain ValueError (malformed payload) so
    the Pillow-gated dispatch can name the optional dependency."""


#: code-length-code read order (spec section "Prefix code groups")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

#: (xoffset, yoffset) for distance codes 1..120 (spec's 2D proximity
#: map, nearest-first). Generated once; the spec lists it explicitly —
#: this reproduces that list: all (dx, dy) with dy in 0..7,
#: dx in -8..7, ordered by (dx*dx + dy*dy, dy, dx>=0 first ... );
#: rather than risk a subtly different ordering we inline the
#: normative table.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("data", "pos", "acc", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def read(self, n: int) -> int:
        while self.bits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            self.acc |= self.data[self.pos] << self.bits
            self.pos += 1
            self.bits += 8
        val = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.bits -= n
        return val


class _Prefix:
    """Canonical prefix code (DEFLATE convention: codes assigned by
    (length asc, symbol asc), walked MSB-first bit by bit)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # Kraft check + canonical assignment
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        table = {}
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code > (1 << prev_len):
            raise ValueError("over-subscribed VP8L prefix code")
        if code < (1 << prev_len):
            raise ValueError("incomplete VP8L prefix code")
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        table = self.table
        for _ in range(16):
            code = (code << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    """One prefix code: the 'simple' 1/2-symbol form or the
    code-length-coded normal form."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            if sym1 == sym0:
                raise ValueError("VP8L simple-code repeated symbol")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
            # single-symbol code: zero bits per read
            p = _Prefix.__new__(_Prefix)
            p.single = sym0
            p.table = None
            return p
        return _Prefix(lengths)

    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)

    if br.read(1):  # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overflow")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("VP8L code-length repeat overflow")
    return _Prefix(lengths)


def _prefix_group(br: _BitReader, cache_size: int):
    """The 5 codes of one prefix-code group: green+length+cache, red,
    blue, alpha, distance."""
    return (
        _read_prefix_code(br, 256 + 24 + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    )


def _lz77_extent(br: _BitReader, code: int) -> int:
    """Length/distance prefix decode (spec: 24 codes -> value)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image(br: _BitReader, w: int, h: int, is_level0: bool,
                  transforms=None):
    """The spec's DecodeImageStream: returns a flat list of
    (a, r, g, b) tuples, length w*h. Sub-resolution images (entropy /
    predictor / color / palette) call this with is_level0=False."""
    if is_level0:
        xsize = w
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L transform repeated")
            if ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            elif ttype in (0, 1):  # PREDICTOR / COLOR
                bits = br.read(3) + 2
                bw = _subsample_size(xsize, bits)
                bh = _subsample_size(h, bits)
                sub = _decode_image(br, bw, bh, False)
                transforms.append((ttype, bits, sub))
            else:  # 3: COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal = _decode_image(br, n_colors, 1, False)
                # palette entries are delta-coded component-wise
                acc = [0, 0, 0, 0]
                palette = []
                for px in pal:
                    acc = [(a + d) & 0xFF for a, d in zip(acc, px)]
                    palette.append(tuple(acc))
                if n_colors <= 2:
                    pbits = 3
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append((3, (pbits, palette), None))
                if pbits:
                    xsize = _subsample_size(xsize, pbits)
        w = xsize

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"bad VP8L color-cache size {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [(0, 0, 0, 0)] * cache_size

    entropy = None
    ebits = ew = 0
    n_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes
        ebits = br.read(3) + 2
        ew = _subsample_size(w, ebits)
        eh = _subsample_size(h, ebits)
        entropy = _decode_image(br, ew, eh, False)
        n_groups = 1 + max(
            ((px[1] << 8) | px[2]) for px in entropy
        )

    groups = [_prefix_group(br, cache_size) for _ in range(n_groups)]

    n = w * h
    out = [None] * n
    pos = 0
    group = groups[0]
    last_cell = -1
    while pos < n:
        if entropy is not None:
            # re-resolve the group whenever the (block-row, block-col)
            # cell changes — an LZ77 copy can jump many rows at once
            cell = ((pos // w) >> ebits) * ew + ((pos % w) >> ebits)
            if cell != last_cell:
                ep = entropy[cell]
                group = groups[(ep[1] << 8) | ep[2]]
                last_cell = cell
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.read(br)
        if s < 256:
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a, r, s, b)
            out[pos] = px
            pos += 1
            if cache_size:
                _cache_insert(cache, cache_bits, px)
        elif s < 280:
            length = _lz77_extent(br, s - 256)
            dcode = d_code.read(br)
            dist_val = _lz77_extent(br, dcode)
            if dist_val > 120:
                dist = dist_val - 120
            else:
                dx, dy = _DIST_MAP[dist_val - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L back-reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    _cache_insert(cache, cache_bits, px)
        else:
            if s - 280 >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _cache_insert(cache, cache_bits, px):
    a, r, g, b = px
    argb = (a << 24) | (r << 16) | (g << 8) | b
    cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = px


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode, left, top, topleft, topright):
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        p = tuple(l + t - tl for l, t, tl in zip(left, top, topleft))
        pl = sum(abs(a - b) for a, b in zip(p, left))
        pt = sum(abs(a - b) for a, b in zip(p, top))
        return left if pl < pt else top
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            _clamp(l + t - tl) for l, t, tl in zip(left, top, topleft)
        )
    if mode == 13:  # ClampAddSubtractHalf: a + (a-b)/2, C trunc-to-0
        ave = _avg2(left, top)
        return tuple(
            _clamp(av + ((av - tl) // 2 if av >= tl
                         else -((tl - av) // 2)))
            for av, tl in zip(ave, topleft)
        )
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _inverse_predictor(px, w, h, bits, sub):
    bw = _subsample_size(w, bits)
    out = px  # residuals in place -> absolute values
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = out[i - 1]  # left
            elif x == 0:
                pred = out[i - w]  # top
            else:
                mode = sub[(y >> bits) * bw + (x >> bits)][2]
                left = out[i - 1]
                top = out[i - w]
                topleft = out[i - w - 1]
                # at the right edge, "top-right" wraps to the current
                # row's first pixel (contiguous-memory rule, normative)
                topright = out[i - w + 1]
                pred = _predict(mode, left, top, topleft, topright)
            r = out[i]
            out[i] = tuple((a + b) & 0xFF for a, b in zip(r, pred))
    return out


def _ctdelta(t, c):
    # signed 3.5 fixed-point: both args as int8
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color(px, w, h, bits, sub):
    bw = _subsample_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            _ea, cx_r2b, cx_g2b, cx_g2r = sub[(y >> bits) * bw
                                              + (x >> bits)]
            a, r, g, b = px[i]
            r = (r + _ctdelta(cx_g2r, g)) & 0xFF
            b = (b + _ctdelta(cx_g2b, g)) & 0xFF
            b = (b + _ctdelta(cx_r2b, r)) & 0xFF
            px[i] = (a, r, g, b)
    return px


def _inverse_transforms(px, w, h, transforms):
    """Apply inverse transforms in reverse order of appearance. The
    working width starts at the CODED width (reduced when a
    color-indexing transform bundled sub-byte pixels — every transform
    read after it in the stream, and therefore inverted before it,
    operated on that reduced grid) and expands to the full ``w`` when
    the color-indexing inverse unbundles."""
    cur_w = w
    for t in transforms:
        if t[0] == 3 and t[1][0]:
            cur_w = _subsample_size(w, t[1][0])
    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:  # COLOR_INDEXING
            pbits, palette = arg
            if pbits:
                packed_w = cur_w
                per = 1 << pbits
                field = 8 >> pbits
                mask = (1 << field) - 1
                unpacked = [None] * (w * h)
                for y in range(h):
                    for x in range(w):
                        bundle = px[y * packed_w + (x >> pbits)][2]
                        idx = (bundle >> ((x & (per - 1)) * field)) \
                            & mask
                        unpacked[y * w + x] = (
                            palette[idx] if idx < len(palette)
                            else (0, 0, 0, 0)
                        )
                px = unpacked
                cur_w = w
            else:
                px = [
                    palette[p[2]] if p[2] < len(palette)
                    else (0, 0, 0, 0)
                    for p in px
                ]
        elif ttype == 2:  # SUBTRACT_GREEN
            px = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF)
                for a, r, g, b in px
            ]
        elif ttype == 1:  # COLOR
            px = _inverse_color(px, cur_w, h, arg, sub)
        else:  # 0: PREDICTOR
            px = _inverse_predictor(px, cur_w, h, arg, sub)
    return px


def _find_vp8l_chunk(payload: bytes) -> bytes:
    """RIFF walk: return the VP8L chunk body; UnsupportedWebpError for
    lossy VP8; ValueError for malformed containers."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    saw_vp8x = False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise UnsupportedWebpError(
                "lossy (VP8) WebP — only lossless VP8L decodes "
                "hermetically"
            )
        if tag == b"VP8X":
            saw_vp8x = True
            if size >= 4 and body[0] & 0x02:
                raise UnsupportedWebpError("animated WebP")
        pos += 8 + size + (size & 1)
    if saw_vp8x:
        raise UnsupportedWebpError("WebP without a VP8L image chunk")
    raise ValueError("WebP container has no image chunk")


def _parse_webp(payload: bytes):
    """Full pixel decode: ``(width, height, HxWx3 uint8 RGB)``."""
    import numpy as np

    body = _find_vp8l_chunk(payload)
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise UnsupportedWebpError("VP8L version > 0")
    if w * h > 64_000_000:
        raise ValueError("WebP dimensions exceed the 64MP decode cap")
    transforms: list = []
    px = _decode_image(br, w, h, True, transforms)
    px = _inverse_transforms(px, w, h, transforms)
    arr = np.array(px, dtype=np.uint8).reshape(h, w, 4)
    return w, h, np.ascontiguousarray(arr[:, :, 1:4])


def decode_webp_meta(payload: bytes) -> dict:
    """Header-only metadata decode: dimensions from the VP8L 14-bit
    fields (or the VP8X canvas when only lossy data follows — the
    dims are still real; the PIXEL path is what raises Unsupported)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L" and size >= 5 and body[0] == 0x2F:
            (bits,) = struct.unpack_from("<I", body, 1)
            return {
                "n_bytes": len(payload),
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
                "format": "webp",
            }
        if tag == b"VP8X" and size >= 10:
            wm1 = int.from_bytes(body[4:7], "little")
            hm1 = int.from_bytes(body[7:10], "little")
            return {
                "n_bytes": len(payload),
                "width": wm1 + 1,
                "height": hm1 + 1,
                "format": "webp",
            }
        if tag == b"VP8 ":
            raise UnsupportedWebpError(
                "lossy (VP8) WebP — only lossless VP8L decodes "
                "hermetically"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no image chunk")
