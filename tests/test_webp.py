"""Hermetic lossless-WebP decoder (operators/webp.py, RFC 9649 VP8L):
round-trips against an independent spec-derived encoder exercising
each bitstream feature in isolation (simple and code-length-coded
prefix codes with 16/17/18 repeat ops and the max-symbol early-out,
LZ77 with both the 2D distance map and plain distances, color cache,
every predictor mode, the color transform, subtract-green, palettes
at every bundling width, meta prefix-code switching), the RIFF/VP8X
container walk, the real lossy python.webp (must raise the
Unsupported class naming Pillow), cross-format dHash identity, and
the malformed-payload contract."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators.webp import (
    _DIST_MAP,
    UnsupportedWebpError,
    _parse_webp,
    decode_webp_meta,
)


# ---------------------------------------------------------------------------
# independent spec-derived VP8L encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):  # LSB-first
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self):
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _canonical_codes(lengths):
    """DEFLATE-convention canonical codes for the given lengths."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln)
    codes = {}
    code = 0
    prev = nz[0][0]
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    assert code == (1 << prev), "encoder built an incomplete code"
    return codes


def _complete_lengths(symbols):
    """Kraft-complete lengths over the used symbols: with k symbols and
    L = ceil(log2 k), the first 2^L - k get length L-1, the rest L."""
    k = len(symbols)
    assert k >= 2
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k
    lengths = {}
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = L - 1 if i < n_short else L
    return lengths


class _Code:
    """One serialized prefix code + its symbol writer."""

    def __init__(self, alphabet_size, used_symbols, force_normal=False):
        self.alphabet = alphabet_size
        used = sorted(set(used_symbols)) or [0]
        self.simple = len(used) <= 2 and not force_normal \
            and max(used) < 256
        if self.simple:
            self.codes = (
                {used[0]: (0, 0)} if len(used) == 1
                else {used[0]: (0, 1), used[1]: (1, 1)}
            )
        elif len(used) == 1:
            # normal-form single-symbol code: decoder treats it as a
            # zero-bit read (the trivial-tree special case)
            full = [0] * alphabet_size
            full[used[0]] = 1
            self.lengths = full
            self.codes = {used[0]: (0, 0)}
        else:
            ln = _complete_lengths(used)
            full = [0] * alphabet_size
            for s, v in ln.items():
                full[s] = v
            self.lengths = full
            self.codes = _canonical_codes(full)

    def serialize(self, bw, use_max_symbol=False):
        if self.simple:
            syms = sorted(self.codes)
            bw.write(1, 1)  # simple
            bw.write(len(syms) - 1, 1)
            if syms[0] > 1:
                bw.write(1, 1)
                bw.write(syms[0], 8)
            else:
                bw.write(0, 1)
                bw.write(syms[0], 1)
            if len(syms) == 2:
                bw.write(syms[1], 8)
            return
        bw.write(0, 1)  # normal: code-length-coded
        # ops over the length sequence: literals, 16-runs, 17/18 zeros
        ops = []
        i = 0
        L = self.lengths
        n = len(L)
        while i < n:
            if L[i] == 0:
                j = i
                while j < n and L[j] == 0:
                    j += 1
                run = j - i
                while run >= 3:
                    if run >= 11:
                        take = min(run, 138)
                        ops.append((18, take - 11, 7))
                    else:
                        take = min(run, 10)
                        ops.append((17, take - 3, 3))
                    run -= take
                for _ in range(run):
                    ops.append((0, None, None))
                i = j
            else:
                val = L[i]
                j = i + 1
                ops.append((val, None, None))
                run = 0
                while j < n and L[j] == val:
                    j += 1
                    run += 1
                while run >= 3:
                    take = min(run, 6)
                    ops.append((16, take - 3, 2))
                    run -= take
                for _ in range(run):
                    ops.append((val, None, None))
                i = j
        bounded = False
        if use_max_symbol:
            # trailing zero-runs may be trimmed ONLY under the bounded
            # symbol count — otherwise the decoder keeps reading ops
            # until the alphabet is covered; the bounded count itself
            # can express only 2..257 ops
            trimmed = list(ops)
            while trimmed and trimmed[-1][0] in (17, 18):
                trimmed.pop()
            if 2 <= len(trimmed) <= 257:
                ops = trimmed
                bounded = True
        # code-length code over the op symbols
        used_ops = sorted({op for op, _, _ in ops})
        if len(used_ops) == 1:
            clc_lengths = {used_ops[0]: 1}  # single-symbol: 0-bit reads
        else:
            clc_lengths = _complete_lengths(used_ops)
        order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                 13, 14, 15)
        num_clc = max(
            idx for idx, s in enumerate(order) if s in clc_lengths
        ) + 1
        num_clc = max(num_clc, 4)
        bw.write(num_clc - 4, 4)
        for idx in range(num_clc):
            bw.write(clc_lengths.get(order[idx], 0), 3)
        clc_codes = (
            _canonical_codes(
                [clc_lengths.get(s, 0) for s in range(19)]
            )
            if len(clc_lengths) > 1 else {used_ops[0]: (0, 0)}
        )
        if bounded:
            bw.write(1, 1)
            bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
            bw.write(len(ops) - 2, 8)
        else:
            bw.write(0, 1)
        for op, extra, ebits in ops:
            c, ln = clc_codes[op]
            for b in range(ln - 1, -1, -1):  # MSB-first walk
                bw.write((c >> b) & 1, 1)
            if extra is not None:
                bw.write(extra, ebits)

    def write_symbol(self, bw, sym):
        c, ln = self.codes[sym]
        for b in range(ln - 1, -1, -1):
            bw.write((c >> b) & 1, 1)


def _extent_code(value):
    """length/distance value -> (prefix code, extra bits, n extra)."""
    assert value >= 1
    v = value - 1
    if v < 4:
        return v, 0, 0
    nbits = v.bit_length() - 2
    rest = v - (1 << (v.bit_length() - 1))
    half = 1 << nbits
    if rest >= half:
        return 2 * nbits + 3, rest - half, nbits
    return 2 * nbits + 2, rest, nbits


_HASH_MUL = 0x1E35A7BD


def _cache_key(px, cache_bits):
    a, r, g, b = px
    argb = (a << 24) | (r << 16) | (g << 8) | b
    return (_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - cache_bits)


def _emit_tokens(bw, tokens, cache_bits, force_normal=False,
                 use_max_symbol=False, groups=None, width=None,
                 ebits=None):
    """Serialize the prefix-code group(s) + token stream. tokens are
    ('lit', px) / ('copy', length, dist_value) / ('cache', px)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    by_group = [[] for _ in (groups or [0])] if groups else None

    def tok_group(pos):
        if not groups:
            return 0
        return groups[pos]

    # first pass: collect symbol usage per group
    n_g = len(set(groups)) if groups else 1
    use = [
        {"g": set(), "r": set(), "b": set(), "a": set(), "d": set()}
        for _ in range(n_g)
    ]
    pos = 0
    for t in tokens:
        u = use[tok_group(pos)]
        if t[0] == "lit":
            _, (a, r, g, b) = t
            u["g"].add(g)
            u["r"].add(r)
            u["b"].add(b)
            u["a"].add(a)
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            lc, _, _ = _extent_code(length)
            dc, _, _ = _extent_code(dist)
            u["g"].add(256 + lc)
            u["d"].add(dc)
            pos += length
        else:
            _, px = t
            u["g"].add(256 + 24 + _cache_key(px, cache_bits))
            pos += 1
    codes = []
    for u in use:
        codes.append((
            _Code(256 + 24 + cache_size, u["g"], force_normal),
            _Code(256, u["r"], force_normal),
            _Code(256, u["b"], force_normal),
            _Code(256, u["a"], force_normal),
            _Code(40, u["d"], force_normal),
        ))
        for c in codes[-1]:
            c.serialize(bw, use_max_symbol=use_max_symbol)
    # second pass: emit
    pos = 0
    for t in tokens:
        gc, rc, bc, ac, dc_ = codes[tok_group(pos)]
        if t[0] == "lit":
            _, (a, r, g, b) = t
            gc.write_symbol(bw, g)
            rc.write_symbol(bw, r)
            bc.write_symbol(bw, b)
            ac.write_symbol(bw, a)
            pos += 1
        elif t[0] == "copy":
            _, length, dist = t
            lc, lex, lbits = _extent_code(length)
            gc.write_symbol(bw, 256 + lc)
            if lbits:
                bw.write(lex, lbits)
            dcode, dex, dbits = _extent_code(dist)
            dc_.write_symbol(bw, dcode)
            if dbits:
                bw.write(dex, dbits)
            pos += length
        else:
            _, px = t
            gc.write_symbol(bw, 256 + 24 + _cache_key(px, cache_bits))
            pos += 1


def _riff(vp8l_body, extended=False, canvas=None):
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_body)) + vp8l_body
    if len(vp8l_body) & 1:
        chunk += b"\x00"
    if extended:
        w, h = canvas
        vp8x = (b"VP8X" + struct.pack("<I", 10) + bytes([0, 0, 0, 0])
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        chunk = vp8x + chunk
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8l(w, h, body_fn, extended=False):
    """Build a full payload: header bits + body_fn(bw) writes
    transforms/cache/meta/groups/pixels."""
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    body_fn(bw)
    return _riff(b"\x2f" + bw.bytes(), extended=extended, canvas=(w, h))


def _plain_image(px_tokens, cache_bits=0, **kwargs):
    """No transforms; optional color cache."""

    def body(bw):
        bw.write(0, 1)  # no transform
        if cache_bits:
            bw.write(1, 1)
            bw.write(cache_bits, 4)
        else:
            bw.write(0, 1)
        bw.write(0, 1)  # no meta prefix codes
        _emit_tokens(bw, px_tokens, cache_bits, **kwargs)

    return body


def _rgb_tokens(rgb):
    return [("lit", (255, int(r), int(g), int(b)))
            for r, g, b in rgb.reshape(-1, 3)]


def _rng(seed):
    return np.random.default_rng(seed)


# independent forward predictors (re-derived from the spec text, not
# imported from the decoder)
def _fwd_predict(mode, left, top, topleft, topright):
    def avg2(p, q):
        return tuple((x + y) >> 1 for x, y in zip(p, q))

    def clamp(v):
        return max(0, min(255, v))

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
        return avg2(avg2(left, topright), top)
    if mode == 6:
        return avg2(left, topleft)
    if mode == 7:
        return avg2(left, top)
    if mode == 8:
        return avg2(topleft, top)
    if mode == 9:
        return avg2(top, topright)
    if mode == 10:
        return avg2(avg2(left, topleft), avg2(top, topright))
    if mode == 11:
        pl = sum(abs(t + l - tl - l)
                 for l, t, tl in zip(left, top, topleft))
        pt = sum(abs(t + l - tl - t)
                 for l, t, tl in zip(left, top, topleft))
        return left if pl < pt else top
    if mode == 12:
        return tuple(clamp(l + t - tl)
                     for l, t, tl in zip(left, top, topleft))
    if mode == 13:
        av = avg2(left, top)
        out = []
        for a_, tl in zip(av, topleft):
            d = a_ - tl
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(clamp(a_ + half))
        return tuple(out)
    raise AssertionError(mode)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_two_color_simple_codes():
    rgb = np.where(
        (_rng(1).integers(0, 2, (6, 5, 1)) == 1),
        np.array([200, 30, 7], np.uint8),
        np.array([10, 250, 99], np.uint8),
    ).astype(np.uint8)
    payload = _vp8l(5, 6, _plain_image(_rgb_tokens(rgb)))
    w, h, got = _parse_webp(payload)
    assert (w, h) == (5, 6) and (got == rgb).all()
    meta = decode_webp_meta(payload)
    assert (meta["width"], meta["height"], meta["format"]) == (5, 6,
                                                               "webp")


def test_random_literals_clc_codes():
    rgb = _rng(2).integers(0, 256, (11, 7, 3), dtype=np.uint8)
    payload = _vp8l(
        7, 11, _plain_image(_rgb_tokens(rgb), force_normal=True)
    )
    assert (_parse_webp(payload)[2] == rgb).all()


def test_max_symbol_bounded_code_lengths():
    rgb = _rng(3).integers(0, 256, (5, 5, 3), dtype=np.uint8)
    payload = _vp8l(
        5, 5,
        _plain_image(_rgb_tokens(rgb), force_normal=True,
                     use_max_symbol=True),
    )
    assert (_parse_webp(payload)[2] == rgb).all()


def test_lz77_distance_map_and_plain():
    """Distance value d <= 120 is a 2D map code: 1 -> (0,1) copies the
    pixel directly above, 2 -> (1,0) the left neighbour, 4 -> (-1,1);
    d > 120 is the plain distance d-120."""
    w, h = 8, 6
    base = [(255, i * 7 & 255, i * 11 & 255, i * 13 & 255)
            for i in range(w)]
    tokens = [("lit", p) for p in base]
    # row 1 copies row 0 via map code 1 == (0, 1) => distance w
    tokens.append(("copy", w, 1))
    # row 2: one literal then 7 copies of the left pixel (map 2 = (1,0))
    tokens.append(("lit", (255, 1, 2, 3)))
    tokens.append(("copy", w - 1, 2))
    # row 3 copies row 2 shifted: map 4 = (-1, 1) => distance w - 1
    tokens.append(("lit", (255, 9, 9, 9)))
    tokens.append(("copy", w - 1, 4))
    # rows 4-5 copy rows 0-1 via a plain distance (120 + 4*w)
    tokens.append(("copy", 2 * w, 120 + 4 * w))
    payload = _vp8l(w, h, _plain_image(tokens))
    _, _, got = _parse_webp(payload)
    want = np.zeros((h, w, 3), np.uint8)
    want[0] = [p[1:] for p in base]
    want[1] = want[0]
    row2 = [(255, 1, 2, 3)] + base[:-1]  # left-copy propagates row 2?
    # map 2 copies the immediately-left pixel repeatedly -> run fill
    want[2] = (1, 2, 3)
    want[3, 0] = (9, 9, 9)
    want[3, 1:] = want[2, 1:]  # (-1,1): row above, one to the right
    # ... except the LAST pixel: scan-order distance w-1 from (7,3)
    # lands on (0,3) — the flat-copy rule, same as the predictor's
    # contiguous-memory top-right
    want[3, 7] = (9, 9, 9)
    want[4] = want[0]
    want[5] = want[1]
    assert (got == want).all(), (got[:, :, 0], want[:, :, 0])
    assert row2 is not None  # silence the intermediate (documentation)


def test_color_cache_hits():
    a_px = (255, 12, 34, 56)
    b_px = (255, 200, 100, 50)
    cache_bits = 4
    tokens = [("lit", a_px), ("lit", b_px),
              ("cache", a_px), ("cache", b_px), ("cache", a_px),
              ("lit", a_px)]
    payload = _vp8l(3, 2, _plain_image(tokens, cache_bits=cache_bits))
    _, _, got = _parse_webp(payload)
    want = np.array(
        [[a_px[1:], b_px[1:], a_px[1:]],
         [b_px[1:], a_px[1:], a_px[1:]]], np.uint8)
    assert (got == want).all()


def test_subtract_green_transform():
    rgb = _rng(4).integers(0, 256, (6, 6, 3), dtype=np.uint8)
    fwd = [("lit", (255, int(r - g) & 0xFF, int(g), int(b - g) & 0xFF))
           for r, g, b in rgb.reshape(-1, 3).astype(int)]

    def body(bw):
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        _emit_tokens(bw, fwd, 0)

    assert (_parse_webp(_vp8l(6, 6, body))[2] == rgb).all()


def _sub_image(bw, pixels):
    """Entropy-coded sub-image (predictor ids / color elements /
    palette deltas / entropy image): its stream is
    [cache bit][prefix group][pixels] — no transforms, no meta."""
    bw.write(0, 1)  # no color cache
    _emit_tokens(bw, [("lit", p) for p in pixels], 0)


def test_predictor_transform_all_modes():
    """4x4 blocks (size_bits=2), 14 blocks wide x 2 tall = every mode
    twice, on random pixels — incl. the right-edge top-right rule."""
    bits = 2
    w, h = 14 * 4, 8
    rng = _rng(5)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    px = [(255, int(r), int(g), int(b))
          for r, g, b in rgb.reshape(-1, 3)]
    bw_blocks = (w + 3) >> 2
    modes = [(i + y) % 14 for y in range(2) for i in range(bw_blocks)]

    # forward pass: residual = pixel - predictor (per spec edge rules)
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[(y >> bits) * bw_blocks + (x >> bits)]
                pred = _fwd_predict(
                    mode, px[i - 1], px[i - w], px[i - w - 1],
                    px[i - w + 1]
                )
            res.append(tuple((p - q) & 0xFF for p, q in zip(px[i],
                                                            pred)))

    def body(bw):
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        _sub_image(bw, [(255, 0, m, 0) for m in modes])
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        _emit_tokens(bw, [("lit", p) for p in res], 0,
                     force_normal=True)

    assert (_parse_webp(_vp8l(w, h, body))[2] == rgb).all()


def test_color_transform():
    bits = 2
    w, h = 8, 8
    rng = _rng(6)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # per-block multipliers (g2r, g2b, r2b) as signed 3.5 bytes
    blocks_w = (w + 3) >> 2
    blocks = [(rng.integers(0, 256), rng.integers(0, 256),
               rng.integers(0, 256))
              for _ in range(blocks_w * ((h + 3) >> 2))]

    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(int(t)) * s8(int(c))) >> 5

    fwd = []
    for y in range(h):
        for x in range(w):
            g2r, g2b, r2b = blocks[(y >> bits) * blocks_w + (x >> bits)]
            r, g, b = (int(v) for v in rgb[y, x])
            nr = (r - delta(g2r, g)) & 0xFF
            nb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            fwd.append(("lit", (255, nr, g, nb)))
    # element pixel: ARGB = (255, r2b, g2b, g2r)
    elems = [(255, int(r2b), int(g2b), int(g2r))
             for g2r, g2b, r2b in blocks]

    def body(bw):
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR
        bw.write(bits - 2, 3)
        _sub_image(bw, elems)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _emit_tokens(bw, fwd, 0, force_normal=True)

    assert (_parse_webp(_vp8l(w, h, body))[2] == rgb).all()


@pytest.mark.parametrize("n_colors,pbits", [(2, 3), (4, 2), (12, 1),
                                            (200, 0)])
def test_palette_all_bundle_widths(n_colors, pbits):
    rng = _rng(7 + n_colors)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    w, h = 11, 5  # 11 forces partial trailing bundles at every pbits
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    # palette image: delta-coded components, alpha 255 on first entry
    deltas = []
    prev = (0, 0, 0, 0)
    for r, g, b in pal.astype(int):
        cur = (255, r, g, b)
        deltas.append(tuple((c - p) & 0xFF for c, p in zip(cur, prev)))
        prev = cur
    if pbits:
        per = 1 << pbits
        field = 8 >> pbits
        packed_w = (w + per - 1) >> pbits
        bundles = []
        for y in range(h):
            for bx in range(packed_w):
                v = 0
                for k in range(per):
                    x = (bx << pbits) + k
                    if x < w:
                        v |= int(idx[y, x]) << (k * field)
                bundles.append(("lit", (255, 0, v, 0)))
        body_tokens = bundles
    else:
        body_tokens = [("lit", (255, 0, int(i), 0))
                       for i in idx.ravel()]

    def body(bw):
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        _sub_image(bw, deltas)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _emit_tokens(bw, body_tokens, 0)

    got = _parse_webp(_vp8l(w, h, body))[2]
    assert (got == pal[idx]).all()


def test_meta_prefix_switching_with_cross_group_copy():
    """Two prefix-code groups split left/right at block bits 2; an
    LZ77 copy running across the boundary must re-resolve the group
    for the symbol AFTER the copy."""
    w, h = 8, 4
    left_px = (255, 10, 20, 30)
    right_px = (255, 200, 210, 220)
    groups = []
    for y in range(h):
        for x in range(w):
            groups.append(0 if x < 4 else 1)
    tokens = []
    for y in range(h):
        for x in range(w):
            if y == 2 and x == 0:
                # copy the whole previous row: crosses group boundary
                tokens.append(("copy", w, 1))
                break
            if y == 2:
                continue
            tokens.append(("lit", left_px if x < 4 else right_px))

    def body(bw):
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # meta prefix codes
        bw.write(0, 3)  # ebits = 2
        # entropy image 2x1: green+red encode group ids 0 and 1
        _sub_image(bw, [(255, 0, 0, 0), (255, 0, 1, 0)])
        _emit_tokens(bw, tokens, 0, groups=groups, width=w, ebits=2)

    _, _, got = _parse_webp(_vp8l(w, h, body))
    want = np.zeros((h, w, 3), np.uint8)
    want[:, :4] = left_px[1:]
    want[:, 4:] = right_px[1:]
    assert (got == want).all()


def test_stacked_subtract_green_then_predictor():
    """The common libwebp stack: subtract-green read first, predictor
    second -> inverse order predictor first, then add-green."""
    bits = 4
    w, h = 9, 7
    rng = _rng(9)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # forward: subtract green, THEN predictor over the transformed img
    sg = [
        (255, int(r - g) & 0xFF, int(g), int(b - g) & 0xFF)
        for r, g, b in rgb.reshape(-1, 3).astype(int)
    ]
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = sg[i - 1]
            elif x == 0:
                pred = sg[i - w]
            else:
                pred = _fwd_predict(7, sg[i - 1], sg[i - w],
                                    sg[i - w - 1], sg[i - w + 1])
            res.append(tuple((p - q) & 0xFF for p, q in zip(sg[i],
                                                            pred)))

    def body(bw):
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN (read first)
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR (read second)
        bw.write(bits - 2, 3)
        _sub_image(bw, [(255, 0, 7, 0)])
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _emit_tokens(bw, [("lit", p) for p in res], 0,
                     force_normal=True)

    assert (_parse_webp(_vp8l(w, h, body))[2] == rgb).all()


def test_container_vp8x_and_errors():
    rgb = _rng(10).integers(0, 256, (3, 3, 3), dtype=np.uint8)
    payload = _vp8l(3, 3, _plain_image(_rgb_tokens(rgb)),
                    extended=True)
    assert (_parse_webp(payload)[2] == rgb).all()
    meta = decode_webp_meta(payload)
    assert (meta["width"], meta["height"]) == (3, 3)
    # malformed
    with pytest.raises(ValueError, match="not a WebP"):
        _parse_webp(b"RIFFxxxxWAVE")
    plain = _vp8l(3, 3, _plain_image(_rgb_tokens(rgb)))
    with pytest.raises(ValueError, match="truncated"):
        _parse_webp(plain[: len(plain) - 4])
    # lossy VP8 chunk: Unsupported, not malformed
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(UnsupportedWebpError, match="lossy"):
        _parse_webp(lossy)
    # animated VP8X
    anim = (b"RIFF" + struct.pack("<I", 22) + b"WEBP"
            + b"VP8X" + struct.pack("<I", 10)
            + bytes([0x02, 0, 0, 0]) + b"\x0f\x00\x00\x0f\x00\x00")
    with pytest.raises(UnsupportedWebpError, match="animated"):
        _parse_webp(anim)


def test_real_lossy_webp_is_unsupported_not_malformed():
    files = sorted(glob.glob(
        "/root/.pyenv/versions/*/lib/*/test/imghdrdata/python.webp"))
    if not files:
        pytest.skip("container image data files not present")
    payload = open(files[0], "rb").read()
    with pytest.raises(UnsupportedWebpError):
        _parse_webp(payload)
    # the canvas dimensions still decode from VP8X
    meta = decode_webp_meta(payload)
    assert meta["format"] == "webp"
    assert meta["width"] > 0 and meta["height"] > 0


def test_dispatch_and_cross_format_hash():
    """decode_real/phash_real route lossless WebPs hermetically; the
    same pixels in a P6 PPM and a VP8L WebP hash identically; a lossy
    WebP raises NotImplementedError naming pillow."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — hermetic fallback never runs")
    except ImportError:
        pass
    rng = _rng(11)
    rgb = np.repeat(
        np.repeat(rng.integers(0, 256, (4, 9, 3), dtype=np.uint8),
                  8, axis=0), 8, axis=1
    )
    payload = _vp8l(72, 32, _plain_image(_rgb_tokens(rgb),
                                         force_normal=True))
    meta = M.decode_real(payload)
    assert meta == {"n_bytes": len(payload), "width": 72,
                    "height": 32, "format": "webp"}
    ppm = b"P6 72 32 255\n" + rgb.tobytes()
    assert M.phash_real(payload) == M.phash_real(ppm)
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="pillow"):
        M.phash_real(lossy)


def test_distance_map_is_the_normative_table():
    """Spot invariants of the 120-entry map: unique entries, nearest
    first, dy in 0..7, dx in -8..8, and the spec's first/last rows."""
    assert len(_DIST_MAP) == len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[-1] == (8, 7) and _DIST_MAP[-2] == (8, 6)
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
    d2 = [dx * dx + dy * dy for dx, dy in _DIST_MAP]
    # distances are grouped by rising euclidean bands (not strictly
    # monotone inside a band, but never decreasing across bands > 2)
    assert d2[0] == 1 and max(d2) == 8 * 8 + 7 * 7


def test_roundtrip_property_sweep():
    """Randomized sweep: sizes x code forms x channel structure —
    every stream must reproduce its pixels exactly."""
    for seed in range(12):
        rng = _rng(100 + seed)
        w = int(rng.integers(1, 20))
        h = int(rng.integers(1, 20))
        n_vals = int(rng.integers(1, 9))
        vals = rng.integers(0, 256, (n_vals, 3), dtype=np.uint8)
        rgb = vals[rng.integers(0, n_vals, (h, w))]
        payload = _vp8l(
            w, h,
            _plain_image(_rgb_tokens(rgb),
                         force_normal=bool(seed % 2),
                         use_max_symbol=(seed % 3 == 0)),
        )
        gw, gh, got = _parse_webp(payload)
        assert (gw, gh) == (w, h) and (got == rgb).all(), seed
