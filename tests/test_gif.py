"""Hermetic GIF decoder (operators/gif.py, GIF89a): round-trips
against an independent spec-derived LZW encoder (growing table,
mid-stream clears, the deferred-clear full-table mode, and a
degenerate clear-before-every-literal encoder), interlace / local
palettes / extensions / animation-first-frame, real-encoder file
smoke (CPython ships GIF89a logos and icons in this container),
cross-format dHash identity, and the malformed-payload contract."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators.gif import (
    _lzw_decode,
    _parse_gif,
    decode_gif_meta,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _lzw_encode(min_code_size, indexes, defer_clear=False,
                clear_every_literal=False):
    """Independent GIF-flavor LZW encoder. ``defer_clear`` freezes a
    full table instead of emitting CLEAR (the deferred-clear mode real
    encoders use); ``clear_every_literal`` emits CLEAR before every
    pixel so the table never grows (degenerate but valid by
    construction)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    codes = [clear]
    if clear_every_literal:
        for px in indexes:
            codes += [int(px), clear]
        codes.append(eoi)
    else:
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        prev = ()
        for px in indexes:
            cur = prev + (int(px),)
            if cur in table:
                prev = cur
                continue
            codes.append(table[prev])
            if next_code < 4096:
                table[cur] = next_code
                next_code += 1
            elif not defer_clear:
                codes.append(clear)
                table = {(i,): i for i in range(clear)}
                next_code = eoi + 1
            prev = (int(px),)
        if prev:
            codes.append(table[prev])
        codes.append(eoi)

    # bit-pack, replaying the decoder's width schedule
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1
    table_len = clear + 2
    first = True
    for code in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if code == clear:
            width, table_len, first = min_code_size + 1, clear + 2, True
        elif code != eoi:
            if first:
                first = False
            elif table_len < 4096:
                table_len += 1
                if table_len == (1 << width) and width < 12:
                    width += 1
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocks(data):
    return b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    ) + b"\x00"


def _gif(idx, palette, min_code=None, interlace=False,
         local_palette=None, offset=(0, 0), screen=None, bg=0,
         version=b"GIF89a", extensions=False, second_frame=None,
         **lzw_kwargs):
    """Independent spec-derived GIF builder: logical screen with a
    global table, one (optionally interlaced / offset / locally
    paletted) image descriptor, optional extensions and second frame."""
    ih, iw = idx.shape
    left, top = offset
    sw, sh = screen or (left + iw, top + ih)

    def table_bytes(pal):
        n = len(pal)
        s = max(0, (n - 1).bit_length() - 1)
        padded = np.zeros((2 << s, 3), np.uint8)
        padded[:n] = pal
        return s, padded.tobytes()

    gs, gdata = table_bytes(palette)
    out = bytearray()
    out += version
    out += struct.pack("<HHBBB", sw, sh, 0x80 | gs, bg, 0)
    out += gdata
    if extensions:
        out += b"\x21\xf9" + _blocks(b"\x04\x00\x00\x00")  # GCE
        out += b"\x21\xfe" + _blocks(b"spec-derived test comment")
    rows = idx
    if interlace:
        order = [r for first, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(first, ih, step)]
        rows = idx[order]
    ipacked = (0x40 if interlace else 0)
    lct = b""
    if local_palette is not None:
        ls, lct = table_bytes(local_palette)
        ipacked |= 0x80 | ls
    out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, ipacked)
    out += lct
    mcs = min_code if min_code is not None else max(
        2, (len(lct or gdata) // 3 - 1).bit_length())
    out += bytes([mcs])
    out += _blocks(_lzw_encode(mcs, rows.ravel(), **lzw_kwargs))
    if second_frame is not None:
        fh, fw = second_frame.shape
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        out += bytes([mcs])
        out += _blocks(_lzw_encode(mcs, second_frame.ravel()))
    out += b"\x3b"
    return bytes(out)


def test_gif_roundtrip_small_and_kwkwk():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    idx = _rng(1).integers(0, 4, (7, 5), dtype=np.uint8)
    w, h, got = _parse_gif(_gif(idx, pal))
    assert (w, h) == (5, 7) and (got == pal[idx]).all()
    # the KwKwK case: a run of equal pixels makes the decoder receive
    # a code equal to the table length (prev + prev[0])
    run = np.zeros((1, 3), np.uint8)
    assert (_parse_gif(_gif(run, pal))[2] == pal[run]).all()


def test_gif_lzw_width_growth_and_clear_modes():
    """A 256-color random raster grows the code width 9->12 and fills
    the table: the clear-emitting and deferred-clear (frozen-table)
    encodings must both decode to the same pixels."""
    pal = _rng(2).integers(0, 256, (256, 3), dtype=np.uint8)
    idx = _rng(3).integers(0, 256, (96, 96), dtype=np.uint8)
    want = pal[idx]
    for kwargs in ({}, {"defer_clear": True}):
        got = _parse_gif(_gif(idx, pal, **kwargs))[2]
        assert (got == want).all()
    # sanity: the stream really filled the table (quite long raster)
    data = _lzw_encode(8, idx.ravel(), defer_clear=True)
    assert len(_lzw_decode(8, data, idx.size)) == idx.size


def test_gif_clear_before_every_literal():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = _rng(4).integers(0, 2, (9, 9), dtype=np.uint8)
    got = _parse_gif(_gif(idx, pal, clear_every_literal=True))[2]
    assert (got == pal[idx]).all()


def test_gif_interlace_matches_progressive_order():
    pal = _rng(5).integers(0, 256, (16, 3), dtype=np.uint8)
    idx = _rng(6).integers(0, 16, (13, 6), dtype=np.uint8)
    plain = _parse_gif(_gif(idx, pal))[2]
    inter = _parse_gif(_gif(idx, pal, interlace=True))[2]
    assert (plain == inter).all()


def test_gif_local_palette_offset_and_background():
    gpal = np.array([[10, 20, 30], [200, 0, 0]], np.uint8)
    lpal = np.array([[0, 0, 200], [0, 200, 0]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    payload = _gif(idx, gpal, local_palette=lpal, offset=(2, 1),
                   screen=(5, 4), bg=1)
    w, h, got = _parse_gif(payload)
    assert (w, h) == (5, 4)
    assert (got[1:3, 2:4] == lpal[idx]).all()  # frame: LOCAL table
    assert (got[0, 0] == gpal[1]).all()  # background: GLOBAL entry 1


def test_gif_extensions_animation_and_87a():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    first = _rng(7).integers(0, 2, (4, 4), dtype=np.uint8)
    second = 1 - first
    payload = _gif(first, pal, extensions=True, second_frame=second)
    assert (_parse_gif(payload)[2] == pal[first]).all()  # FIRST frame
    assert decode_gif_meta(payload)["format"] == "gif"
    v87 = _gif(first, pal, version=b"GIF87a")
    assert (_parse_gif(v87)[2] == pal[first]).all()


def test_gif_malformed_and_oob():
    pal = np.array([[1, 1, 1], [2, 2, 2]], np.uint8)
    idx = np.zeros((3, 3), np.uint8)
    p = _gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"JIF89a" + p[6:])
    with pytest.raises(ValueError, match="truncated|LZW|image"):
        _parse_gif(p[:20])
    # no color table anywhere
    no_gct = bytearray(p)
    no_gct[10] &= 0x7F  # drop the GCT flag; table bytes now misparse
    with pytest.raises(ValueError):
        _parse_gif(bytes(no_gct))
    # LZW code out of range: width 3 (min_code 2), code 7 with an
    # empty-but-for-literals table
    bad = _blocks(bytes([0b111]))  # first code = 7 > len(table) = 6
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
        + pal[0].tobytes() + pal[1].tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + b"\x02" + bad + b"\x3b"
    )
    with pytest.raises(ValueError, match="out of range"):
        _parse_gif(payload)
    # palette index past the (power-of-two) table: min_code 4 makes
    # literal 5 a legal LZW code over a 4-entry palette
    oob = _gif(np.full((2, 2), 5, np.uint8), np.zeros((4, 3), np.uint8),
               min_code=4)
    with pytest.raises(ValueError, match="palette range"):
        _parse_gif(oob)
    # frame outside the logical screen
    outside = _gif(idx, pal, offset=(3, 0), screen=(4, 3))
    with pytest.raises(ValueError, match="logical screen"):
        _parse_gif(outside)


def test_gif_real_encoder_files():
    logos = sorted(glob.glob(
        "/root/.pyenv/versions/*/lib/*/test/imghdrdata/python.gif"))
    icons = sorted(glob.glob(
        "/root/.pyenv/versions/2.7.18/lib/python2.7/idlelib/Icons/"
        "*.gif"))
    if not logos or not icons:
        pytest.skip("container image data files not present")
    payload = open(logos[0], "rb").read()
    w, h, rgb = _parse_gif(payload)
    assert (w, h) == (16, 16)
    assert rgb.std() > 30  # a real logo, not a desynced smear
    for f in icons:
        w, h, rgb = _parse_gif(open(f, "rb").read())
        assert w > 0 and h > 0 and rgb.shape == (h, w, 3)


def test_gif_dispatch_and_cross_format_hash():
    """decode_real/phash_real route GIFs hermetically; the same pixels
    in a P6 PPM and a GIF hash identically through the shared
    kernel."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — hermetic fallback never runs")
    except ImportError:
        pass
    pal = _rng(8).integers(0, 256, (64, 3), dtype=np.uint8)
    idx = np.repeat(
        np.repeat(_rng(9).integers(0, 64, (4, 9), dtype=np.uint8),
                  8, axis=0), 8, axis=1
    )
    rgb = pal[idx]
    payload = _gif(idx, pal)
    meta = M.decode_real(payload)
    assert meta == {"n_bytes": len(payload), "width": 72, "height": 32,
                    "format": "gif"}
    h_, w_ = rgb.shape[:2]
    ppm = b"P6 %d %d 255\n" % (w_, h_) + rgb.tobytes()
    assert M.phash_real(payload) == M.phash_real(ppm)


# ---------------------------------------------------------------------------
# animation: compositing + frame sampling
# ---------------------------------------------------------------------------


def _agif(frames_spec, gpal, screen, bg=0):
    """Animated-GIF builder: frames_spec = list of (idx_array,
    (left, top), gce_dict_or_None, local_pal_or_None); gce keys:
    disposal, transparent, delay."""

    def table_bytes(pal):
        n = len(pal)
        s = max(0, (n - 1).bit_length() - 1)
        padded = np.zeros((2 << s, 3), np.uint8)
        padded[:n] = pal
        return s, padded.tobytes()

    sw, sh = screen
    gs, gdata = table_bytes(gpal)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", sw, sh, 0x80 | gs, bg, 0)
    out += gdata
    for idx, (left, top), gce, lpal in frames_spec:
        if gce is not None:
            packed = (gce.get("disposal", 0) & 7) << 2
            t = gce.get("transparent")
            if t is not None:
                packed |= 1
            out += b"\x21\xf9" + _blocks(
                bytes([packed])
                + struct.pack("<H", gce.get("delay", 0))
                + bytes([t if t is not None else 0])
            )
        ih, iw = idx.shape
        ipacked = 0
        lct = b""
        if lpal is not None:
            ls, lct = table_bytes(lpal)
            ipacked |= 0x80 | ls
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih,
                                     ipacked)
        out += lct
        mcs = max(2, (len(lct or gdata) // 3 - 1).bit_length())
        out += bytes([mcs])
        out += _blocks(_lzw_encode(mcs, idx.ravel()))
    out += b"\x3b"
    return bytes(out)


def _composite_ref(frames_spec, gpal, screen, bg=0):
    """Independent reference compositor (re-derived from the GIF89a
    text, not from the decoder): returns the per-frame canvases."""
    sw, sh = screen
    bgc = gpal[bg] if bg < len(gpal) else gpal[0]
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:, :] = bgc
    outs = []
    for idx, (left, top), gce, lpal in frames_spec:
        pal = lpal if lpal is not None else gpal
        disposal = (gce or {}).get("disposal", 0)
        t = (gce or {}).get("transparent")
        saved = canvas.copy()
        ih, iw = idx.shape
        for y in range(ih):
            for x in range(iw):
                if t is None or idx[y, x] != t:
                    canvas[top + y, left + x] = pal[idx[y, x]]
        outs.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + ih, left : left + iw] = bgc
        elif disposal == 3:
            canvas = saved
    return outs


def test_gif_animation_compositing_disposals():
    from tower_parse_spark.operators.gif import _parse_gif_frames

    gpal = np.array(
        [[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    lpal = np.array([[40, 41, 42], [50, 51, 52]], np.uint8)
    rng = _rng(20)
    f0 = rng.integers(0, 4, (6, 8), dtype=np.uint8)
    f1 = rng.integers(0, 4, (3, 4), dtype=np.uint8)  # partial, transp
    f2 = rng.integers(0, 2, (2, 2), dtype=np.uint8)  # local palette
    f3 = rng.integers(0, 4, (4, 4), dtype=np.uint8)
    spec = [
        (f0, (0, 0), {"disposal": 1, "delay": 10}, None),
        (f1, (2, 1), {"disposal": 2, "transparent": 1, "delay": 20},
         None),
        (f2, (5, 3), {"disposal": 3, "delay": 30}, lpal),
        (f3, (1, 2), None, None),
    ]
    payload = _agif(spec, gpal, (8, 6))
    sw, sh, frames, delays = _parse_gif_frames(payload)
    assert (sw, sh) == (8, 6)
    want = _composite_ref(spec, gpal, (8, 6))
    assert len(frames) == len(want) == 4
    for got, ref in zip(frames, want):
        assert (got == ref).all()
    assert delays == [10, 20, 30, 0]
    # first-frame decode equals the animation's first composite
    assert (_parse_gif(payload)[2] == want[0]).all()


def test_frame_sample_real_animated_and_static():
    from tower_parse_spark.operators.multimodal import (
        _dhash_rgb,
        frame_sample_real,
        phash_ppm,
    )

    gpal = _rng(21).integers(0, 256, (8, 3), dtype=np.uint8)
    rng = _rng(22)
    spec = [
        (rng.integers(0, 8, (16, 16), dtype=np.uint8), (0, 0),
         {"delay": 5}, None)
        for _ in range(6)
    ]
    payload = _agif(spec, gpal, (16, 16))
    hashes = frame_sample_real(payload, n_frames=3)
    want = _composite_ref(spec, gpal, (16, 16))
    assert hashes == [_dhash_rgb(want[0]), _dhash_rgb(want[2]),
                      _dhash_rgb(want[4])]
    # a static PPM is a 1-frame animation: n repeats of its dHash
    rgb = _rng(23).integers(0, 256, (32, 72, 3), dtype=np.uint8)
    ppm = b"P6 72 32 255\n" + rgb.tobytes()
    assert frame_sample_real(ppm) == [phash_ppm(ppm)] * 3
    # two different ENCODINGS of the same animation sample identically
    spec_i = [(s[0], s[1], s[2], s[3]) for s in spec]
    p2 = _agif(spec_i, gpal, (16, 16))  # same content, fresh stream
    assert frame_sample_real(p2, n_frames=3) == hashes
