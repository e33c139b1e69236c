"""Legacy raster decoders (operators/rasters.py): round-trips against
independent spec-derived encoders for every variant, and the real
CPython imghdrdata family — python.{ppm,ras,sgi} must decode to
BIT-IDENTICAL pixels (three real encoders, three independent
decoders, one logo) and python.{pbm,xbm} likewise."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators.rasters import (
    UnsupportedRasterError,
    _parse_pnm,
    _parse_sgi,
    _parse_sun,
    _parse_xbm,
    decode_pnm_meta,
    decode_sun_meta,
)

_BASE = "/root/.pyenv/versions/2.7.18/lib/python2.7/test/imghdrdata/"


def _rng(seed):
    return np.random.default_rng(seed)


def test_pnm_ascii_variants():
    bits = _rng(1).integers(0, 2, (5, 9), dtype=np.uint8)
    # P1 with abutting digits and a comment
    rows = b"\n".join(b"".join(b"%d" % v for v in r) for r in bits)
    p1 = b"P1\n# logo\n9 5\n" + rows
    got = _parse_pnm(p1)[2]
    assert (got[:, :, 0] == np.where(bits == 1, 0, 255)).all()
    gray = _rng(2).integers(0, 200, (4, 6), dtype=np.uint8)
    p2 = b"P2 6 4 199\n" + b" ".join(b"%d" % v for v in gray.ravel())
    got = _parse_pnm(p2)[2]
    assert (got[:, :, 1] == (gray.astype(int) * 255 // 199)).all()
    rgb = _rng(3).integers(0, 256, (3, 5, 3), dtype=np.uint8)
    p3 = b"P3 5 3 255 " + b" ".join(b"%d" % v for v in rgb.ravel())
    assert (_parse_pnm(p3)[2] == rgb).all()


def test_pnm_binary_variants_and_16bit():
    bits = _rng(4).integers(0, 2, (7, 13), dtype=np.uint8)
    p4 = b"P4\n13 7\n" + np.packbits(bits, axis=1).tobytes()
    got = _parse_pnm(p4)[2]
    assert (got[:, :, 0] == np.where(bits == 1, 0, 255)).all()
    gray = _rng(5).integers(0, 256, (6, 8), dtype=np.uint8)
    p5 = b"P5 8 6 255\n" + gray.tobytes()
    assert (_parse_pnm(p5)[2][:, :, 0] == gray).all()
    wide = gray.astype(np.uint16) * 257  # 16-bit big-endian maxval
    p5w = b"P5 8 6 65535\n" + wide.astype(">u2").tobytes()
    assert (_parse_pnm(p5w)[2][:, :, 0] == gray).all()
    meta = decode_pnm_meta(p5)
    assert (meta["width"], meta["height"], meta["format"]) == (8, 6,
                                                               "pgm")


def test_pnm_malformed():
    with pytest.raises(ValueError, match="not a PNM"):
        _parse_pnm(b"P7 1 1 255 x")
    with pytest.raises(ValueError, match="truncated"):
        _parse_pnm(b"P5 8 6 255\n" + b"\x00" * 10)
    with pytest.raises(ValueError, match="exceeds maxval"):
        _parse_pnm(b"P2 2 1 10\n5 11")
    with pytest.raises(ValueError, match="bitmap character"):
        _parse_pnm(b"P1 2 1\n0 2")


def _sun(rgb, rtype=1, depth=24, cmap=None):
    h, w = rgb.shape[:2]
    if depth == 24:
        px = rgb[:, :, ::-1] if rtype != 3 else rgb
        rows = [px[y].tobytes() for y in range(h)]
    elif depth == 32:
        px = np.concatenate(
            [np.zeros((h, w, 1), np.uint8),
             rgb[:, :, ::-1] if rtype != 3 else rgb], axis=2)
        rows = [px[y].tobytes() for y in range(h)]
    elif depth == 8:
        rows = [rgb[y].tobytes() for y in range(h)]
    stride = ((w * depth + 15) // 16) * 2
    data = b"".join(r + b"\x00" * (stride - len(r)) for r in rows)
    if rtype == 2:
        enc = bytearray()
        i = 0
        while i < len(data):
            run = 1
            while (i + run < len(data) and data[i + run] == data[i]
                   and run < 256):
                run += 1
            if run >= 3 or data[i] == 0x80:
                enc += bytes([0x80, run - 1, data[i]]) if run > 1 \
                    or data[i] != 0x80 else bytes([0x80, 0])
                if run == 1 and data[i] == 0x80:
                    pass
                i += run
            else:
                enc.append(data[i])
                i += 1
        data = bytes(enc)
    cm = b""
    maptype = 0
    if cmap is not None:
        cm = (cmap[:, 0].tobytes() + cmap[:, 1].tobytes()
              + cmap[:, 2].tobytes())
        maptype = 1
    return (b"\x59\xa6\x6a\x95"
            + struct.pack(">IIIIIII", w, h, depth, len(data), rtype,
                          maptype, len(cm))
            + cm + data)


def test_sun_raster_variants():
    rgb = _rng(6).integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for rtype, depth in ((1, 24), (3, 24), (1, 32), (2, 24)):
        payload = _sun(rgb, rtype=rtype, depth=depth)
        w, h, got = _parse_sun(payload)
        assert (w, h) == (7, 5) and (got == rgb).all(), (rtype, depth)
    # 8-bit colormapped
    cmap = _rng(7).integers(0, 256, (16, 3), dtype=np.uint8)
    idx = _rng(8).integers(0, 16, (4, 6), dtype=np.uint8)
    got = _parse_sun(_sun(idx, depth=8, cmap=cmap))[2]
    assert (got == cmap[idx]).all()
    assert decode_sun_meta(_sun(rgb))["format"] == "ras"
    with pytest.raises(UnsupportedRasterError):
        _parse_sun(_sun(rgb, rtype=4))
    with pytest.raises(ValueError, match="truncated"):
        _parse_sun(_sun(rgb)[:-6])


def _sgi(chans_hw, rle=False):
    """chans_hw: list of HxW uint8 planes."""
    channels = len(chans_hw)
    h, w = chans_hw[0].shape
    dim = 3 if channels > 1 else 2
    head = (b"\x01\xda" + bytes([1 if rle else 0, 1])
            + struct.pack(">HHHH", dim, w, h, channels)
            + struct.pack(">II", 0, 255))
    head = head.ljust(512, b"\x00")
    if not rle:
        body = b"".join(c[::-1].tobytes() for c in chans_hw)
        return head + body
    rows = []
    for c in chans_hw:
        for y in range(h - 1, -1, -1):
            row = c[y]
            enc = bytearray()
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] \
                        and run < 127:
                    run += 1
                if run >= 3:
                    enc += bytes([run, row[x]])
                    x += run
                else:
                    j = min(x + 127, w)
                    lit = row[x:j]
                    enc += bytes([0x80 | len(lit)]) + lit.tobytes()
                    x = j
            enc.append(0)
            rows.append(bytes(enc))
    tab_start = 512 + 8 * h * channels
    starts, lengths = [], []
    cur = tab_start
    for r in rows:
        starts.append(cur)
        lengths.append(len(r))
        cur += len(r)
    return (head
            + np.array(starts, ">u4").tobytes()
            + np.array(lengths, ">u4").tobytes()
            + b"".join(rows))


def test_sgi_verbatim_and_rle():
    rgb = _rng(9).integers(0, 256, (6, 9, 3), dtype=np.uint8)
    planes = [rgb[:, :, c] for c in range(3)]
    for rle in (False, True):
        w, h, got = _parse_sgi(_sgi(planes, rle=rle))
        assert (w, h) == (9, 6) and (got == rgb).all(), rle
    # luminance + RGBA
    gray = _rng(10).integers(0, 256, (4, 5), dtype=np.uint8)
    got = _parse_sgi(_sgi([gray]))[2]
    assert (got[:, :, 2] == gray).all()
    rgba = planes + [np.full((6, 9), 7, np.uint8)]
    assert (_parse_sgi(_sgi(rgba, rle=True))[2] == rgb).all()
    # 16-bit VERBATIM decodes (high byte); 16-bit RLE stays gated
    wide = b"".join(
        (planes[c][::-1].astype(np.uint16) * 257).astype(">u2")
        .tobytes() for c in range(3)
    )
    head = bytearray(_sgi(planes)[:512])
    head[3] = 2  # bpc
    got16 = _parse_sgi(bytes(head) + wide)[2]
    assert (got16 == rgb).all()
    bpc2_rle = bytearray(_sgi(planes, rle=True))
    bpc2_rle[3] = 2
    with pytest.raises(UnsupportedRasterError):
        _parse_sgi(bytes(bpc2_rle))


def test_xbm_roundtrip():
    bits = _rng(11).integers(0, 2, (5, 12), dtype=np.uint8)
    arr = np.packbits(bits, axis=1, bitorder="little")
    body = ", ".join("0x%02x" % v for v in arr.ravel())
    payload = (
        "#define logo_width 12\n#define logo_height 5\n"
        "static unsigned char logo_bits[] = {\n  %s };\n" % body
    ).encode()
    w, h, got = _parse_xbm(payload)
    assert (w, h) == (12, 5)
    assert (got[:, :, 0] == np.where(bits == 1, 0, 255)).all()
    with pytest.raises(ValueError, match="width/height"):
        _parse_xbm(b"#define nothing 3\n{0x00};")


def test_real_fixture_cross_format_pixel_identity():
    """The CPython logo family: python.ppm == python.ras == python.sgi
    pixel-for-pixel, python.pbm == python.xbm, and python.pgm is the
    ITU-luma rendition of the color one to within rounding."""
    files = {ext: _BASE + "python." + ext
             for ext in ("ppm", "pgm", "pbm", "ras", "sgi", "xbm")}
    if not all(glob.glob(p) for p in files.values()):
        pytest.skip("container image data files not present")
    ppm = M._parse_ppm(open(files["ppm"], "rb").read())[2]
    ras = _parse_sun(open(files["ras"], "rb").read())[2]
    sgi = _parse_sgi(open(files["sgi"], "rb").read())[2]
    assert (ppm == ras).all() and (ppm == sgi).all()
    assert M._dhash_rgb(ppm) == M._dhash_rgb(ras) == M._dhash_rgb(sgi)
    pbm = _parse_pnm(open(files["pbm"], "rb").read())[2]
    xbm = _parse_xbm(open(files["xbm"], "rb").read())[2]
    assert (pbm == xbm).all()
    pgm = _parse_pnm(open(files["pgm"], "rb").read())[2]
    luma = (0.299 * ppm[:, :, 0] + 0.587 * ppm[:, :, 1]
            + 0.114 * ppm[:, :, 2])
    assert float(np.abs(pgm[:, :, 0].astype(float) - luma).max()) < 5


def test_dispatch_routes_the_raster_family():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — hermetic fallback never runs")
    except ImportError:
        pass
    rgb = np.repeat(
        np.repeat(_rng(12).integers(0, 256, (4, 9, 3), dtype=np.uint8),
                  8, axis=0), 8, axis=1
    )
    ras = _sun(rgb)
    meta = M.decode_real(ras)
    assert (meta["width"], meta["height"], meta["format"]) == (
        72, 32, "ras")
    ppm = b"P6 72 32 255\n" + rgb.tobytes()
    sgi = _sgi([rgb[:, :, c] for c in range(3)], rle=True)
    assert M.phash_real(ras) == M.phash_real(ppm) == M.phash_real(sgi)
    # P5 routes through the pnm entry
    gray = rgb[:, :, 0]
    p5 = b"P5 72 32 255\n" + gray.tobytes()
    assert M.decode_real(p5)["format"] == "pgm"