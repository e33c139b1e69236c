"""Hermetic baseline-JPEG decoder (operators/jpeg.py, ITU-T T.81):
round-trip against an independent spec-derived encoder, real-encoder
file smoke (CPython/rustup ship baseline JPEGs in this container), and
the multimodal dispatch contract."""

from __future__ import annotations

import os

import numpy as np
import pytest

from tower_parse_spark.operators import multimodal as M
from tower_parse_spark.operators.jpeg import (
    _ZIGZAG,
    UnsupportedJpegError,
    _idct_matrix,
    _parse_jpeg,
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:  # pad with 1s per spec
        while self.n:
            self.write(1, 1)


def _canonical(symbols):
    """All-same-length canonical table: counts + encode map. Length L
    chosen so the all-ones code stays unused (spec reserves it)."""
    syms = sorted(set(symbols))
    L = max(2, (len(syms) + 1).bit_length())
    counts = [0] * 16
    counts[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return counts, syms, enc


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


_QY = np.array([16] * 64, dtype=np.float64)   # flat quality table: mild loss
_QC = np.array([24] * 64, dtype=np.float64)


def _dct_blocks(rgb, gray=False):
    """Shared encoder front end: color transform, 8x8 DCT, flat-table
    quantization — returns (h, w, ph, pw, blocks_per_plane) with
    blocks in raster order as zigzag-ordered int arrays. Both the
    baseline and the progressive test encoders emit from the SAME
    coefficients, which is what makes their decodes comparable
    pixel-for-pixel."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y] if gray else [y, cb, cr]
    qts = [_QY] if gray else [_QY, _QC, _QC]

    m = _idct_matrix()
    zz = np.array(_ZIGZAG)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    blocks_per_plane = []
    for p in planes:
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blk = []
        for by in range(ph // 8):
            for bx in range(pw // 8):
                f = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                S = m @ f @ m.T
                blk.append(np.round(
                    S.reshape(64)[zz] / qts[len(blocks_per_plane)][0]
                ).astype(int))
        blocks_per_plane.append(blk)
    return h, w, ph, pw, blocks_per_plane


def _jpeg(rgb, gray=False, restart_interval=0):
    """Independent baseline encoder (4:4:4, flat quant tables, custom
    canonical huffman tables): enough of T.81 to exercise every decoder
    path — DC prediction, AC runs/ZRL/EOB, stuffing, restarts,
    grayscale — written from the spec, not from the decoder."""
    import struct

    h, w, ph, pw, blocks_per_plane = _dct_blocks(rgb, gray=gray)
    planes = blocks_per_plane

    # gather emitted symbols -> canonical tables (per class, shared
    # luma/chroma for simplicity: table ids 0 only)
    dc_syms, ac_syms = set(), set()
    seqs = []
    n_mcu = (ph // 8) * (pw // 8)
    for mcu in range(n_mcu):
        row = []
        for ci in range(len(planes)):
            row.append(blocks_per_plane[ci][mcu])
        seqs.append(row)
    pred = [0] * len(planes)
    emitted = []
    rst = 0
    for i, row in enumerate(seqs):
        if restart_interval and i and i % restart_interval == 0:
            emitted.append(("RST", rst % 8))
            rst += 1
            pred = [0] * len(planes)
        for ci, coefs in enumerate(row):
            diff = int(coefs[0]) - pred[ci]
            pred[ci] = int(coefs[0])
            s = _category(diff)
            dc_syms.add(s)
            emitted.append(("DC", s, diff))
            k, run = 1, 0
            while k < 64:
                v = int(coefs[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        ac_syms.add(0xF0)
                        emitted.append(("AC", 0xF0, 0, 0))
                        run -= 16
                    sz = _category(v)
                    ac_syms.add((run << 4) | sz)
                    emitted.append(("AC", (run << 4) | sz, v, sz))
                    run = 0
                k += 1
            if run:
                ac_syms.add(0x00)
                emitted.append(("AC", 0x00, 0, 0))
    dc_counts, dc_sorted, dc_enc = _canonical(dc_syms)
    ac_counts, ac_sorted, ac_enc = _canonical(ac_syms)

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate([_QY] if gray else [_QY, _QC]):
        out += chunk(0xDB, bytes([tq]) + bytes(int(v) for v in q))
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else (0 if gray else 1)])
    out += chunk(0xC0, sof)
    out += chunk(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_sorted))
    out += chunk(
        0xC4, bytes([0x10]) + bytes(ac_counts)
        + b"".join(bytes([s]) for s in ac_sorted)
    )
    if restart_interval:
        out += chunk(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += chunk(0xDA, sos)

    wtr = _BitWriter()
    for item in emitted:
        if item[0] == "RST":
            wtr.align()
            wtr.out += bytes([0xFF, 0xD0 + item[1]])
        elif item[0] == "DC":
            _, s, diff = item
            code, L = dc_enc[s]
            wtr.write(code, L)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        else:
            _, sym, v, sz = item
            code, L = ac_enc[sym]
            wtr.write(code, L)
            if sz:
                wtr.write(v if v > 0 else v + (1 << sz) - 1, sz)
    wtr.align()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _chunk(marker, body):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _write_headers(out, h, w, gray, sof_marker):
    import struct

    ncomp = 1 if gray else 3
    for tq, q in enumerate([_QY] if gray else [_QY, _QC]):
        out += _chunk(0xDB, bytes([tq]) + bytes(int(v) for v in q))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else (0 if gray else 1)])
    out += _chunk(sof_marker, sof)
    return ncomp


def _sos(comp_ids, ss, se, ah, al):
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0 / AC table 0
    body += bytes([ss, se, (ah << 4) | al])
    return _chunk(0xDA, body)


def _prog_jpeg(rgb, gray=False, dc_al=0, bands=((1, 5), (6, 63)),
               restart_interval=0):
    """Independent PROGRESSIVE encoder sharing _dct_blocks' coefficient
    stage with the baseline `_jpeg`: DC-first scan (point-transformed
    by *dc_al*) plus raw-bit DC refinement scans, then per-component
    spectral AC scans at Al=0 with true EOB-run accumulation across
    blocks. Same coefficients as the baseline stream, so the decoder's
    scan assembly is testable by EXACT pixel equality. Written from
    T.81 G.1.2, not from the decoder."""
    import struct

    h, w, ph, pw, blocks = _dct_blocks(rgb, gray=gray)
    n_blk = (ph // 8) * (pw // 8)
    out = bytearray(b"\xff\xd8")
    ncomp = _write_headers(out, h, w, gray, 0xC2)
    if restart_interval:
        out += _chunk(0xDD, struct.pack(">H", restart_interval))

    # ---- DC first scan: interleaved, diffs of (dc >> dc_al) ----
    dc_vals = [
        [int(blocks[ci][i][0]) >> dc_al for i in range(n_blk)]
        for ci in range(ncomp)
    ]
    emitted, pred, rst = [], [0] * ncomp, 0
    for i in range(n_blk):
        if restart_interval and i and i % restart_interval == 0:
            emitted.append(("RST", rst % 8))
            rst += 1
            pred = [0] * ncomp
        for ci in range(ncomp):
            diff = dc_vals[ci][i] - pred[ci]
            pred[ci] = dc_vals[ci][i]
            emitted.append(("DC", _category(diff), diff))
    counts, symbols, enc = _canonical(
        {s for t, s, *_r in emitted if t == "DC"}
    )
    out += _chunk(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    out += _sos(list(range(1, ncomp + 1)), 0, 0, 0, dc_al)
    wtr = _BitWriter()
    for item in emitted:
        if item[0] == "RST":
            wtr.align()
            wtr.out += bytes([0xFF, 0xD0 + item[1]])
        else:
            _t, s, diff = item
            code, ln = enc[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    wtr.align()
    out += wtr.out

    # ---- DC refinement scans: one raw bit per block ----
    for al in range(dc_al - 1, -1, -1):
        out += _sos(list(range(1, ncomp + 1)), 0, 0, al + 1, al)
        wtr = _BitWriter()
        rst = 0
        for i in range(n_blk):
            if restart_interval and i and i % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
            for ci in range(ncomp):
                wtr.write((int(blocks[ci][i][0]) >> al) & 1, 1)
        wtr.align()
        out += wtr.out

    # ---- AC spectral scans: per component, Al=0, EOB-run coded ----
    for ci in range(ncomp):
        for ss, se in bands:
            emitted = []
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                while eobrun:
                    r = min(eobrun.bit_length() - 1, 14)
                    take = min(eobrun, (1 << (r + 1)) - 1)
                    emitted.append(("EOB", r, take - (1 << r)))
                    eobrun -= take

            rst = 0
            for i in range(n_blk):
                if restart_interval and i and i % restart_interval == 0:
                    flush_eob()
                    emitted.append(("RST", rst % 8))
                    rst += 1
                band = [int(blocks[ci][i][k]) for k in range(ss, se + 1)]
                nz = [j for j, v in enumerate(band) if v]
                if not nz:
                    eobrun += 1
                    continue
                flush_eob()
                run = 0
                for j in range(nz[-1] + 1):
                    if band[j] == 0:
                        run += 1
                        continue
                    while run > 15:
                        emitted.append(("ACV", 0xF0, 0, 0))
                        run -= 16
                    sz = _category(band[j])
                    emitted.append(("ACV", (run << 4) | sz, band[j], sz))
                    run = 0
                if nz[-1] < len(band) - 1:
                    eobrun = 1  # this block's tail starts a fresh run
            flush_eob()
            syms = {
                it[1] if it[0] == "ACV" else (it[1] << 4)
                for it in emitted if it[0] in ("ACV", "EOB")
            }
            counts, symbols, enc = _canonical(syms or {0x00})
            out += _chunk(
                0xC4, bytes([0x10]) + bytes(counts) + bytes(symbols)
            )
            out += _sos([ci + 1], ss, se, 0, 0)
            wtr = _BitWriter()
            for it in emitted:
                if it[0] == "RST":
                    wtr.align()
                    wtr.out += bytes([0xFF, 0xD0 + it[1]])
                elif it[0] == "EOB":
                    _t, r, extra = it
                    code, ln = enc[r << 4]
                    wtr.write(code, ln)
                    if r:
                        wtr.write(extra, r)
                else:
                    _t, sym, v, sz = it
                    code, ln = enc[sym]
                    wtr.write(code, ln)
                    if sz:
                        wtr.write(v if v > 0 else v + (1 << sz) - 1, sz)
            wtr.align()
            out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _seq_multiscan_jpeg(rgb, gray=False):
    """Sequential SOF0 stream with ONE FULL-SPECTRUM SCAN PER COMPONENT
    (previously UnsupportedJpegError 'multi-scan JPEG') — same
    coefficients as `_jpeg`'s interleaved stream."""
    h, w, ph, pw, blocks = _dct_blocks(rgb, gray=gray)
    n_blk = (ph // 8) * (pw // 8)
    out = bytearray(b"\xff\xd8")
    ncomp = _write_headers(out, h, w, gray, 0xC0)
    # shared tables over every component's symbols
    dc_syms, ac_syms, per_scan = set(), set(), []
    for ci in range(ncomp):
        emitted, pred = [], 0
        for i in range(n_blk):
            coefs = blocks[ci][i]
            diff = int(coefs[0]) - pred
            pred = int(coefs[0])
            s = _category(diff)
            dc_syms.add(s)
            emitted.append(("DC", s, diff))
            run = 0
            for k in range(1, 64):
                v = int(coefs[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    emitted.append(("ACV", 0xF0, 0, 0))
                    run -= 16
                sz = _category(v)
                ac_syms.add((run << 4) | sz)
                emitted.append(("ACV", (run << 4) | sz, v, sz))
                run = 0
            if run:
                ac_syms.add(0x00)
                emitted.append(("ACV", 0x00, 0, 0))
        per_scan.append(emitted)
    dcc, dcs, dce = _canonical(dc_syms)
    acc, acs, ace = _canonical(ac_syms)
    out += _chunk(0xC4, bytes([0x00]) + bytes(dcc) + bytes(dcs))
    out += _chunk(0xC4, bytes([0x10]) + bytes(acc) + bytes(acs))
    for ci in range(ncomp):
        out += _sos([ci + 1], 0, 63, 0, 0)
        wtr = _BitWriter()
        for it in per_scan[ci]:
            if it[0] == "DC":
                _t, s, diff = it
                code, ln = dce[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            else:
                _t, sym, v, sz = it
                code, ln = ace[sym]
                wtr.write(code, ln)
                if sz:
                    wtr.write(v if v > 0 else v + (1 << sz) - 1, sz)
        wtr.align()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _psnr(a, b):
    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_color_gray_and_restarts():
    """decode(encode(img)) within quantization loss for smooth images,
    across color / grayscale / restart-marker variants — encoder and
    decoder are independent readings of T.81."""
    h, w = 24, 40
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack(
        [(xs * 5) % 256, (ys * 7) % 256, ((xs + ys) * 3) % 256], axis=2
    ).astype(np.uint8)
    smooth = np.stack([xs * 4, ys * 6, xs * 2 + ys * 2], axis=2).clip(
        0, 255
    ).astype(np.uint8)
    for img in (rgb, smooth):
        for kwargs in ({}, {"gray": True}, {"restart_interval": 3}):
            gw, gh, got = _parse_jpeg(_jpeg(img, **kwargs))
            assert (gw, gh) == (w, h)
            ref = img
            if kwargs.get("gray"):
                yy = (
                    0.299 * img[:, :, 0]
                    + 0.587 * img[:, :, 1]
                    + 0.114 * img[:, :, 2]
                )
                ref = np.repeat(
                    yy.round().clip(0, 255).astype(np.uint8)[:, :, None],
                    3, axis=2,
                )
            assert _psnr(ref, got) > (30 if img is smooth else 24), kwargs
    # non-multiple-of-8 edge handling: 5x9 image
    tiny = (np.arange(5 * 9 * 3, dtype=np.uint8) % 251).reshape(5, 9, 3)
    gw, gh, got = _parse_jpeg(_jpeg(tiny))
    assert (gw, gh) == (9, 5) and got.shape == (5, 9, 3)


def test_smooth_gradient_hash_survives_roundtrip():
    """The decode is faithful enough that dHash bits agree between the
    original pixels and the JPEG round-trip on smooth content — the
    property the near-dup pipeline needs from a real decoder."""
    h, w = 16, 32
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    grad = np.repeat(((xs * 255) // (w - 1))[:, :, None], 3, axis=2).astype(
        np.uint8
    )
    _, _, got = _parse_jpeg(_jpeg(grad))
    assert M._dhash_rgb(got) == M._dhash_rgb(grad) == 0


_REAL = {
    # real-encoder baseline files shipped in this container (CPython
    # test data, rustup docs) — break the enc/dec circularity
    "gray2x2": "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
    "python3.11/site-packages/IPython/core/tests/2x2.jpg",
    "logo420": "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
    "test_email/data/python.jpg",
    "photo_rst": "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
    "share/doc/rust/html/embedded-book/assets/verify.jpeg",
    "progressive": "/root/.rustup/toolchains/stable-x86_64-unknown-linux-"
    "gnu/share/doc/rust/html/embedded-book/assets/f3.jpg",
}


def test_real_encoder_files_decode():
    """Streams from real encoders: a grayscale single-component file, a
    4:2:0-subsampled logo, and a 100 KB photo WITH restart markers
    (DRI=90) — a huffman desync anywhere would explode as an invalid
    code long before the end of that stream."""
    if not all(os.path.exists(p) for p in _REAL.values()):
        pytest.skip("container image data files not present")
    w, h, rgb = _parse_jpeg(open(_REAL["gray2x2"], "rb").read())
    assert (w, h) == (2, 2)
    assert (rgb[:, :, 0] == rgb[:, :, 1]).all()  # grayscale replication
    w, h, rgb = _parse_jpeg(open(_REAL["logo420"], "rb").read())
    assert (w, h, rgb.shape[2]) == (16, 16, 3)
    assert rgb.std() > 30  # a real logo, not a desynced smear
    w, h, rgb = _parse_jpeg(open(_REAL["photo_rst"], "rb").read())
    assert (w, h) == (720, 477)
    assert 10 < rgb.mean() < 245 and rgb.std() > 10
    # r15: progressive decodes hermetically now (full scan script:
    # DC-first Al=1, spectral AC scans at Al>=1, AC+DC refinements)
    w, h, rgb = _parse_jpeg(open(_REAL["progressive"], "rb").read())
    assert (w, h) == (720, 477)
    assert 10 < rgb.mean() < 245 and rgb.std() > 10


def test_dispatch_and_unsupported_naming(monkeypatch):
    """decode_real/phash_real route JPEG hermetically; progressive
    names pillow (not a bare ValueError); malformed stays ValueError."""
    import sys

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — gated branch never runs")
    except ImportError:
        pass
    xs, ys = np.meshgrid(np.arange(16), np.arange(8))
    img = np.stack([xs * 10, ys * 20, xs * 5], axis=2).clip(0, 255).astype(
        np.uint8
    )
    p = _jpeg(img)
    meta = M.decode_real(p)
    assert meta == {
        "n_bytes": len(p), "width": 16, "height": 8, "format": "jpeg"
    }
    assert isinstance(M.phash_real(p), int)
    if os.path.exists(_REAL["progressive"]):
        # r15: progressive routes hermetically through the same dispatch
        prog = open(_REAL["progressive"], "rb").read()
        assert M.decode_real(prog) == {
            "n_bytes": len(prog), "width": 720, "height": 477,
            "format": "jpeg",
        }
        assert isinstance(M.phash_real(prog), int)
    # arithmetic-coded SOF9 still names pillow through the dispatch
    arith = (
        b"\xff\xd8"
        + bytes([0xFF, 0xC9, 0, 11, 8, 0, 8, 0, 8, 1])
        + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="pillow"):
        M.phash_real(arith)
    with pytest.raises(ValueError, match="SOI"):
        _parse_jpeg(b"RIFFxxxxWEBP")
    with pytest.raises(ValueError, match="truncated|stream"):
        _parse_jpeg(p[: len(p) // 2])


def test_malformed_streams_are_valueerror():
    import struct

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    no_sos = b"\xff\xd8" + chunk(0xDB, bytes([0]) + bytes(64)) + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan"):
        _parse_jpeg(no_sos)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    missing_tables = (
        b"\xff\xd8"
        + chunk(0xC0, sof)
        + chunk(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x00" * 8
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="quant table"):
        _parse_jpeg(missing_tables)


def _find_marker(payload: bytes, marker: int) -> int:
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos + 1] == marker:
            return pos
        pos += 2 + int.from_bytes(payload[pos + 2:pos + 4], "big")
    raise AssertionError(f"marker {marker:#x} not found")


def test_noninterleaved_single_component_with_subsampling_factors():
    """Review r14 #1: per T.81 A.2 a one-component scan is
    NON-interleaved (one data unit per MCU, raster over the component's
    own dims) regardless of its sampling factors — jpegtran -grayscale
    keeps the source Y's 2x2 factors. Same entropy data, SOF patched
    from 1x1 to 2x2, must decode to identical pixels (for nf=1 the
    component's subsampled dims ARE the image dims)."""
    xs, ys = np.meshgrid(np.arange(24), np.arange(16))
    img = np.repeat((xs * 9 + ys * 4).clip(0, 255).astype(np.uint8)[:, :, None], 3, 2)
    p = _jpeg(img, gray=True)
    _, _, want = _parse_jpeg(p)
    sof = _find_marker(p, 0xC0)
    assert p[sof + 4 + 7] == 0x11
    patched = bytearray(p)
    patched[sof + 4 + 7] = 0x22
    gw, gh, got = _parse_jpeg(bytes(patched))
    assert (gw, gh) == (24, 16)
    assert (got == want).all()


def test_fill_bytes_before_markers():
    """Review r14 #2: any number of 0xFF fill bytes may precede a
    marker (T.81 B.1.1.2) — the walk must skip them, not read the
    marker byte as a segment-length high byte."""
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    p = _jpeg(img)
    _, _, want = _parse_jpeg(p)
    sof = _find_marker(p, 0xC0)
    stuffed = p[:sof] + b"\xff\xff\xff" + p[sof:]
    gw, gh, got = _parse_jpeg(stuffed)
    assert (gw, gh) == (8, 8) and (got == want).all()


def test_adobe_rgb_transform_zero():
    """Review r14 #3: a 3-component frame with APP14 transform=0 (or
    'R','G','B' component ids) stores RGB directly — rotating it
    through the YCbCr matrix would hash the wrong pixels. The encoder
    variant stores the raw channels and stamps APP14; decode must
    return ~the original RGB, not a color-rotated smear."""
    import struct

    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    # stay near mid-gray so the pre-inverted channels remain in range
    img = np.stack(
        [128 + xs * 3, 128 - ys * 3, 128 + xs + ys], axis=2
    ).clip(0, 255).astype(np.uint8)
    p = _jpeg_rgb_stored(img)
    gw, gh, got = _parse_jpeg(p)
    assert (gw, gh) == (16, 16)
    assert _psnr(img, got) > 30
    # the same stream WITHOUT the APP14 marker color-rotates (sanity
    # that the test is not vacuous): psnr collapses
    app14 = _find_marker(p, 0xEE)
    seglen = int.from_bytes(p[app14 + 2:app14 + 4], "big")
    stripped = p[:app14] + p[app14 + 2 + seglen:]
    _, _, rotated = _parse_jpeg(stripped)
    assert _psnr(img, rotated) < 20


def _jpeg_rgb_stored(rgb):
    """Adobe transform=0 variant: channels stored as-is + APP14."""
    import struct

    base = _jpeg(rgb)
    # re-encode with identity 'YCbCr': easiest correct construction is
    # to feed channels that make the encoder's YCbCr equal the RGB we
    # want stored... instead, build it directly: reuse _jpeg on an
    # image whose YCbCr equals rgb. Invert the BT.601 full-range
    # transform.
    r = np.asarray(rgb, dtype=np.float64)
    y, cb, cr = r[:, :, 0], r[:, :, 1] - 128.0, r[:, :, 2] - 128.0
    inv_r = y + 1.402 * cr
    inv_g = y - 0.344136 * cb - 0.714136 * cr
    inv_b = y + 1.772 * cb
    pre = np.stack([inv_r, inv_g, inv_b], axis=2)
    if pre.min() < 0 or pre.max() > 255:
        # keep test inputs inside the invertible range
        raise AssertionError("test image leaves the invertible range")
    p = _jpeg(pre.round().astype(np.uint8))
    app14 = (
        bytes([0xFF, 0xEE])
        + struct.pack(">H", 2 + 12)
        + b"Adobe"
        + bytes([0x65, 0, 0, 0, 0, 0])
        + bytes([0])  # transform = 0: stored as-is
    )
    sof = _find_marker(p, 0xC0)
    return p[:sof] + app14 + p[sof:]


def test_malformed_dht_and_sos_are_valueerror():
    """Review r14 #4: short DHT/SOF/SOS segments raise ValueError per
    the contract, never IndexError."""
    import struct

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    bad_dht = (
        b"\xff\xd8"
        + chunk(0xC4, bytes(10))  # counts cut short
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="truncated DHT"):
        _parse_jpeg(bad_dht)
    with pytest.raises(ValueError, match="truncated SOF"):
        _parse_jpeg(b"\xff\xd8" + chunk(0xC0, b"\x08\x00") + b"\xff\xd9")
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="truncated SOS"):
        _parse_jpeg(
            b"\xff\xd8" + chunk(0xC0, sof) + chunk(0xDA, b"") + b"\xff\xd9"
        )


def _test_image(h=24, w=40):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xs * 5) % 256, (ys * 7) % 256, ((xs + ys) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_progressive_equals_baseline_exactly():
    """r15: a progressive stream carrying the SAME coefficients as a
    baseline stream must decode to IDENTICAL pixels — encoder written
    from T.81 G.1.2 independently of the decoder. Variants cover
    spectral band splits, grayscale, DC successive approximation
    (first scan at Al=1 + raw-bit refinement), restart intervals with
    EOB-run flushing, and a full-band single AC scan."""
    img = _test_image()
    base = _parse_jpeg(_jpeg(img))
    for kwargs in (
        {},
        {"bands": ((1, 1), (2, 8), (9, 63))},
        {"bands": ((1, 63),)},
        {"dc_al": 1},
        {"dc_al": 1, "bands": ((1, 2), (3, 63))},
        {"restart_interval": 3},
        {"dc_al": 1, "restart_interval": 2},
    ):
        prog = _parse_jpeg(_prog_jpeg(img, **kwargs))
        assert prog[:2] == base[:2]
        assert np.array_equal(prog[2], base[2]), kwargs
    gray_base = _parse_jpeg(_jpeg(img, gray=True))
    for kwargs in ({"gray": True}, {"gray": True, "dc_al": 1}):
        prog = _parse_jpeg(_prog_jpeg(img, **kwargs))
        assert np.array_equal(prog[2], gray_base[2]), kwargs
    # odd dimensions: partial edge blocks through the padded grid
    tiny = (np.arange(5 * 9 * 3, dtype=np.uint8) % 251).reshape(5, 9, 3)
    assert np.array_equal(
        _parse_jpeg(_prog_jpeg(tiny, dc_al=1))[2],
        _parse_jpeg(_jpeg(tiny))[2],
    )


def test_sequential_multiscan_equals_interleaved():
    """r15: one-scan-per-component sequential streams (previously
    UnsupportedJpegError) decode identically to the interleaved
    single-scan stream built from the same coefficients."""
    img = _test_image()
    assert np.array_equal(
        _parse_jpeg(_seq_multiscan_jpeg(img))[2],
        _parse_jpeg(_jpeg(img))[2],
    )
    assert np.array_equal(
        _parse_jpeg(_seq_multiscan_jpeg(img, gray=True))[2],
        _parse_jpeg(_jpeg(img, gray=True))[2],
    )


def _scan_prefixes(data):
    """Offsets just past each scan's entropy data (marker-walk on the
    test side: SOS -> skip entropy to the next non-RST marker)."""
    ends = []
    pos = 2
    while pos + 4 <= len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
        if marker == 0xDA:
            p = pos + 2 + seglen
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            ends.append(p)
            pos = p
        else:
            pos += 2 + seglen
    return ends


def test_progressive_real_fixture_refinement_convergence():
    """The real progressive photo (10 scans: DC-first Al=1, AC firsts
    at Al>=1, AC refinements Ah=2/1, DC refinement): every truncated
    prefix must decode (progressive's defining property), later
    prefixes must approximate the full image monotonically better, and
    the last prefix is the full image."""
    if not os.path.exists(_REAL["progressive"]):
        pytest.skip("container image data files not present")
    data = open(_REAL["progressive"], "rb").read()
    ends = _scan_prefixes(data)
    assert len(ends) == 10  # the fixture's full scan script
    _w, _h, full = _parse_jpeg(data)
    errs = []
    for cut in (ends[0], ends[4], ends[-1]):  # DC only / mid / all
        w, h, rgb = _parse_jpeg(data[:cut] + b"\xff\xd9")
        assert (w, h) == (720, 477)
        errs.append(
            float(np.abs(rgb.astype(np.float64) - full).mean())
        )
    assert errs[0] > errs[1] > errs[2] == 0.0
    assert errs[1] < 10.0  # mid-script is already a close approximation


def test_dnl_deferred_height_is_unsupported_not_malformed():
    """ADVICE r14: SOF height 0 with the line count deferred to a DNL
    marker is VALID T.81 (B.2.2) — it must raise UnsupportedJpegError
    (dispatch converts it to the install-pillow remedy), never plain
    ValueError ("malformed"); width 0 stays malformed."""
    import struct

    from tower_parse_spark.operators.jpeg import parse_dimensions

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sof(w, h):
        return chunk(
            0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        )

    dnl = b"\xff\xd8" + sof(8, 0) + b"\xff\xd9"
    zero_w = b"\xff\xd8" + sof(0, 8) + b"\xff\xd9"
    for fn in (_parse_jpeg, parse_dimensions):
        with pytest.raises(UnsupportedJpegError, match="DNL"):
            fn(dnl)
        with pytest.raises(ValueError, match="bad JPEG dimensions") as exc:
            fn(zero_w)
        assert type(exc.value) is ValueError  # malformed, not unsupported


def test_nondivisible_sampling_is_unsupported_not_malformed():
    """Review r14 #6: H/V up to 4 are legal; non-divisible combinations
    (3-vs-2) need fractional upsampling we don't do — that is
    UNSUPPORTED (pillow-remediable), not malformed."""
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    p = bytearray(_jpeg(img))
    sof = _find_marker(bytes(p), 0xC0)
    p[sof + 4 + 7] = 0x31          # comp 1: 3x1
    p[sof + 4 + 10] = 0x21         # comp 2: 2x1 -> 3 % 2 != 0
    with pytest.raises(UnsupportedJpegError, match="non-divisible"):
        _parse_jpeg(bytes(p))
    # factor 5 is outright invalid per spec -> malformed
    p[sof + 4 + 7] = 0x51
    with pytest.raises(ValueError, match="sampling"):
        _parse_jpeg(bytes(p))


def test_decode_jpeg_metadata_is_header_only():
    """Review r14 #5: metadata dims come from the SOF walk; a stream
    whose SCAN data is garbage still yields metadata (like any header
    decoder), while phash_real's full decode correctly rejects it."""
    img = np.full((8, 16, 3), 50, dtype=np.uint8)
    p = _jpeg(img)
    sos = _find_marker(p, 0xDA)
    seglen = int.from_bytes(p[sos + 2:sos + 4], "big")
    corrupted = p[: sos + 2 + seglen] + b"\x00\x01" + b"\xff\xd9"
    meta = M.decode_jpeg(corrupted)
    assert (meta["width"], meta["height"]) == (16, 8)
    with pytest.raises(ValueError):
        _parse_jpeg(corrupted)


def test_jpeg_roundtrip_property():
    """Property: decode(encode(img)) stays within quantization loss for
    arbitrary sizes, content, grayscale, and restart intervals —
    encoder and decoder are independent readings of T.81, so agreement
    across the randomized space pins both (the PNG property test's
    lossy sibling: PSNR floor instead of bit equality)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 25),
        h=st.integers(1, 19),
        seed=st.integers(0, 2**31 - 1),
        gray=st.booleans(),
        rst=st.sampled_from([0, 1, 3]),
        smooth=st.booleans(),
    )
    def check(w, h, seed, gray, rst, smooth):
        rng = np.random.RandomState(seed)
        if smooth:
            base = rng.randint(30, 220)
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            img = np.stack(
                [base + xs, base + ys, base + xs + ys], axis=2
            ).clip(0, 255).astype(np.uint8)
        else:
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        gw, gh, got = _parse_jpeg(_jpeg(img, gray=gray, restart_interval=rst))
        assert (gw, gh) == (w, h) and got.shape == (h, w, 3)
        ref = img
        if gray:
            yy = (
                0.299 * img[:, :, 0]
                + 0.587 * img[:, :, 1]
                + 0.114 * img[:, :, 2]
            )
            ref = np.repeat(
                yy.round().clip(0, 255).astype(np.uint8)[:, :, None], 3, 2
            )
        # flat-16/24 quant tables: smooth content round-trips tightly,
        # random noise bounded by the quantizer's worst case
        assert _psnr(ref, got) > (28 if smooth else 20)

    check()


def test_fill_byte_edge_cases_from_review():
    """Review r14 round 2 (both reproduced before the fix): a payload
    that is all fill bytes after SOI must raise ValueError (not
    IndexError), through BOTH walks; and fill bytes before an RSTn
    marker inside the entropy stream are legal and must decode
    identically."""
    from tower_parse_spark.operators.jpeg import parse_dimensions

    for fn in (_parse_jpeg, parse_dimensions):
        with pytest.raises(ValueError, match="truncated|fill"):
            fn(b"\xff\xd8" + b"\xff" * 4)
    # fill byte before the first restart marker
    xs, ys = np.meshgrid(np.arange(16), np.arange(24))
    img = np.stack([xs * 9, ys * 7, xs + ys], axis=2).clip(0, 255).astype(
        np.uint8
    )
    p = _jpeg(img, restart_interval=2)
    _, _, want = _parse_jpeg(p)
    rst_at = p.index(b"\xff\xd0")
    stuffed = p[:rst_at] + b"\xff" + p[rst_at:]
    gw, gh, got = _parse_jpeg(stuffed)
    assert (gw, gh) == (16, 24) and (got == want).all()
