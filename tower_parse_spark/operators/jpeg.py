"""Hermetic baseline-JPEG decoder — public spec (ITU-T T.81), stdlib +
numpy only.

Completes the multimodal real-decode family (PPM r13, PNG r14): with
this, ``decode_real`` / ``phash_real`` handle the three dominant
interchange formats with NO optional dependency, and the Pillow gate
shrinks to progressive/arithmetic JPEG, WebP and friends. Scope is
baseline sequential DCT (SOF0; SOF1's extended-sequential huffman
decodes identically at 8-bit): huffman entropy decoding with byte
un-stuffing and restart markers, dequantization, zigzag, float IDCT,
chroma upsampling for any sampling factors (4:4:4 / 4:2:0 / 4:2:2 /
...), JFIF full-range BT.601 YCbCr->RGB, grayscale replication.
Valid-but-unsupported streams (progressive SOF2, arithmetic coding,
12-bit precision, hierarchical) raise :class:`UnsupportedJpegError`
so the multimodal dispatch can name Pillow as the remedy, exactly the
PNG contract.

Like the PNG path, this is the hermetic correctness reference, not a
throughput engine: the entropy decode is a per-symbol Python loop
(the IDCT and color transform are vectorized numpy). An installed
Pillow takes over decode speed-wise; pixels may differ from Pillow's
by IDCT/upsampling rounding (JPEG decoders are not bit-specified).
What the tests pin: round-trip fidelity against an independent
spec-derived encoder (PSNR floors; dHash bit-identity through the
round-trip on smooth content), clean full-stream decode of real
encoder output shipped in this container (grayscale, 4:2:0, and a
100 KB photo with restart markers), and the Unsupported/malformed
error contract."""

from __future__ import annotations


class UnsupportedJpegError(ValueError):
    """A VALID JPEG using features outside the baseline subset
    (progressive, arithmetic coding, 12-bit, hierarchical). Distinct
    from plain ValueError (malformed payload) so the Pillow-gated
    dispatch can name the optional dependency as the remedy."""


#: zigzag scan order: index i of the scan -> (row, col) flattened index
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import math

    import numpy as np

    m = np.empty((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _HuffTable:
    """Canonical JPEG huffman table: decode one symbol by reading bits
    MSB-first, extending the code until it matches (max 16 bits, per
    spec)."""

    def __init__(self, counts, symbols):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 byte stuffing and stopping at (reporting) restart/other
    markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffing 0xFF marker is hit

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed literal 0xFF
                elif nxt == 0xFF:
                    # FILL byte before a marker (T.81 B.1.1.2) — legal
                    # in the entropy stream too, e.g. before an RSTn
                    self.pos += 1
                    continue
                elif nxt is None:
                    return self.nbits > 0
                else:
                    self.marker = nxt  # scan ends here (RST or EOI/..)
                    return self.nbits > 0
            else:
                self.pos += 1
                b = d[self.pos - 1]
            self.buf = (self.buf << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        if self.nbits == 0:
            raise ValueError("JPEG entropy stream truncated")
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align, consume the expected RSTn marker (cheap spec
        interpretation: discard buffered bits, marker must be next)."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet seen: it must be at the current byte pos,
            # possibly behind fill bytes
            d = self.data
            while (
                self.pos + 1 < len(d)
                and d[self.pos] == 0xFF
                and d[self.pos + 1] == 0xFF
            ):
                self.pos += 1
            if self.pos + 1 < len(d) and d[self.pos] == 0xFF:
                self.marker = d[self.pos + 1]
            else:
                raise ValueError("expected JPEG restart marker")
        if self.marker != 0xD0 + (n % 8):
            raise ValueError(
                f"JPEG restart marker out of sequence: "
                f"got {self.marker:#x}, want {0xD0 + (n % 8):#x}"
            )
        self.pos += 2  # consume FF Dn
        self.marker = None


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _segments(payload: bytes):
    """Yield ``(marker, seg, next_pos)`` for every marker segment in
    the header stream — the ONE marker walk both :func:`_parse_jpeg`
    and :func:`parse_dimensions` consume (review r14: two hand-rolled
    copies had already diverged and shared an out-of-bounds bug on
    fill-byte tails). Handles the SOI check, any number of 0xFF fill
    bytes before a marker (T.81 B.1.1.2) with bounds-safe termination,
    stray SOI, EOI, and segment-length validation. Standalone restart
    markers are illegal outside a scan and read as malformed."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (fill bytes at EOF)")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            return
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            raise ValueError(
                f"standalone marker {marker:#x} outside a scan"
            )
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + seglen]
        if seglen < 2 or len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        yield marker, seg, pos + 2 + seglen
        pos += 2 + seglen


_SOF_UNSUPPORTED = (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                    0xCB, 0xCD, 0xCE, 0xCF)


def _parse_jpeg(payload: bytes):
    """Decode a baseline JPEG to ``(width, height, HxWx3 uint8 RGB)``.
    Raises ValueError on malformed streams, UnsupportedJpegError on
    valid-but-out-of-scope ones (see module docstring)."""
    import numpy as np

    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, components)
    restart_interval = 0
    adobe_transform = None  # APP14 color-transform flag, when present
    for marker, seg, next_pos in _segments(payload):
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise UnsupportedJpegError("16-bit JPEG quant table")
                if p + 65 > len(seg):
                    raise ValueError("truncated DQT")
                qt[tq] = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8
                ).astype(np.float64)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 baseline huffman
            frame = _parse_sof(seg)
        elif marker in _SOF_UNSUPPORTED:
            raise UnsupportedJpegError(
                f"non-baseline JPEG (SOF marker {marker:#x}: progressive/"
                "arithmetic/hierarchical)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("truncated DHT")
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17:p + 17 + n])
                if len(symbols) != n:
                    raise ValueError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols
                )
                p += 17 + n
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI")
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: transform 0 = components are stored as-is (RGB
            # for a 3-component frame), 1 = YCbCr (review r14: without
            # this, Adobe-RGB baselines get color-rotated and hash
            # differently than a Pillow decode of the same bytes)
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not seg:
                raise ValueError("truncated SOS")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS")
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame[2] if c["id"] == cid), None
                )
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((comp, tt >> 4, tt & 15))
            if len(scan) != len(frame[2]):
                raise UnsupportedJpegError("multi-scan JPEG")
            return _decode_scan(
                payload, next_pos, frame, scan, qt,
                huff_dc, huff_ac, restart_interval,
                rgb_stored=_is_rgb_stored(frame[2], adobe_transform),
            )
        # APPn / COM / others: skip
    raise ValueError("JPEG has no scan data (missing SOS)")


def _parse_sof(seg):
    """Validated (w, h, components) from a baseline SOF segment."""
    if len(seg) < 6:
        raise ValueError("truncated SOF")
    if seg[0] != 8:
        raise UnsupportedJpegError(f"JPEG precision {seg[0]} (8-bit only)")
    h = int.from_bytes(seg[1:3], "big")
    w = int.from_bytes(seg[3:5], "big")
    nf = seg[5]
    if h == 0:
        # T.81 B.2.2: frame height 0 defers the line count to a DNL
        # marker after the first scan — legal, just unimplemented here
        # (ADVICE r14: keep the error-class contract — the dispatch
        # converts UnsupportedJpegError to the install-pillow remedy,
        # not "malformed")
        raise UnsupportedJpegError("DNL-deferred JPEG height (T.81 B.2.2)")
    if w == 0:
        raise ValueError("bad JPEG dimensions")
    if nf not in (1, 3):
        raise UnsupportedJpegError(f"JPEG with {nf} components")
    if len(seg) < 6 + 3 * nf:
        raise ValueError("truncated SOF")
    comps = []
    for i in range(nf):
        cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
        comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
    return (w, h, comps)


def _is_rgb_stored(comps, adobe_transform) -> bool:
    """Three-component frames are YCbCr unless APP14 says transform=0
    or the component ids literally spell 'R','G','B' (both valid
    baseline encodings, T.81 + Adobe TN 5116)."""
    if len(comps) != 3:
        return False
    if adobe_transform == 0:
        return True
    if adobe_transform in (1, 2):
        return False
    return [c["id"] for c in comps] == [0x52, 0x47, 0x42]  # 'R','G','B'


def parse_dimensions(payload: bytes) -> "tuple[int, int]":
    """(width, height) from the SOF header alone — no entropy decode.
    The metadata path (decode_jpeg) uses this: a megapixel image's
    dimensions cost a marker walk, not a full per-symbol Python decode
    (review r14). Raises the same ValueError / UnsupportedJpegError
    contract as :func:`_parse_jpeg` for the header portion."""
    for marker, seg, _next_pos in _segments(payload):
        if marker in (0xC0, 0xC1):
            w, h, _comps = _parse_sof(seg)
            return w, h
        if marker in _SOF_UNSUPPORTED:
            raise UnsupportedJpegError(
                f"non-baseline JPEG (SOF marker {marker:#x}: progressive/"
                "arithmetic/hierarchical)"
            )
        if marker == 0xDA:
            break
    raise ValueError("JPEG has no frame header (missing SOF)")


def _decode_scan(
    payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval,
    rgb_stored=False,
):
    import numpy as np

    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(
        not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) for c in comps
    ):
        raise ValueError("bad JPEG sampling factors")
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        # legal per spec but needs fractional upsampling (e.g. 3-vs-2)
        raise UnsupportedJpegError(
            "JPEG with non-divisible sampling factors"
        )
    # Per T.81 A.2: a SINGLE-component scan is NON-interleaved — one
    # 8x8 data unit per MCU, raster order over that component's OWN
    # (subsampled) dimensions, regardless of its sampling factors
    # (review r14: jpegtran -grayscale keeps the source Y's 2x2
    # factors; the interleaved tiling would desync on such files).
    non_interleaved = len(scan) == 1
    if non_interleaved:
        comp0 = scan[0][0]
        cw = -(-w * comp0["h"] // hmax)
        ch = -(-h * comp0["v"] // vmax)
        mcux = -(-cw // 8)
        mcuy = -(-ch // 8)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
    m = _idct_matrix()
    planes = []
    for c in comps:
        if non_interleaved:
            shape = (mcuy * 8, mcux * 8)
        else:
            shape = (mcuy * c["v"] * 8, mcux * c["h"] * 8)
        planes.append(np.zeros(shape, dtype=np.float64))
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    zz = np.array(_ZIGZAG)
    n_mcu = mcux * mcuy
    rst_count = 0
    # constant per scan component — hoisted out of the MCU loop
    # (review r14: rebuilding the list per MCU is pure waste on an
    # already per-symbol-Python hot path)
    scan_blocks = [
        [(0, 0)]
        if non_interleaved
        else [
            (by, bx)
            for by in range(comp["v"])
            for bx in range(comp["h"])
        ]
        for comp, _td, _ta in scan
    ]
    for comp, td, ta in scan:
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("JPEG scan references missing huffman table")
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.align_and_expect_rst(rst_count)
            rst_count += 1
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            q = qt[comp["tq"]]
            for by, bx in scan_blocks[ci]:
                coefs = np.zeros(64, dtype=np.float64)
                s = reader.decode(huff_dc[td])
                if s > 11:
                    raise ValueError("invalid JPEG DC category")
                diff = _extend(reader.receive(s), s) if s else 0
                pred[ci] += diff
                coefs[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode(huff_ac[ta])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    coefs[k] = _extend(reader.receive(s), s)
                    k += 1
                block = np.zeros(64, dtype=np.float64)
                block[zz] = coefs * q
                spatial = m.T @ block.reshape(8, 8) @ m + 128.0
                if non_interleaved:
                    y0, x0 = my * 8, mx * 8
                else:
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if not non_interleaved and (c["h"] != hmax or c["v"] != vmax):
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out.append(p[:h, :w])
    if len(out) == 1:
        ych = np.clip(out[0], 0, 255)
        rgb = np.repeat(ych[:, :, None], 3, axis=2)
        return w, h, rgb.round().astype(np.uint8)
    if rgb_stored:
        # components ARE R,G,B (Adobe transform=0 / 'RGB' ids): no
        # color rotation — matches what any full decoder produces
        rgb = np.stack(out, axis=2)
        return w, h, np.clip(rgb.round(), 0, 255).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.clip(rgb.round(), 0, 255).astype(np.uint8)
