"""Hermetic JPEG decoder — public spec (ITU-T T.81), stdlib + numpy
only.

Completes the multimodal real-decode family (PPM r13, PNG r14): with
this, ``decode_real`` / ``phash_real`` handle the three dominant
interchange formats with NO optional dependency, and the Pillow gate
shrinks to arithmetic-coded/lossless/hierarchical JPEG, WebP and
friends. Scope is huffman DCT — sequential (SOF0; SOF1's
extended-sequential decodes identically at 8-bit), and as of r15
PROGRESSIVE (SOF2: spectral selection, successive approximation with
DC/AC refinement scans per T.81 G.1.2, EOB-run coding) plus
multi-scan sequential streams: huffman entropy decoding with byte
un-stuffing and restart markers, dequantization, zigzag, float IDCT,
chroma upsampling for any sampling factors (4:4:4 / 4:2:0 / 4:2:2 /
...), JFIF full-range BT.601 YCbCr->RGB, grayscale replication.
Valid-but-unsupported streams (arithmetic coding, 12-bit precision,
lossless, hierarchical, DNL-deferred height) raise
:class:`UnsupportedJpegError` so the multimodal dispatch can name
Pillow as the remedy, exactly the PNG contract.

Like the PNG path, this is the hermetic correctness reference, not a
throughput engine: the entropy decode is a per-symbol Python loop
(the IDCT and color transform are vectorized numpy). An installed
Pillow takes over decode speed-wise; pixels may differ from Pillow's
by IDCT/upsampling rounding (JPEG decoders are not bit-specified).
What the tests pin: round-trip fidelity against an independent
spec-derived encoder (PSNR floors; dHash bit-identity through the
round-trip on smooth content), EXACT pixel equality between baseline
and progressive streams built from the same coefficients by an
independent spec-derived progressive encoder (band splits, DC
successive approximation, restart/EOB-run interaction), clean
full-stream decode of real encoder output shipped in this container
(grayscale, 4:2:0, a 100 KB photo with restart markers, and a
260 KB ten-scan progressive photo whose truncated prefixes must
converge monotonically — the property that defines progressive), and
the Unsupported/malformed error contract."""

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
    """Canonical JPEG huffman table as a flat 16-bit-window LUT: every
    code of length L fills the 2^(16-L) window slots it prefixes, so a
    symbol decodes with ONE list index instead of a bit-by-bit dict
    probe (r15 — the entropy loop is the decoder's CPU bill, SCALE.md).
    Built with numpy slice fills, read as Python lists (scalar list
    indexing beats scalar ndarray indexing ~3x in the per-symbol
    loop)."""

    def __init__(self, counts, symbols):
        import numpy as np

        lut_sym = np.zeros(1 << 16, dtype=np.uint8)
        lut_len = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                start = code << (16 - length)
                if start >= (1 << 16):
                    raise ValueError("bad JPEG huffman table (code overflow)")
                span = 1 << (16 - length)
                lut_sym[start:start + span] = symbols[k]
                lut_len[start:start + span] = length
                code += 1
                k += 1
            code <<= 1
        self.sym = lut_sym.tolist()
        self.len = lut_len.tolist()


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
        # consumed bits above nbits are masked off here: letting them
        # accumulate turns buf into a stream-sized bigint whose every
        # shift costs O(stream) — the whole decode went quadratic
        # (measured 1.8x on the 100 KB photo from this mask alone, r15)
        d = self.data
        pos, nbits = self.pos, self.nbits
        buf = self.buf & ((1 << nbits) - 1)
        while nbits <= 24:
            if pos >= len(d):
                break
            b = d[pos]
            if b == 0xFF:
                nxt = d[pos + 1] if pos + 1 < len(d) else None
                if nxt == 0x00:
                    pos += 2  # stuffed literal 0xFF
                elif nxt == 0xFF:
                    # FILL byte before a marker (T.81 B.1.1.2) — legal
                    # in the entropy stream too, e.g. before an RSTn
                    pos += 1
                    continue
                elif nxt is None:
                    break
                else:
                    self.marker = nxt  # scan ends here (RST or EOI/..)
                    break
            else:
                pos += 1
            buf = (buf << 8) | b
            nbits += 8
        self.pos, self.buf, self.nbits = pos, buf, nbits
        return nbits > 0

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                raise ValueError("JPEG entropy stream truncated")
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def decode(self, table: _HuffTable) -> int:
        # one 16-bit-window LUT probe; short windows at stream end are
        # padded with 1s (the spec's pad bit), which can only resolve
        # to a code LONGER than the remaining bits when the stream is
        # truncated mid-code — a real final code is a prefix of the
        # window and resolves to its own length
        if self.nbits < 16:
            self._fill()
        n = self.nbits
        if n >= 16:
            idx = (self.buf >> (n - 16)) & 0xFFFF
        elif n > 0:
            idx = ((self.buf << (16 - n)) & 0xFFFF) | ((1 << (16 - n)) - 1)
        else:
            raise ValueError("JPEG entropy stream truncated")
        length = table.len[idx]
        if length == 0:
            raise ValueError("invalid JPEG huffman code")
        if length > n:
            raise ValueError("JPEG entropy stream truncated")
        self.nbits = n - length
        return table.sym[idx]

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


def _segments(payload: bytes, start: "int | None" = None):
    """Yield ``(marker, seg, next_pos)`` for every marker segment in
    the header stream — the ONE marker walk both :func:`_parse_jpeg`
    and :func:`parse_dimensions` consume (review r14: two hand-rolled
    copies had already diverged and shared an out-of-bounds bug on
    fill-byte tails). Handles the SOI check, any number of 0xFF fill
    bytes before a marker (T.81 B.1.1.2) with bounds-safe termination,
    stray SOI, EOI, and segment-length validation. Standalone restart
    markers are illegal outside a scan and read as malformed.

    *start* (r15, progressive): resume the walk at a known marker
    offset — the multi-scan driver re-enters here after each scan's
    entropy data (whose end only the entropy decoder can find), so
    between-scan DHT/DRI segments flow through the same validated
    walk instead of a second hand-rolled copy."""
    if start is None:
        if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload (no SOI)")
        pos = 2
    else:
        pos = start
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


#: SOF markers outside the huffman DCT subset we decode (SOF0/1
#: sequential, SOF2 progressive as of r15): lossless (C3/C7/CB/CF),
#: differential (C5/C6/CD/CE), arithmetic-coded (C9/CA/CD/CE/CF)
_SOF_UNSUPPORTED = (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                    0xCB, 0xCD, 0xCE, 0xCF)


def _parse_sos(seg, frame):
    """Validated scan header: ``(scan, ss, se, ah, al)`` where scan is
    ``[(component, dc_table_id, ac_table_id), ...]`` and ss/se/ah/al
    are the spectral-selection and successive-approximation fields
    (always present in the SOS; sequential scans carry 0/63/0/0)."""
    if not seg:
        raise ValueError("truncated SOS")
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated SOS")
    scan = []
    for i in range(ns):
        cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        comp = next((c for c in frame[2] if c["id"] == cid), None)
        if comp is None:
            raise ValueError("JPEG scan references unknown component")
        scan.append((comp, tt >> 4, tt & 15))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahl = seg[3 + 2 * ns]
    return scan, ss, se, ahl >> 4, ahl & 15


def _parse_jpeg(payload: bytes):
    """Decode a sequential (SOF0/1) or progressive (SOF2) huffman JPEG
    to ``(width, height, HxWx3 uint8 RGB)``. Raises ValueError on
    malformed streams, UnsupportedJpegError on valid-but-out-of-scope
    ones (see module docstring).

    Single-scan sequential streams take the direct per-block path
    (:func:`_decode_scan`, coefficients straight to pixels). Everything
    else — progressive scan scripts and multi-scan sequential — runs
    the coefficient-buffer path: each scan deposits into per-component
    DCT-coefficient grids (:func:`_decode_scan_coef`), the marker walk
    resumes after each scan's entropy data (between-scan DHT/DRI
    segments go through the same `_segments` walk), and one vectorized
    dequantize+IDCT pass renders the final image (:func:`_coef_to_rgb`)."""
    import numpy as np

    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, components)
    progressive = False
    restart_interval = 0
    adobe_transform = None  # APP14 color-transform flag, when present
    coef = None  # per-component coefficient grids (multi-scan path)
    pos: "int | None" = None  # marker-walk resume offset
    while True:
        resume_at = None
        for marker, seg, next_pos in _segments(payload, pos):
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
            elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 sequential huffman
                frame = _parse_sof(seg)
            elif marker == 0xC2:  # SOF2 progressive huffman (r15)
                frame = _parse_sof(seg)
                progressive = True
            elif marker in _SOF_UNSUPPORTED:
                raise UnsupportedJpegError(
                    f"non-baseline JPEG (SOF marker {marker:#x}: "
                    "arithmetic/lossless/hierarchical)"
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
                scan, ss, se, ah, al = _parse_sos(seg, frame)
                if (
                    not progressive
                    and coef is None
                    and len(scan) == len(frame[2])
                ):
                    # single-scan sequential: straight to pixels
                    return _decode_scan(
                        payload, next_pos, frame, scan, qt,
                        huff_dc, huff_ac, restart_interval,
                        rgb_stored=_is_rgb_stored(frame[2], adobe_transform),
                    )
                if coef is None:
                    coef = _init_coef(frame)
                resume_at = _decode_scan_coef(
                    payload, next_pos, frame, scan, coef,
                    huff_dc, huff_ac, restart_interval,
                    progressive, ss, se, ah, al,
                )
                break
            # APPn / COM / others: skip
        if resume_at is None:
            break
        pos = resume_at
    if coef is None:
        raise ValueError("JPEG has no scan data (missing SOS)")
    return _coef_to_rgb(
        frame, coef, qt,
        rgb_stored=_is_rgb_stored(frame[2], adobe_transform),
    )


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
        if marker in (0xC0, 0xC1, 0xC2):
            w, h, _comps = _parse_sof(seg)
            return w, h
        if marker in _SOF_UNSUPPORTED:
            raise UnsupportedJpegError(
                f"non-baseline JPEG (SOF marker {marker:#x}: "
                "arithmetic/lossless/hierarchical)"
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
    return _planes_to_rgb(planes, comps, w, h, hmax, vmax, rgb_stored)


def _planes_to_rgb(planes, comps, w, h, hmax, vmax, rgb_stored):
    """Shared pixel rendering for both decode paths: upsample
    subsampled chroma by integer repeat, crop the block-grid padding,
    replicate grayscale or apply the BT.601 / stored-RGB transform.
    A single plane is grayscale regardless of its sampling factors
    (the baseline non-interleaved path keeps the component's own
    grid, which needs no upsampling)."""
    import numpy as np

    if len(planes) == 1:
        ych = np.clip(planes[0][:h, :w], 0, 255)
        rgb = np.repeat(ych[:, :, None], 3, axis=2)
        return w, h, rgb.round().astype(np.uint8)
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out.append(p[:h, :w])
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


def _sampling_geometry(frame):
    """(hmax, vmax, mcux, mcuy) with the same sampling validation the
    direct path applies — the coefficient-buffer path bypasses
    :func:`_decode_scan` and must reject bad factors itself."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) for c in comps):
        raise ValueError("bad JPEG sampling factors")
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        raise UnsupportedJpegError("JPEG with non-divisible sampling factors")
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _init_coef(frame):
    """Per-component DCT-coefficient grids in NATURAL (de-zigzagged)
    order, shaped ``(block_rows, block_cols, 64)`` over the full
    interleaved-MCU-padded extent — progressive scans deposit into
    these across the whole scan script, and multi-scan sequential
    reuses the same store."""
    import numpy as np

    hmax, vmax, mcux, mcuy = _sampling_geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame[2]
    ]


def _decode_scan_coef(
    payload, pos, frame, scan, coef, huff_dc, huff_ac,
    restart_interval, progressive, ss, se, ah, al,
):
    """Decode ONE scan's entropy data into the coefficient store and
    return the offset of the next marker segment (the caller resumes
    the marker walk there). Covers all four progressive scan kinds per
    T.81 G.1.2 — DC first (diff << Al), DC refinement (one raw bit per
    block), AC first (EOB-run coded spectral band), AC refinement (the
    correction-bit algorithm) — plus full-spectrum sequential scans
    (multi-scan SOF0/1, previously UnsupportedJpegError)."""
    import numpy as np  # noqa: F401  (dtype promotion on views)

    w, h, comps = frame
    hmax, vmax, f_mcux, f_mcuy = _sampling_geometry(frame)
    if progressive:
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            if ah == 0 and any(td not in huff_dc for _c, td, _ta in scan):
                raise ValueError("JPEG scan references missing huffman table")
        else:
            if len(scan) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component"
                )
            if not (ss <= se <= 63):
                raise ValueError("bad JPEG spectral selection")
            if any(ta not in huff_ac for _c, _td, ta in scan):
                raise ValueError("JPEG scan references missing huffman table")
        if ah and ah != al + 1:
            raise ValueError("bad JPEG successive approximation")
    else:
        # sequential multi-scan: every scan is full-spectrum
        ss, se, ah, al = 0, 63, 0, 0
        for _c, td, ta in scan:
            if td not in huff_dc or ta not in huff_ac:
                raise ValueError("JPEG scan references missing huffman table")
    # T.81 A.2: ns==1 -> non-interleaved over the component's own grid
    non_interleaved = len(scan) == 1
    if non_interleaved:
        comp0 = scan[0][0]
        cw = -(-w * comp0["h"] // hmax)
        ch = -(-h * comp0["v"] // vmax)
        mcux, mcuy = -(-cw // 8), -(-ch // 8)
    else:
        mcux, mcuy = f_mcux, f_mcuy
    scan_blocks = [
        [(0, 0)]
        if non_interleaved
        else [(by, bx) for by in range(c["v"]) for bx in range(c["h"])]
        for c, _td, _ta in scan
    ]
    comp_of = [comps.index(c) for c, _td, _ta in scan]
    reader = _BitReader(payload, pos)
    pred = [0] * len(scan)
    eobrun = 0
    rst_count = 0
    p1, m1 = 1 << al, -1 << al
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.align_and_expect_rst(rst_count)
            rst_count += 1
            pred = [0] * len(scan)
            eobrun = 0
        my, mx = divmod(mcu, mcux)
        for si, (comp, td, ta) in enumerate(scan):
            for by, bx in scan_blocks[si]:
                if non_interleaved:
                    brow, bcol = my, mx
                else:
                    brow = my * comp["v"] + by
                    bcol = mx * comp["h"] + bx
                blk = coef[comp_of[si]][brow, bcol]
                if not progressive:
                    _block_full(reader, blk, huff_dc[td], huff_ac[ta],
                                pred, si)
                elif ss == 0 and ah == 0:  # DC first
                    s = reader.decode(huff_dc[td])
                    if s > 11:
                        raise ValueError("invalid JPEG DC category")
                    diff = _extend(reader.receive(s), s) if s else 0
                    pred[si] += diff
                    blk[0] = pred[si] << al
                elif ss == 0:  # DC refinement: one raw bit per block
                    if reader.read_bit():
                        blk[0] |= p1
                elif ah == 0:  # AC first (EOB-run coded band)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode(huff_ac[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC run past band end")
                        blk[k] = _extend(reader.receive(s), s) * p1
                        k += 1
                else:  # AC refinement (T.81 G.1.2.3 correction bits)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = reader.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                val = 0  # ZRL: pass 16 zero-history coefs
                            elif s == 1:
                                val = p1 if reader.read_bit() else m1
                            else:
                                raise ValueError(
                                    "bad JPEG AC refinement symbol"
                                )
                            while k <= se:
                                cv = int(blk[k])
                                if cv:
                                    if reader.read_bit() and not (cv & p1):
                                        blk[k] = cv + (p1 if cv >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if s and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun:
                        # EOB band tail: correction bits for every
                        # remaining already-nonzero coefficient
                        while k <= se:
                            cv = int(blk[k])
                            if cv and reader.read_bit() and not (cv & p1):
                                blk[k] = cv + (p1 if cv >= 0 else m1)
                            k += 1
                        eobrun -= 1
    return _scan_end(payload, reader)


def _block_full(reader, blk, dc_table, ac_table, pred, si):
    """One full-spectrum sequential block into the coefficient store —
    the multi-scan SOF0/1 form of the direct path's block loop."""
    s = reader.decode(dc_table)
    if s > 11:
        raise ValueError("invalid JPEG DC category")
    diff = _extend(reader.receive(s), s) if s else 0
    pred[si] += diff
    blk[0] = pred[si]
    k = 1
    while k < 64:
        rs = reader.decode(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        blk[k] = _extend(reader.receive(s), s)
        k += 1


def _scan_end(payload, reader):
    """Offset of the next marker after a scan's entropy data. The
    BitReader only ever buffers whole entropy bytes (a marker stops
    its fill), so the next 0xFF-marker sits at or after ``reader.pos``;
    pad bits / stuffed bytes before it are skipped, and a stray RSTn at
    the scan boundary is consumed rather than read as a standalone
    marker (some encoders emit the final restart)."""
    d = payload
    p = reader.pos
    while p + 1 < len(d):
        if d[p] != 0xFF:
            p += 1
            continue
        nxt = d[p + 1]
        if nxt == 0x00:
            p += 2
        elif nxt == 0xFF:
            p += 1
        elif 0xD0 <= nxt <= 0xD7:
            p += 2
        else:
            return p
    raise ValueError("JPEG truncated after scan data")


def _coef_to_rgb(frame, coef, qt, rgb_stored):
    """Dequantize + de-zigzag + IDCT the coefficient store in ONE
    vectorized numpy pass per component, then render through the
    shared :func:`_planes_to_rgb` tail. (The multi-scan path is
    MORE vectorized than the direct one: the per-block Python work
    already happened scan-side, so the whole grid IDCTs as a single
    einsum.)"""
    import numpy as np

    w, h, comps = frame
    hmax, vmax, _mcux, _mcuy = _sampling_geometry(frame)
    m = _idct_matrix()
    zz = np.array(_ZIGZAG)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        a = coef[ci].astype(np.float64) * qt[c["tq"]]  # zigzag order
        nat = np.zeros_like(a)
        nat[:, :, zz] = a  # natural[zz[i]] = zigzag[i]
        bh, bw = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ui,yxuv,vj->yxij", m, blocks, m) + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _planes_to_rgb(planes, comps, w, h, hmax, vmax, rgb_stored)
