"""Hermetic GIF decoder — public spec (CompuServe GIF89a, 1990-07-31;
GIF87a is the same wire format minus extensions), stdlib + numpy only.

Part of the multimodal real-decode family (PPM r13, PNG r14, JPEG
r14-r15, BMP r15): ``decode_real`` / ``phash_real`` route
``GIF87a``/``GIF89a``-sniffed payloads here when Pillow is absent.
Scope is the complete still-image format — there is no
valid-but-unsupported GIF subset, so unlike the PNG/JPEG/BMP paths
this module defines no ``Unsupported*`` class: variable-width LSB-first
LZW (clear/EOI codes, the deferred-clear rule where a full 4096-entry
table keeps emitting 12-bit codes until the encoder sends CLEAR),
global and local color tables, the 4-pass row interlace, extension
blocks (skipped via their self-describing sub-block chains), and full
GIF89a animation compositing (:func:`_parse_gif_frames` — Graphic
Control transparency over the live canvas, disposal methods
none/leave/restore-background/restore-previous, per-frame delays),
with :func:`_parse_gif` returning frame 1 — the still that
thumbnailers and Pillow's ``seek(0)`` show.
Malformed payloads (bad magic, missing color table, truncated or
over-wide LZW codes, pixel indexes past the palette) raise plain
ValueError.

Tests (tests/test_gif.py) pin round-trips against an independent
spec-derived LZW encoder (including a degenerate clear-before-every-
literal encoder whose streams never grow the table — valid GIF by
construction), interlace, local-palette and table-growth cases, a
hand-assembled byte-level fixture, cross-format dHash identity with
PPM/BMP via the shared ``_dhash_rgb`` kernel, and the malformed-payload
contract.
"""

from __future__ import annotations

import struct

#: 4-pass interlace: (first row, row step) per pass, GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int):
    """GIF-flavor LZW -> list of palette indexes (length n_pixels).

    Codes are packed LSB-first; width starts at min_code_size+1 and
    grows AFTER the table fills the current width, capping at 12 bits
    (a full table keeps the stream at 12-bit codes until a CLEAR —
    the deferred-clear rule)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return [(i,) for i in range(clear)] + [None, None], min_code_size + 1

    table, width = reset()
    out: list = []
    prev = None
    acc = bits = pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while bits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            raise ValueError("GIF LZW ended before the raster was full")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError("GIF LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return out[:n_pixels]


def _sub_blocks(payload: bytes, pos: int):
    """Concatenate a self-describing sub-block chain; returns
    ``(bytes, position after the 0 terminator)``."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        parts.append(payload[pos : pos + size])
        pos += size


def _parse_gif_frames(payload: bytes, max_frames: int = 256):
    """Full animation decode with GIF89a compositing: returns
    ``(logical screen width, logical screen height, [HxWx3 uint8 RGB
    frames], [delays in centiseconds])``. Each frame is the COMPOSITED
    canvas after its image is drawn — Graphic Control transparency
    leaves the underlying canvas visible, and disposal methods apply
    between frames (1/none = leave, 2 = restore the frame rect to the
    background color, 3 = restore the canvas to its pre-frame state).
    The canvas starts as the background color (global-table entry of
    the screen descriptor's background index, entry 0 when out of
    range). Decoding stops at the trailer, end of payload, or
    ``max_frames`` — the bounded-work rule every decoder here
    follows."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    if sw == 0 or sh == 0:
        raise ValueError("bad GIF dimensions")
    if sw * sh > 64_000_000:
        raise ValueError("GIF dimensions exceed the 64MP decode cap")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    canvas = None
    frames: list = []
    delays: list = []
    # pending Graphic Control state for the NEXT image descriptor
    disposal, transparent_idx, delay = 0, None, 0
    while pos < len(payload) and len(frames) < max_frames:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-block chain
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            data, pos = _sub_blocks(payload, pos + 1)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                (delay,) = struct.unpack_from("<H", data, 1)
                transparent_idx = data[3] if gpacked & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload,
                                                        pos)
        pos += 9
        if iw == 0 or ih == 0 or left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame outside the logical screen")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            table = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        data, pos = _sub_blocks(payload, pos + 1)
        idx = np.array(
            _lzw_decode(min_code, data, iw * ih), dtype=np.uint16
        ).reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index out of palette range")
        if ipacked & 0x40:  # interlaced: rows were stored pass-by-pass
            ordered = np.empty_like(idx)
            src = 0
            for first, step in _INTERLACE_PASSES:
                rows = range(first, ih, step)
                ordered[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = ordered
        if canvas is None:
            bgt = gct if gct is not None else table  # bg is GLOBAL
            bg = bgt[bg_idx] if bg_idx < len(bgt) else bgt[0]
            canvas = np.empty((sh, sw, 3), dtype=np.uint8)
            canvas[:, :] = bg
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + ih, left : left + iw]
        if transparent_idx is not None:
            opaque = idx != transparent_idx
            rect[opaque] = table[idx[opaque]]
        else:
            rect[:, :] = table[idx]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore rect to background
            canvas[top : top + ih, left : left + iw] = bg
        elif disposal == 3 and saved is not None:  # restore previous
            canvas = saved
        disposal, transparent_idx, delay = 0, None, 0
    if not frames:
        raise ValueError("GIF ended without an image descriptor")
    return sw, sh, frames, delays


def _parse_gif(payload: bytes):
    """Full decode of the first frame: ``(logical screen width, logical
    screen height, HxWx3 uint8 RGB)`` — frame 1 of
    :func:`_parse_gif_frames`, composited onto the background-color
    canvas with its Graphic Control transparency honored (the still
    that thumbnailers and Pillow's ``seek(0)`` show)."""
    sw, sh, frames, _delays = _parse_gif_frames(payload, max_frames=1)
    return sw, sh, frames[0]


def decode_gif_meta(payload: bytes) -> dict:
    """Header-only metadata decode (dimensions from the logical screen
    descriptor; must not pay the LZW decode)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("bad GIF dimensions")
    return {"n_bytes": len(payload), "width": w, "height": h,
            "format": "gif"}
