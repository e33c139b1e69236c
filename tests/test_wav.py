"""Hermetic WAV decoder + audio features (operators/wav.py): decode
pinned against the stdlib ``wave`` writer (an independent encoder) and
the real CPython pluck-pcm* fixture family, G.711 expansion against
the spec's known code/value pairs, fingerprint depth/gain invariance,
the Unsupported-vs-malformed contract, and the distributed path
(one Arrow stage + the SAME Hamming-band near-dup machinery images
use)."""

from __future__ import annotations

import glob
import io
import struct
import wave

import numpy as np
import pytest

from tower_parse_spark.operators.multimodal import phash_near_dup_pairs
from tower_parse_spark.operators.wav import (
    UnsupportedWavError,
    _expand_alaw,
    _expand_mulaw,
    _parse_wav,
    audio_features,
    audio_fingerprint,
    decode_wav_meta,
    with_audio_features,
)

_REAL_GLOB = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
              "audiodata/pluck-pcm*.wav")


def _sine(rate=8000, secs=0.25, hz=440.0, amp=0.6, channels=1):
    t = np.arange(int(rate * secs)) / rate
    x = amp * np.sin(2 * np.pi * hz * t)
    return np.tile(x[:, None], (1, channels))


def _wave_bytes(x, rate, sampwidth):
    """Encode float [-1,1] frames with the STDLIB wave module — an
    encoder this repo didn't write."""
    n_ch = x.shape[1]
    if sampwidth == 1:
        raw = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    else:
        scale = float(1 << (8 * sampwidth - 1)) - 1
        v = np.clip(x * scale, -scale, scale).astype(np.int64)
        if sampwidth == 2:
            raw = v.astype("<i2").tobytes()
        elif sampwidth == 3:
            b = np.empty((v.size, 3), np.uint8)
            flat = v.ravel() & 0xFFFFFF
            b[:, 0] = flat & 0xFF
            b[:, 1] = (flat >> 8) & 0xFF
            b[:, 2] = (flat >> 16) & 0xFF
            raw = b.tobytes()
        else:
            raw = v.astype("<i4").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(raw)
    return buf.getvalue()


def _raw_wav(fmt_tag, channels, rate, bits, data, fmt_extra=b""):
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate,
        rate * channels * max(bits // 8, 1), channels * max(bits // 8,
                                                            1), bits
    ) + fmt_extra
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + (b"\x00" if len(fmt) & 1 else b"")
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" \
        + chunks


@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
def test_pcm_roundtrip_against_stdlib_wave(sampwidth):
    x = _sine(channels=2)
    payload = _wave_bytes(x, 8000, sampwidth)
    rate, ch, frames = _parse_wav(payload)
    assert (rate, ch) == (8000, 2)
    assert frames.shape == x.shape
    tol = 2.0 / (1 << (8 * sampwidth - 1))
    assert float(np.abs(frames - x).max()) <= tol
    meta = decode_wav_meta(payload)
    assert meta["n_frames"] == len(x)
    assert meta["duration_ms"] == 250
    assert meta["format"] == "wav"


def test_float_formats_exact():
    x = _sine()
    for bits, dt in ((32, "<f4"), (64, "<f8")):
        data = x.ravel().astype(dt).tobytes()
        payload = _raw_wav(3, 1, 8000, bits, data)
        _, _, frames = _parse_wav(payload)
        assert np.allclose(frames.ravel(), x.ravel(), atol=1e-6)


def test_g711_known_values_and_symmetry():
    """The spec's canonical code/value pairs: mu-law 0xFF/0x7F are the
    two zeros, 0x80/0x00 the extremes (+-32124); A-law 0xD5/0x55 are
    +-8, 0xAA/0x2A the extremes (+-32256)."""
    mu = _expand_mulaw(np.arange(256, dtype=np.uint8)) * 32768.0
    assert mu[0xFF] == 0 and mu[0x7F] == 0
    assert mu[0x80] == 32124 and mu[0x00] == -32124
    al = _expand_alaw(np.arange(256, dtype=np.uint8)) * 32768.0
    assert al[0xD5] == 8 and al[0x55] == -8
    assert al[0xAA] == 32256 and al[0x2A] == -32256
    # negation closure: both laws decode to sign-symmetric value sets
    assert set(np.abs(mu)) == set(mu[mu >= 0])
    assert set(np.abs(al)) == set(al[al >= 0])


def test_g711_wav_decode():
    codes = np.arange(256, dtype=np.uint8)
    for tag, expand in ((7, _expand_mulaw), (6, _expand_alaw)):
        payload = _raw_wav(tag, 1, 8000, 8, codes.tobytes())
        _, _, frames = _parse_wav(payload)
        assert np.allclose(frames.ravel(), expand(codes))


def test_extensible_resolves_subformat():
    x = _sine()
    data = (np.clip(x.ravel(), -1, 1) * 32767).astype("<i2").tobytes()
    # EXTENSIBLE fmt: cbSize=22, valid bits, channel mask, GUID whose
    # leading u16 is the real tag (PCM)
    extra = struct.pack("<HHI", 22, 16, 0x4) + struct.pack("<H", 1) \
        + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    payload = _raw_wav(0xFFFE, 1, 8000, 16, data, fmt_extra=extra)
    _, _, frames = _parse_wav(payload)
    assert float(np.abs(frames.ravel() - x.ravel()).max()) < 1e-3


def test_unsupported_vs_malformed():
    x = _sine()
    data = (x.ravel() * 32767).astype("<i2").tobytes()
    adpcm = _raw_wav(0x0002, 1, 8000, 4, data)
    with pytest.raises(UnsupportedWavError):
        _parse_wav(adpcm)
    with pytest.raises(UnsupportedWavError):
        _parse_wav(_raw_wav(1, 1, 8000, 12, data))  # 12-bit PCM
    with pytest.raises(ValueError, match="not a WAV"):
        _parse_wav(b"RIFFxxxxWEBP")
    with pytest.raises(ValueError, match="fmt/data"):
        _parse_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    bad_ch = _raw_wav(1, 0, 8000, 16, data)
    with pytest.raises(ValueError, match="channel"):
        _parse_wav(bad_ch)


def test_real_fixture_family_collides_across_depths():
    """The same clip at PCM 8/16/24/32 + EXTENSIBLE-24: metadata
    agrees, features agree to quantization, the robust fingerprint is
    BIT-IDENTICAL (depth invariance — the property that makes it a
    near-dup key rather than a checksum)."""
    files = sorted(glob.glob(_REAL_GLOB))
    if len(files) < 5:
        pytest.skip("container audio data files not present")
    fps, metas, feats = [], [], []
    for f in files:
        p = open(f, "rb").read()
        metas.append(decode_wav_meta(p))
        feats.append(audio_features(p))
        fps.append(audio_fingerprint(p))
    assert {m["n_frames"] for m in metas} == {3307}
    assert {m["sample_rate"] for m in metas} == {11025}
    # 16/24/24ext/32-bit are BIT-IDENTICAL; 8-bit quantization may flip
    # a near-tied band transition (measured: exactly 1 bit on this
    # clip) — still well inside the banding recall (Hamming <= 3)
    assert len(set(fps)) <= 2
    ref = max(set(fps), key=fps.count)
    for v in fps:
        assert bin((v ^ ref) & 0xFFFFFFFF).count("1") <= 2
    durs = {f[0] for f in feats}
    assert durs == {feats[0][0]}
    for f in feats:
        assert abs(f[1] - feats[0][1]) < 0.01  # rms within 8-bit quant


def test_fingerprint_gain_invariance_and_discrimination():
    x = _sine(hz=330.0, secs=0.5)
    full = _raw_wav(3, 1, 8000, 32,
                    x.ravel().astype("<f4").tobytes())
    half = _raw_wav(3, 1, 8000, 32,
                    (x * 0.5).ravel().astype("<f4").tobytes())
    assert audio_fingerprint(full) == audio_fingerprint(half)
    noise = _raw_wav(
        3, 1, 8000, 32,
        np.random.default_rng(7).normal(0, 0.3, len(x))
        .astype("<f4").tobytes(),
    )
    a = audio_fingerprint(full) & 0xFFFFFFFF
    b = audio_fingerprint(noise) & 0xFFFFFFFF
    assert bin(a ^ b).count("1") > 3  # different content != near-dup


def test_distributed_audio_near_dup(spark):
    """One Arrow stage decodes + fingerprints; the IMAGE banding
    operator pairs the cross-depth duplicates unchanged."""
    files = sorted(glob.glob(_REAL_GLOB))
    if len(files) < 5:
        pytest.skip("container audio data files not present")
    rows = [(i, open(f, "rb").read()) for i, f in enumerate(files)]
    other = _sine(hz=123.0, secs=0.3)
    rows.append((99, _raw_wav(3, 1, 8000, 32,
                              np.random.default_rng(3)
                              .normal(0, 0.4, 2400)
                              .astype("<f4").tobytes())))
    rows.append((100, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = with_audio_features(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[100]["phash"] is None  # NULL payload -> NULL columns
    assert len({got[i]["phash"] for i in range(5)}) <= 2  # pcm8 1 bit
    assert got[0]["duration_ms"] == 300
    assert got[0]["feat"][0] == pytest.approx(0.3, abs=0.01)
    # scalar/distributed parity
    assert got[1]["phash"] == audio_fingerprint(rows[1][1])
    pairs = phash_near_dup_pairs(
        out.where("phash is not null").select("doc_id", "phash")
    )
    got_pairs = {(r["id1"], r["id2"]) for r in pairs.collect()}
    want = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    assert want <= got_pairs
    assert not any(99 in p for p in got_pairs)
    assert other is not None

# ---------------------------------------------------------------------------
# sibling containers: AU + AIFF/AIFC
# ---------------------------------------------------------------------------

from tower_parse_spark.operators.wav import (  # noqa: E402
    _f80,
    _parse_aiff,
    _parse_au,
    _parse_audio,
    decode_audio_meta,
)

_REAL37 = ("/root/.pyenv/versions/3.7.16/lib/python3.7/test/"
           "audiodata/")


def _au(x, rate, enc, dtype):
    data = x.astype(dtype).tobytes()
    return struct.pack(">4sIIIII", b".snd", 28, len(data), enc, rate,
                       x.shape[1] if x.ndim > 1 else 1) + b"\x00" * 4 \
        + data


def test_au_formats():
    x = _sine()
    p16 = _au((np.clip(x, -1, 1) * 32767), 8000, 3, ">i2")
    rate, ch, frames = _parse_au(p16)
    assert (rate, ch) == (8000, 1)
    assert float(np.abs(frames - x).max()) < 1e-3
    pf = _au(x, 8000, 6, ">f4")
    assert np.allclose(_parse_au(pf)[2], x, atol=1e-6)
    p8 = _au((np.clip(x, -1, 1) * 127), 8000, 2, "i1")
    assert float(np.abs(_parse_au(p8)[2] - x).max()) < 0.02
    with pytest.raises(UnsupportedWavError):
        _parse_au(_au(x, 8000, 23, ">i2"))  # ADPCM
    with pytest.raises(ValueError, match="not an AU"):
        _parse_au(b"snd." + p16[4:])


def test_f80_known_values():
    """The AIFF extended sample-rate field: canonical encodings of
    44100 and 11025 from real files."""
    assert _f80(bytes.fromhex("400EAC44000000000000")) == 44100.0
    assert _f80(bytes.fromhex("400CAC44000000000000")) == 11025.0
    assert _f80(bytes.fromhex("00000000000000000000")) == 0.0


def test_aiff_hand_built_sowt_and_float():
    x = _sine()
    v = (np.clip(x, -1, 1) * 32767).astype("<i2")

    def aiff(comm_extra, body, bits):
        comm = struct.pack(">HIH", 1, len(x), bits) \
            + bytes.fromhex("400BFA00000000000000") + comm_extra
        ssnd = struct.pack(">II", 0, 0) + body
        inner = (b"AIFC"
                 + b"COMM" + struct.pack(">I", len(comm)) + comm
                 + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
        return b"FORM" + struct.pack(">I", len(inner)) + inner

    sowt = aiff(b"sowt\x00\x00", v.tobytes(), 16)
    rate, ch, frames = _parse_aiff(sowt)
    assert rate == 8000 and ch == 1
    assert float(np.abs(frames.ravel() - x.ravel()).max()) < 1e-3
    fl = aiff(b"fl32\x00\x00", x.ravel().astype(">f4").tobytes(), 32)
    assert np.allclose(_parse_aiff(fl)[2].ravel(), x.ravel(),
                       atol=1e-6)
    with pytest.raises(UnsupportedWavError, match="compression"):
        _parse_aiff(aiff(b"ima4\x00\x00", v.tobytes(), 16))


def test_real_cross_container_fingerprint_identity():
    """The SAME clip shipped by CPython as .wav/.au/.aiff/.aifc across
    PCM 8/16/24/32 and G.711 a-law/mu-law — 15 real encoder outputs,
    three container walks, six sample codecs: every fingerprint lands
    within Hamming 1 of the reference and the 16/24/32-bit ones are
    BIT-IDENTICAL across containers."""
    files = sorted(glob.glob(_REAL37 + "pluck-*"))
    if len(files) < 15:
        pytest.skip("container audio data files not present")
    fps = {}
    for f in files:
        p = open(f, "rb").read()
        meta = decode_audio_meta(p)
        assert meta["n_frames"] == 3307 and meta["duration_ms"] == 300
        fps[f.rsplit("/", 1)[1]] = audio_fingerprint(p) & 0xFFFFFFFF
    wide = [v for n, v in fps.items()
            if any(k in n for k in ("pcm16", "pcm24", "pcm32"))]
    assert len(set(wide)) == 1
    for v in fps.values():
        assert bin(v ^ wide[0]).count("1") <= 1
    # container-format tagging
    assert decode_audio_meta(
        open(files[0], "rb").read())["format"] == "aiff"


def test_parse_audio_sniff_rejects_non_audio():
    with pytest.raises(ValueError):
        _parse_audio(b"GIF89a\x01\x00\x01\x00")


def test_empty_data_chunk_is_valid_not_malformed():
    """Review r15: a spec-valid file with an EMPTY data chunk (stdlib
    wave writes one for zero frames) must yield zero features and a
    zero fingerprint, not a ValueError that would fail a whole Arrow
    batch."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
    payload = buf.getvalue()
    assert decode_wav_meta(payload)["n_frames"] == 0
    assert audio_features(payload) == [0.0, 0.0, 0.0, 0.0]
    assert audio_fingerprint(payload) == 0
