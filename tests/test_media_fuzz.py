"""Property fuzz for the binary media parsers (ops/containers.py,
ops/bitstream.py): random bytes and bit-flipped valid fixtures must
never hang, never allocate unboundedly, and fail only with controlled
errors — a crawl's media columns are adversarial by default, and the
decode UDF's per-row error containment is only as good as the parsers'
worst case."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextractor_spark.ops.bitstream import (
    make_adts,
    make_annexb,
    make_h264_sps,
    make_h265_sps,
    parse_adts,
    parse_annexb,
    parse_avcc,
    parse_h264_sps,
    parse_h265_sps,
    parse_hvcc,
)
from pdfextractor_spark.ops.containers import (
    make_flac,
    make_heif,
    make_mp3,
    make_mp4,
    make_ogg,
    make_tiff,
    make_webp,
    parse_flac,
    parse_heif,
    parse_mp3,
    parse_mp4,
    parse_ogg,
    parse_tiff,
    parse_webp,
)

# errors a parser may raise on garbage: its own ValueError plus the
# bounded struct/slice failures of a truncated read. Anything else
# (TypeError, RecursionError, MemoryError from an unguarded allocation)
# is a bug.
_OK_ERRORS = (ValueError, struct.error, IndexError, KeyError)

_PARSERS = [parse_mp3, parse_mp4, parse_webp, parse_tiff, parse_flac,
            parse_heif, parse_ogg, parse_adts, parse_annexb,
            parse_h264_sps, parse_h265_sps, parse_avcc, parse_hvcc]


@settings(max_examples=150, deadline=2000)
@given(st.binary(min_size=0, max_size=2048))
def test_parsers_survive_random_bytes(data):
    for p in _PARSERS:
        try:
            p(data)
        except _OK_ERRORS:
            pass


def _mutate(data: bytes, pos: int, val: int) -> bytes:
    pos %= max(1, len(data))
    return data[:pos] + bytes([val]) + data[pos + 1:]


@settings(max_examples=120, deadline=2000)
@given(st.integers(0, 1 << 30), st.integers(0, 255), st.integers(0, 12))
def test_parsers_survive_mutated_valid_fixtures(pos, val, which):
    """Single-byte corruption of a VALID stream — the realistic crawl
    failure (truncated transfers, bit rot) — must parse or fail
    cleanly, never hang or crash uncontrolled."""
    fixtures = [
        make_mp3(5),
        make_mp4(320, 240, 2.0),
        make_webp(64, 48, "VP8L"),
        make_webp(64, 48, "VP8"),
        make_tiff(64, 48),
        make_flac(44100, 2, 44100),
        make_heif(64, 48),
        make_ogg("opus"),
        make_ogg("vorbis", sample_rate=44100),
        make_adts(5),
        make_annexb(320, 240),
        make_h264_sps(320, 240),
        make_h265_sps(320, 240),
    ]
    data = _mutate(fixtures[which], pos, val)
    for p in _PARSERS:
        try:
            out = p(data)
            assert isinstance(out, dict)
        except _OK_ERRORS:
            pass


@settings(max_examples=60, deadline=3000)
@given(st.integers(1, 2047), st.integers(1, 2047))
def test_sps_dims_round_trip_property(w, h):
    """Any even dimension pair round-trips bit-exactly through both SPS
    writers/parsers (the fixed sweep covers common sizes; this covers
    the crop-arithmetic space)."""
    w, h = w * 2, h * 2
    m = parse_h264_sps(make_h264_sps(w, h))
    assert (m["width"], m["height"]) == (w, h)
    m5 = parse_h265_sps(make_h265_sps(w, h))
    assert (m5["width"], m5["height"]) == (w, h)


@settings(max_examples=40, deadline=3000)
@given(st.integers(1, 400), st.integers(0, 12), st.integers(1, 8))
def test_adts_and_chunk_walk_properties(n_frames, rate_idx, channels):
    """ADTS frame-walk totals always tie out against the generator."""
    if channels > 7:
        channels = 7
    a = make_adts(n_frames, rate_idx=rate_idx, channels=channels)
    m = parse_adts(a)
    assert m["n_frames"] == n_frames
    assert m["channels"] == channels
    assert abs(m["duration_sec"]
               - n_frames * 1024 / m["sample_rate"]) < 1e-9


def test_declared_size_bombs_stay_bounded():
    """Headers DECLARING huge structures over tiny payloads must fail
    fast instead of allocating: the stsz guard (existing), the TIFF
    entry-count guard, the FLAC block walk, the Ogg page cap."""
    # TIFF: 0xFFFF entries declared in a 30-byte file
    bomb = b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", 0xFFFF) \
        + b"\x00" * 16
    try:
        parse_tiff(bomb)
        raise AssertionError("unbounded IFD accepted")
    except ValueError:
        pass
    # FLAC: a chain of zero-length non-last metadata blocks must not
    # loop forever (the 1024-block cap)
    flac_bomb = b"fLaC" + (bytes([1]) + b"\x00\x00\x00") * 2000
    try:
        parse_flac(flac_bomb)
    except ValueError:
        pass
    # Ogg: page walk caps at max_pages
    page = b"OggS\x00\x00" + b"\x00" * 20 + b"\x00"  # 0 segments
    try:
        parse_ogg(page * 5000, max_pages=100)
    except ValueError:
        pass
