"""Decode-bomb guards: a few hundred header bytes must never make a
decoder allocate memory proportional to *declared* (attacker-controlled)
dimensions or sample counts. A MemoryError would be a per-row error, but
an allocation that succeeds and then OOM-kills the executor is not
catchable — so the guards reject BEFORE allocating (ops/limits.py).
All tests are pure-python (no SparkSession): the per-row error plumbing
above these decoders is already pinned in test_ops_spark.py.
"""

import struct

import numpy as np
import pytest

from pdfextractor_spark.ops.containers import make_mp4_media, mp4_sample_tables
from pdfextractor_spark.ops.jpeg import decode_jpeg, make_jpeg
from pdfextractor_spark.ops.limits import DEFAULT_MAX_PIXELS, max_pixels
from pdfextractor_spark.ops.multimodal import (
    decode_bmp, decode_gif, decode_png, make_gif, make_png,
)


def _px(h=4, w=4):
    return np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)


def test_bmp_declared_dims_bomb():
    # 54-byte header declaring 60000x60000x24bpp (10.8 GB decoded)
    header = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 60000, 60000, 1, 24, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_bmp(header + info + b"\x00" * 64)


def test_png_declared_dims_bomb():
    data = bytearray(make_png(_px()))
    ihdr = data.index(b"IHDR") + 4
    struct.pack_into(">II", data, ihdr, 100000, 100000)  # 30 GB declared
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_png(bytes(data))


def test_png_deflate_bomb_bounded():
    """IDAT holding 10 MB of inflated zeros behind honest 4x4 dims: the
    bounded inflate stops at the needed byte count instead of expanding
    the whole stream."""
    import zlib

    need = 4 * (4 * 3 + 1)
    bomb = zlib.compress(b"\x00" * 10_000_000)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    chunks = b""
    for tag, body in ((b"IHDR", ihdr), (b"IDAT", bomb), (b"IEND", b"")):
        chunks += struct.pack(">I", len(body)) + tag + body + b"\x00" * 4
    w, h, rgb = decode_png(sig + chunks)
    assert (w, h) == (4, 4) and rgb.shape == (4, 4, 3)
    assert not rgb.any()  # all-zero filter bytes + zero rows
    assert need < 10_000_000  # the bomb was never fully inflated


def test_gif_declared_dims_bomb():
    data = bytearray(make_gif(_px()))
    desc = 13 + 768  # header + 256-color GCT -> image descriptor
    assert data[desc] == 0x2C
    struct.pack_into("<HH", data, desc + 5, 65000, 65000)  # 12.7 GB via palette
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_gif(bytes(data))


def test_gif_lzw_tail_cannot_expand_past_frame():
    """Extra LZW sub-blocks appended after a complete first frame stop
    expanding once w*h pixels exist (out is capped, not grown per code)."""
    base = make_gif(_px())
    w0, h0, rgb0 = decode_gif(base)
    data = bytearray(base)
    term = len(data) - 2  # ... 0x00 terminator, 0x3B trailer
    assert data[term] == 0 and data[term + 1] == 0x3B
    first_block_at = 13 + 768 + 10 + 1  # header + GCT + descriptor + mcs
    ln = data[first_block_at]
    repeat = bytes(data[first_block_at : first_block_at + 1 + ln]) * 2000
    bombed = bytes(data[:term]) + repeat + b"\x00\x3b"
    w, h, rgb = decode_gif(bombed)
    assert (w, h) == (w0, h0)
    assert np.array_equal(rgb, rgb0)


def test_jpeg_declared_dims_bomb():
    data = bytearray(make_jpeg(_px(8, 8)))
    sof = data.index(b"\xff\xc0")
    struct.pack_into(">HH", data, sof + 5, 50000, 50000)
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_jpeg(bytes(data))


def test_mp4_declared_sample_count_bomb():
    data = bytearray(make_mp4_media([b"x" * 32], codec=b"jpeg",
                                    handler=b"vide", width=4, height=4))
    stsz = data.index(b"stsz") + 4
    struct.pack_into(">II", data, stsz + 4, 4, 1 << 30)  # uniform, 2^30 samples
    with pytest.raises(ValueError, match="declares"):
        mp4_sample_tables(bytes(data))


def test_mp4_forged_stsc_run_is_clamped():
    """A first_chunk of 2^30 in an stsc run must not expand a 4 GB
    samples-per-chunk list; the run clamps to the real chunk count."""
    data = bytearray(make_mp4_media([b"x" * 32, b"y" * 32], codec=b"jpeg",
                                    handler=b"vide", width=4, height=4,
                                    samples_per_chunk=1))
    stsc = data.index(b"stsc") + 4
    # payload: ver/flags(4) + count(4) + runs of (first_chunk, spc, sdi)
    (n_runs,) = struct.unpack_from(">I", data, stsc + 4)
    struct.pack_into(">I", data, stsc + 8, 1 << 30)  # forge first run's fc
    tracks = mp4_sample_tables(bytes(data))  # completes fast, no bomb
    assert n_runs >= 1 and isinstance(tracks, list)


def test_pixel_ceiling_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MAX_PIXELS", "8")
    assert max_pixels() == 8
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_png(make_png(_px()))  # 16 px > 8 px ceiling
    monkeypatch.delenv("SPARK_GRAFT_MAX_PIXELS")
    assert max_pixels() == DEFAULT_MAX_PIXELS
    decode_png(make_png(_px()))  # back under the default ceiling
