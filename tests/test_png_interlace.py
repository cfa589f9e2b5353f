"""Adam7-interlaced / multi-bit-depth PNG and interlaced GIF decode.

The round-3 verdict flagged these as the last common-crawl image variants
falling into the per-row error bucket (graft-brief capability, no
reference counterpart): interlaced PNGs/GIFs and 16-bit PNGs are routine
in a real crawl. The encoder twins (make_png(interlace=...),
make_png_gray, make_png_palette, make_gif(interlace=True)) write
spec-conforming streams with filter Up inside every pass, so the decoder's
per-pass filter state is exercised, not just filter None.
"""
import numpy as np
import pytest

from pdfextractor_spark.ops.multimodal import (
    _gif_row_order, _png_spans, decode_gif, decode_png, make_gif, make_png,
    make_png_gray, make_png_palette,
)


def _px(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# dims chosen to hit every Adam7 shape class: 1x1 (only pass 1 non-empty),
# sub-8 tiles (several empty passes), exact tile, non-multiples, tall/wide
DIMS = [(1, 1), (1, 9), (9, 1), (2, 2), (3, 5), (4, 4), (5, 3),
        (7, 7), (8, 8), (9, 5), (13, 16), (16, 13), (33, 31)]


@pytest.mark.parametrize("h,w", DIMS)
def test_adam7_rgb8_matches_noninterlaced(h, w):
    px = _px(h, w, seed=h * 100 + w)
    wi, hi, rgb_i = decode_png(make_png(px, interlace=True))
    wn, hn, rgb_n = decode_png(make_png(px))
    assert (wi, hi) == (wn, hn) == (w, h)
    assert np.array_equal(rgb_i, px)
    assert np.array_equal(rgb_n, px)


def test_adam7_spans_cover_every_pixel_once():
    for h, w in DIMS:
        seen = np.zeros((h, w), dtype=np.int32)
        for x0, y0, dx, dy, pw, ph in _png_spans(w, h, 1):
            seen[y0::dy, x0::dx] += 1
            assert seen[y0::dy, x0::dx].shape == (ph, pw)
        assert (seen == 1).all()


@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_rgb_high_byte_roundtrip(interlace):
    px = _px(11, 7, seed=3)
    w, h, rgb = decode_png(make_png(px, depth=16, interlace=interlace))
    assert (w, h) == (7, 11)
    # encoder stores s*257 -> high byte is exactly s
    assert np.array_equal(rgb, px)


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_gray_depths(depth, interlace):
    h, w = 9, 13
    rng = np.random.RandomState(depth)
    hi = 256 if depth >= 8 else (1 << depth)
    g = rng.randint(0, hi, size=(h, w)).astype(np.uint8)
    ww, hh, rgb = decode_png(make_png_gray(g, depth=depth, interlace=interlace))
    assert (ww, hh) == (w, h)
    if depth >= 8:
        expect = g
    else:  # decoder scales raw codes to 0..255
        expect = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    assert np.array_equal(rgb, np.repeat(expect[:, :, None], 3, axis=2))


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_palette_depths(depth, interlace):
    h, w = 10, 6
    ncolors = 1 << depth
    rng = np.random.RandomState(depth + 10)
    palette = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w)).astype(np.uint8)
    ww, hh, rgb = decode_png(make_png_palette(idx, palette, depth=depth,
                                              interlace=interlace))
    assert (ww, hh) == (w, h)
    assert np.array_equal(rgb, palette[idx])


def test_png_illegal_depth_combo_rejected():
    # RGB at depth 4 is illegal per the spec table — must fail cleanly
    data = bytearray(make_png(_px(4, 4)))
    # IHDR body starts at offset 16; depth is byte 8 of the body
    data[16 + 8] = 4
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))


def test_png_interlaced_truncation_detected():
    full = make_png(_px(16, 16), interlace=True)
    # chop the IDAT payload: rebuild with half the compressed bytes
    import struct as st
    import zlib

    pos, chunks = 8, []
    while pos + 8 <= len(full):
        (ln,) = st.unpack_from(">I", full, pos)
        tag = full[pos + 4: pos + 8]
        body = full[pos + 8: pos + 8 + ln]
        if tag == b"IDAT":
            body = zlib.compress(zlib.decompress(body)[: 16 * (16 * 3 + 1) // 2])
        chunks.append((tag, body))
        pos += 12 + ln
    out = full[:8] + b"".join(
        st.pack(">I", len(b)) + t + b + st.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        for t, b in chunks)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(out)


def test_png_interlaced_bomb_guard(monkeypatch):
    # the bounded-inflate guard must hold on the interlaced path too
    monkeypatch.setenv("SPARK_GRAFT_MAX_PIXELS", "8")
    with pytest.raises(ValueError, match="decode ceiling"):
        decode_png(make_png(_px(4, 4), interlace=True))  # 16 px > ceiling
    monkeypatch.delenv("SPARK_GRAFT_MAX_PIXELS")
    decode_png(make_png(_px(4, 4), interlace=True))


@pytest.mark.parametrize("h,w", [(1, 4), (2, 3), (4, 4), (5, 9), (8, 8),
                                 (11, 7), (16, 16)])
def test_gif_interlaced_matches_noninterlaced(h, w):
    px = _px(h, w, seed=h * 7 + w)
    wi, hi, rgb_i = decode_gif(make_gif(px, interlace=True))
    wn, hn, rgb_n = decode_gif(make_gif(px))
    assert (wi, hi) == (wn, hn) == (w, h)
    assert np.array_equal(rgb_i, rgb_n)  # same web-palette quantization


def test_gif_row_order_is_a_permutation():
    for h in (1, 2, 3, 7, 8, 9, 64):
        assert sorted(_gif_row_order(h)) == list(range(h))


def test_decode_media_handles_interlaced_payloads(spark):
    """Spark-side: interlaced variants flow through decode_media as real
    decodes (dims + features), not per-row errors."""
    from pdfextractor_spark.ops.multimodal import MEDIA_SCHEMA, decode_media

    px = _px(12, 9, seed=42)
    rows = [
        (1, "image", bytearray(make_png(px, interlace=True)), "image/png"),
        (2, "image", bytearray(make_png(px, depth=16)), "image/png"),
        (3, "image", bytearray(make_gif(px, interlace=True)), "image/gif"),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert len(out) == 3
    for mid, r in out.items():
        assert r["error"] is None, (mid, r["error"])
        assert (r["width"], r["height"]) == (9, 12)
