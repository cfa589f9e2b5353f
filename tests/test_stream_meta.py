"""Stream-vs-container metadata verification through the Spark media
pipeline: H.26x SPS dims parsed from the MP4's avcC/hvcC records
(ops/bitstream.py) override the container claim and flag disagreement;
standalone AAC ADTS payloads decode real duration/rate metadata."""

from pdfextractor_spark.ops.bitstream import (
    make_adts,
    make_avcc,
    make_h264_sps,
    make_h265_sps,
    make_hvcc,
)
from pdfextractor_spark.ops.containers import make_mp4_media, mp4_sample_tables
from pdfextractor_spark.ops.multimodal import decode_media


def _avc_mp4(claim_w, claim_h, sps_w, sps_h, codec=b"avc1"):
    if codec == b"avc1":
        private = make_avcc(make_h264_sps(sps_w, sps_h))
        ptype = b"avcC"
    else:
        private = make_hvcc(make_h265_sps(sps_w, sps_h))
        ptype = b"hvcC"
    samples = [b"\x00\x00\x00\x01" + bytes(40) for _ in range(4)]
    return make_mp4_media(samples, codec, b"vide", width=claim_w,
                          height=claim_h, codec_private=private,
                          codec_private_type=ptype)


def test_sample_tables_capture_codec_private():
    mp4 = _avc_mp4(320, 240, 320, 240)
    (tr,) = mp4_sample_tables(mp4)
    assert tr["codec"] == "avc1" and tr["codec_private_type"] == "avcC"
    assert tr["codec_private"][0] == 1  # configurationVersion
    # MJPEG tracks carry no private record -> None (back-compat)
    plain = make_mp4_media([b"\xff\xd8\xff\xdb" + bytes(20)], b"jpeg",
                           b"vide", width=32, height=24)
    (tp,) = mp4_sample_tables(plain)
    assert tp["codec_private"] is None


def test_stream_dims_agree_no_flag(spark):
    """Container and SPS agree: stream dims stand, meta_mismatch False."""
    media = spark.createDataFrame(
        [(1, "video", bytearray(_avc_mp4(320, 240, 320, 240)), "video/mp4"),
         (2, "video", bytearray(_avc_mp4(854, 480, 854, 480, b"hvc1")),
          "video/mp4")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert out[1]["error"] is None
    assert (out[1]["width"], out[1]["height"]) == (320, 240)
    assert out[1]["meta_mismatch"] is False
    assert (out[2]["width"], out[2]["height"]) == (854, 480)
    assert out[2]["meta_mismatch"] is False


def test_lying_container_flagged_and_stream_wins(spark):
    """The container claims 160x120 but the H.264 SPS says 320x240: the
    bitstream is authoritative and the row is flagged."""
    media = spark.createDataFrame(
        [(1, "video", bytearray(_avc_mp4(160, 120, 320, 240)), "video/mp4"),
         (2, "video", bytearray(_avc_mp4(640, 360, 1280, 720, b"hvc1")),
          "video/mp4")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert (out[1]["width"], out[1]["height"]) == (320, 240)
    assert out[1]["meta_mismatch"] is True and out[1]["error"] is None
    assert (out[2]["width"], out[2]["height"]) == (1280, 720)
    assert out[2]["meta_mismatch"] is True


def test_non_h26x_rows_have_null_mismatch(spark):
    """Rows with no stream-level record to check (images, plain MP4s)
    keep meta_mismatch null — absence of evidence, not agreement."""
    import numpy as np

    from pdfextractor_spark.ops.containers import make_mp4
    from pdfextractor_spark.ops.multimodal import make_bmp

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(make_bmp(px)), "image/bmp"),
         (2, "video", bytearray(make_mp4(640, 480, 2.0)), "video/mp4")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert out[1]["meta_mismatch"] is None
    assert out[2]["meta_mismatch"] is None
    assert (out[2]["width"], out[2]["height"]) == (640, 480)


def test_adts_payload_through_spark(spark):
    """Standalone ADTS streams decode real duration/rate via the frame
    walk; corrupt sync-less bytes stay per-row errors."""
    adts = make_adts(86, rate_idx=4, channels=2)  # ~2s at 44.1 kHz
    media = spark.createDataFrame(
        [(1, "audio", bytearray(adts), "audio/aac"),
         (2, "audio", bytearray(b"\x01\x02\x03\x04" * 10), "audio/aac")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert out[1]["error"] is None
    assert abs(out[1]["duration_sec"] - 86 * 1024 / 44100.0) < 0.01
    assert len(out[1]["feature"]) == 8
    assert out[2]["error"] is not None


def test_webp_tiff_flac_round_trips():
    """Header-level parses for the three round-5 crawl formats, against
    their encoder twins plus malformed-input guards."""
    import pytest

    from pdfextractor_spark.ops.containers import (
        make_flac, make_tiff, make_webp, parse_flac, parse_tiff, parse_webp,
    )

    for fmt in ("VP8", "VP8L", "VP8X"):
        m = parse_webp(make_webp(640, 360, fmt))
        assert (m["width"], m["height"], m["format"]) == (640, 360, fmt)
    assert parse_webp(make_webp(16383, 4, "VP8"))["width"] == 16383
    x = parse_webp(make_webp(32, 16, "VP8X", alpha=True, animation=True))
    assert x["alpha"] and x["animation"]
    assert parse_webp(make_webp(32, 16, "VP8L", alpha=True))["alpha"]
    with pytest.raises(ValueError):
        parse_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_webp(b"RIFF\x10\x00\x00\x00WEBPJUNK\x04\x00\x00\x00abcd")

    for be in (False, True):
        t = parse_tiff(make_tiff(800, 600, big_endian=be, n_ifds=3))
        assert (t["width"], t["height"], t["n_ifds"]) == (800, 600, 3)
        assert t["bits_per_sample"] == 8 and t["compression"] == 1
    with pytest.raises(ValueError):
        parse_tiff(b"II\x2a\x00" + b"\xff" * 16)  # huge entry count bomb
    with pytest.raises(ValueError):
        parse_tiff(b"PK\x03\x04")

    f = parse_flac(make_flac(48000, 2, 96000, bits_per_sample=24))
    assert f["sample_rate"] == 48000 and f["channels"] == 2
    assert f["bits_per_sample"] == 24
    assert f["duration_sec"] == 96000 / 48000
    with pytest.raises(ValueError):
        parse_flac(b"fLaC")  # no STREAMINFO
    with pytest.raises(ValueError):
        parse_flac(b"OggS\x00\x00")


def test_webp_tiff_flac_through_spark(spark):
    """The three formats decode real metadata through decode_media;
    corrupt variants stay per-row errors."""
    from pdfextractor_spark.ops.containers import make_flac, make_tiff, make_webp

    media = spark.createDataFrame(
        [(1, "image", bytearray(make_webp(320, 200, "VP8L")), "image/webp"),
         (2, "image", bytearray(make_webp(1920, 1080, "VP8X")), "image/webp"),
         (3, "image", bytearray(make_tiff(1024, 768, big_endian=True)),
          "image/tiff"),
         (4, "audio", bytearray(make_flac(44100, 1, 220500)), "audio/flac"),
         (5, "image", bytearray(b"II\x2a\x00" + b"\xff" * 8), "image/tiff")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (1920, 1080)
    assert (out[3]["width"], out[3]["height"]) == (1024, 768)
    assert out[4]["duration_sec"] == 5.0 and out[4]["width"] is None
    for i in (1, 2, 3, 4):
        assert out[i]["error"] is None and len(out[i]["feature"]) == 8
    assert out[5]["error"] is not None  # corrupt TIFF: per-row error


def test_heif_avif_and_annexb_through_spark(spark):
    """AVIF/HEIF still images and raw H.26x elementary streams decode
    real dimensions through decode_media."""
    from pdfextractor_spark.ops.bitstream import make_annexb
    from pdfextractor_spark.ops.containers import make_heif, parse_heif

    # direct parse: biggest ispe wins, thumb/alpha accounted
    m = parse_heif(make_heif(640, 480, brand=b"heic", alpha=True,
                             thumb=(64, 48)))
    assert (m["width"], m["height"], m["alpha"], m["n_items"]) == \
        (640, 480, True, 2)

    media = spark.createDataFrame(
        [(1, "image", bytearray(make_heif(1200, 800)), "image/avif"),
         (2, "image", bytearray(make_heif(320, 240, brand=b"heic")),
          "image/heic"),
         (3, "video", bytearray(make_annexb(1280, 720, n_frames=6)),
          "video/h264"),
         (4, "video", bytearray(make_annexb(832, 480, n_frames=3,
                                            codec="h265")), "video/h265"),
         (5, "image", bytearray(b"\x00\x00\x00\x10ftypavif"), "image/avif")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert (out[1]["width"], out[1]["height"]) == (1200, 800)
    assert (out[2]["width"], out[2]["height"]) == (320, 240)
    assert (out[3]["width"], out[3]["height"]) == (1280, 720)
    assert (out[4]["width"], out[4]["height"]) == (832, 480)
    for i in (1, 2, 3, 4):
        assert out[i]["error"] is None, out[i]
    assert out[5]["error"] is not None  # truncated: no meta/ispe


def test_ogg_opus_vorbis_through_spark(spark):
    """Ogg page walk: duration from the last granule (Opus pre-skip
    subtracted, 48 kHz playback clock; Vorbis at the coded rate)."""
    import pytest

    from pdfextractor_spark.ops.containers import make_ogg, parse_ogg

    m = parse_ogg(make_ogg("opus", total_samples=96000, pre_skip=312))
    assert (m["codec"], m["sample_rate"], m["pre_skip"]) == \
        ("opus", 48000, 312)
    assert m["duration_sec"] == 2.0  # pre-skip excluded
    v = parse_ogg(make_ogg("vorbis", sample_rate=44100, channels=1,
                           total_samples=88200))
    assert (v["codec"], v["sample_rate"], v["channels"]) == \
        ("vorbis", 44100, 1)
    assert v["duration_sec"] == 2.0
    with pytest.raises(ValueError):
        parse_ogg(b"OggS" + b"\x00" * 40)  # pages but no id header

    media = spark.createDataFrame(
        [(1, "audio", bytearray(make_ogg("opus", total_samples=144000)),
          "audio/ogg"),
         (2, "audio", bytearray(make_ogg("vorbis", sample_rate=22050,
                                         total_samples=44100)), "audio/ogg")],
        "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           decode_media(media, num_partitions=2).collect()}
    assert out[1]["error"] is None and out[1]["duration_sec"] == 3.0
    assert out[2]["error"] is None and out[2]["duration_sec"] == 2.0


def test_tiff_multi_count_bits_per_sample():
    """TIFF entries with count>1 (BitsPerSample count=3 in every RGB
    TIFF) must dereference the offset, not read it as the value."""
    import struct

    from pdfextractor_spark.ops.containers import parse_tiff

    # hand-build: II header, one IFD with width/height inline and
    # BitsPerSample SHORT count=3 stored at an offset
    e = "<"
    ifd_off = 8
    n_tags = 3
    values_off = ifd_off + 2 + 12 * n_tags + 4
    ifd = struct.pack(e + "H", n_tags)
    ifd += struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "H", 640) + b"\x00\x00"
    ifd += struct.pack(e + "HHI", 257, 3, 1) + struct.pack(e + "H", 480) + b"\x00\x00"
    ifd += struct.pack(e + "HHI", 258, 3, 3) + struct.pack(e + "I", values_off)
    ifd += struct.pack(e + "I", 0)
    data = b"II\x2a\x00" + struct.pack(e + "I", ifd_off) + ifd \
        + struct.pack(e + "HHH", 8, 8, 8)
    t = parse_tiff(data)
    assert (t["width"], t["height"]) == (640, 480)
    assert t["bits_per_sample"] == 8  # NOT the offset word
