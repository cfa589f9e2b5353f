"""Compressed A/V container METADATA parsers (pure stdlib/struct).

These give the multimodal pipeline real width/height/duration/bitrate for
MP3 audio and MP4 (ISO BMFF) video payloads without any codec library:

- MP3: ID3v2 skip + MPEG audio frame-header scan (sync, version, layer,
  bitrate/sample-rate tables, padding) -> frame count, duration, average
  bitrate.  This is the same frame-walk accurate players use for VBR
  files (a Xing/Info header, when present, is cross-checked).
- MP4: top-level box walk (ftyp/moov/mdat, 32- and 64-bit sizes) with
  moov -> mvhd (timescale/duration, version 0 and 1) and trak -> tkhd
  (16.16 fixed-point width/height) descent.

The stub boundary for compressed codecs therefore shrinks to the actual
SAMPLE/PIXEL decode (MPEG audio synthesis, H.26x frames): container
structure, dimensions, and durations are parsed for real, which is what a
training-data pipeline filters on before ever decoding payloads.

Encoder twins (``make_mp3``, ``make_mp4``) build minimal valid containers
for deterministic fixtures: correct headers/boxes with silent payloads.

Reference parity note: the reference repo has no A/V path; this module
implements the graft brief's multimodal-column capability (SURVEY.md
LLM-pipeline ops) from the public MPEG-1 audio (ISO 11172-3) and ISO
BMFF (ISO 14496-12) layouts.
"""

from __future__ import annotations

import struct

__all__ = [
    "parse_mp3", "make_mp3", "parse_mp4", "make_mp4",
    "mp4_sample_tables", "mp4_extract_samples", "make_mp4_media",
    "parse_webp", "make_webp", "parse_tiff", "make_tiff",
    "parse_flac", "make_flac", "parse_heif", "make_heif",
    "parse_ogg", "make_ogg",
]


# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad.
_MP3_BITRATES = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None)
# MPEG-1 sample rates, index 0..2; 3 = reserved.
_MP3_RATES = (44100, 48000, 32000, None)
_MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none). Size field is
    4 syncsafe bytes (7 bits each) and excludes the 10-byte header."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        return 0  # malformed syncsafe size: treat as no tag
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size


def parse_mp3(data: bytes) -> dict:
    """Scan MPEG-1 Layer III frames -> duration / rates / frame count.

    Returns {duration_sec, sample_rate, n_frames, avg_bitrate_kbps,
    vbr, xing_frames}.  Raises ValueError on payloads with no valid
    frame sequence (corrupt containers surface as per-row errors
    upstream, never job failures).
    """
    pos = _id3v2_size(data)
    n_frames = 0
    bitrate_sum = 0
    sample_rate = None
    bitrates = set()
    xing_frames = None
    end = len(data)
    while pos + 4 <= end:
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xFE) != 0xFA:  # sync + MPEG-1 + Layer III
            if n_frames == 0 and b0 == 0x00:
                pos += 1  # tolerate leading padding before first sync
                continue
            break
        bidx, sidx, padding = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
        kbps, rate = _MP3_BITRATES[bidx], _MP3_RATES[sidx]
        if kbps is None or rate is None:
            break
        if sample_rate is None:
            sample_rate = rate
        elif rate != sample_rate:
            break  # rate change mid-stream: stop at the consistent prefix
        frame_len = (144_000 * kbps) // rate + padding
        if frame_len <= 4 or pos + frame_len > end:
            break
        if n_frames == 0:
            # Xing/Info VBR header sits in the first frame's side-info
            # region; frames-field presence flag is bit 0.
            for probe in (pos + 36, pos + 21):  # stereo / mono side-info
                tag = data[probe:probe + 4]
                if tag in (b"Xing", b"Info") and data[probe + 7] & 0x1:
                    xing_frames = struct.unpack(">I", data[probe + 8:probe + 12])[0]
                    break
        n_frames += 1
        bitrate_sum += kbps
        bitrates.add(kbps)
        pos += frame_len
    if n_frames == 0 or sample_rate is None:
        raise ValueError("no valid MPEG-1 Layer III frame sequence")
    duration = n_frames * _MP3_SAMPLES_PER_FRAME / sample_rate
    return {
        "duration_sec": duration,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "avg_bitrate_kbps": bitrate_sum / n_frames,
        "vbr": len(bitrates) > 1,
        "xing_frames": xing_frames,
    }


def make_mp3(n_frames: int, bitrate_idx: int = 9, rate_idx: int = 0,
             id3: bool = False, vbr: bool = False) -> bytes:
    """Minimal valid MPEG-1 Layer III stream: correct frame headers with
    silent (zero) payloads. ``vbr`` alternates two bitrate indices."""
    out = bytearray()
    if id3:
        body = b"TAG0" + b"\x00" * 20
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> s) & 0x7F for s in (21, 14, 7, 0)]) + body
    for i in range(n_frames):
        bidx = bitrate_idx if not (vbr and i % 2) else max(1, bitrate_idx - 1)
        kbps, rate = _MP3_BITRATES[bidx], _MP3_RATES[rate_idx]
        padding = i % 2
        frame_len = (144_000 * kbps) // rate + padding
        hdr = bytes([0xFF, 0xFB, (bidx << 4) | (rate_idx << 2) | (padding << 1), 0xC0])
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF
# ---------------------------------------------------------------------------


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in [start, end).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                break
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            break
        yield btype, pos + header, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """ISO BMFF box walk -> {brand, duration_sec, width, height, n_tracks}.

    mvhd carries movie timescale/duration (version 0: 32-bit at offsets
    12/16 past the version byte block; version 1: 64-bit); tkhd carries
    per-track 16.16 fixed-point width/height in its last 8 bytes.
    Raises ValueError when no moov/mvhd is present (corrupt or truncated
    container).
    """
    brand = None
    duration = None
    width = height = 0
    n_tracks = 0
    for btype, p0, p1 in _walk_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            brand = data[p0:p0 + 4].decode("latin-1")
        elif btype == b"moov":
            for ctype, c0, c1 in _walk_boxes(data, p0, p1):
                if ctype == b"mvhd" and c1 - c0 >= 20:
                    version = data[c0]
                    if version == 1 and c1 - c0 >= 32:
                        timescale = struct.unpack(">I", data[c0 + 20:c0 + 24])[0]
                        dur = struct.unpack(">Q", data[c0 + 24:c0 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", data[c0 + 12:c0 + 16])[0]
                        dur = struct.unpack(">I", data[c0 + 16:c0 + 20])[0]
                    if timescale:
                        duration = dur / timescale
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, t0, t1 in _walk_boxes(data, c0, c1):
                        if ttype == b"tkhd" and t1 - t0 >= 8:
                            w, h = struct.unpack(">II", data[t1 - 8:t1])
                            width = max(width, w >> 16)
                            height = max(height, h >> 16)
    if duration is None:
        raise ValueError("no moov/mvhd box: truncated or corrupt MP4")
    return {"brand": brand, "duration_sec": duration,
            "width": width, "height": height, "n_tracks": n_tracks}


def _find_box(data: bytes, start: int, end: int, btype: bytes):
    """First child box of the given type in [start, end), or None."""
    for t, p0, p1 in _walk_boxes(data, start, end):
        if t == btype:
            return p0, p1
    return None


def mp4_sample_tables(data: bytes) -> list[dict]:
    """Parse every track's SAMPLE TABLES (ISO 14496-12 stbl) into flat
    per-sample (offset, size, pts) arrays — the real random-access map a
    frame sampler needs, not just the header metadata ``parse_mp4`` reads.

    Returns one dict per track that carries a complete stbl:
      {track_id, handler ('vide'/'soun'), codec (stsd fourcc), timescale,
       width, height, channels, sample_rate,
       offsets: list[int], sizes: list[int], pts: list[float]}

    Boxes walked: moov -> trak -> (tkhd for the id) -> mdia -> mdhd
    (media timescale) + hdlr (handler) + minf -> stbl -> stsd (codec +
    entry dims) / stts (decode deltas) / stsc (sample->chunk runs) /
    stsz (sizes) / stco|co64 (chunk offsets). Tracks with a missing or
    empty table set are skipped (e.g. metadata-only fixtures) — callers
    fall back to the container-level parse.
    """
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    tracks = []
    for ttype, t0, t1 in _walk_boxes(data, moov[0], moov[1]):
        if ttype != b"trak":
            continue
        track_id = None
        tk = _find_box(data, t0, t1, b"tkhd")
        if tk is not None and tk[1] - tk[0] >= 16:
            version = data[tk[0]]
            off = tk[0] + (12 if version == 0 else 20)
            track_id = struct.unpack(">I", data[off:off + 4])[0]
        mdia = _find_box(data, t0, t1, b"mdia")
        if mdia is None:
            continue
        timescale = None
        handler = None
        mdhd = _find_box(data, mdia[0], mdia[1], b"mdhd")
        if mdhd is not None:
            version = data[mdhd[0]]
            off = mdhd[0] + (12 if version == 0 else 20)
            timescale = struct.unpack(">I", data[off:off + 4])[0]
        hdlr = _find_box(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
            handler = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1")
        minf = _find_box(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find_box(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        s0, s1 = stbl
        codec = None
        width = height = 0
        channels = 0
        sample_rate = 0
        stts_runs: list[tuple[int, int]] = []
        stsc_runs: list[tuple[int, int]] = []
        sizes: list[int] = []
        chunk_offsets: list[int] = []
        codec_private = None
        codec_private_type = None
        for btype, p0, p1 in _walk_boxes(data, s0, s1):
            if btype == b"stsd" and p1 - p0 >= 16:
                # version/flags(4) + entry_count(4), then entries as boxes
                for etype, q0, q1 in _walk_boxes(data, p0 + 8, p1):
                    codec = etype.decode("latin-1")
                    if q1 - q0 >= 28:
                        # VisualSampleEntry: width/height at payload 24/26
                        w, h = struct.unpack(">HH", data[q0 + 24:q0 + 28])
                        # AudioSampleEntry: channels at 16, 16.16 rate at 24
                        ch = struct.unpack(">H", data[q0 + 16:q0 + 18])[0]
                        sr = struct.unpack(">I", data[q0 + 24:q0 + 28])[0] >> 16
                        width, height = w, h
                        channels, sample_rate = ch, sr
                    # codec CONFIGURATION record (avcC/hvcC/esds) rides as
                    # child boxes after the fixed sample-entry fields —
                    # 78 bytes for VisualSampleEntry, 28 for
                    # AudioSampleEntry (ISO 14496-12 §12). It carries the
                    # stream-level SPS, i.e. the dimensions the BITSTREAM
                    # declares (ops/bitstream.py) vs what the container
                    # claims here.
                    for entry_off in (78, 28):
                        if codec_private is not None or q0 + entry_off >= q1:
                            continue
                        for ctype, r0, r1 in _walk_boxes(
                                data, q0 + entry_off, q1):
                            if ctype in (b"avcC", b"hvcC", b"esds"):
                                codec_private_type = ctype.decode("latin-1")
                                codec_private = bytes(data[r0:r1])
                                break
                    break  # first sample description only
            elif btype == b"stts":
                (n_ent,) = struct.unpack(">I", data[p0 + 4:p0 + 8])
                for i in range(n_ent):
                    c, d = struct.unpack(">II", data[p0 + 8 + 8 * i:p0 + 16 + 8 * i])
                    stts_runs.append((c, d))
            elif btype == b"stsc":
                (n_ent,) = struct.unpack(">I", data[p0 + 4:p0 + 8])
                for i in range(n_ent):
                    fc, spc, _sdi = struct.unpack(
                        ">III", data[p0 + 8 + 12 * i:p0 + 20 + 12 * i])
                    stsc_runs.append((fc, spc))
            elif btype == b"stsz":
                uniform, n_samples = struct.unpack(">II", data[p0 + 4:p0 + 12])
                if n_samples > len(data):
                    # a sample COUNT above the container's own byte size is
                    # a declared-count bomb: reject before the list/pts
                    # expansion allocates gigabytes off a 20-byte header
                    raise ValueError(
                        f"stsz declares {n_samples} samples in a "
                        f"{len(data)}-byte container")
                if uniform:
                    sizes = [uniform] * n_samples
                else:
                    sizes = list(struct.unpack(
                        f">{n_samples}I", data[p0 + 12:p0 + 12 + 4 * n_samples]))
            elif btype == b"stco":
                (n_ent,) = struct.unpack(">I", data[p0 + 4:p0 + 8])
                chunk_offsets = list(struct.unpack(
                    f">{n_ent}I", data[p0 + 8:p0 + 8 + 4 * n_ent]))
            elif btype == b"co64":
                (n_ent,) = struct.unpack(">I", data[p0 + 4:p0 + 8])
                chunk_offsets = list(struct.unpack(
                    f">{n_ent}Q", data[p0 + 8:p0 + 8 + 8 * n_ent]))
        if not sizes or not chunk_offsets or not stsc_runs:
            continue  # header-only track: no addressable samples
        # expand stsc runs -> samples-per-chunk for each chunk
        spc_per_chunk = []
        n_chunks = len(chunk_offsets)
        for ri, (fc, spc) in enumerate(stsc_runs):
            last = stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else n_chunks
            # chunks beyond stco's actual entry list don't exist: clamping
            # keeps a forged first_chunk from expanding an unbounded run
            last = min(last, n_chunks)
            spc_per_chunk.extend([spc] * (last - fc + 1))
        offsets = []
        s_i = 0
        for c_i, c_off in enumerate(chunk_offsets):
            pos = c_off
            for _ in range(spc_per_chunk[c_i] if c_i < len(spc_per_chunk) else 0):
                if s_i >= len(sizes):
                    break
                offsets.append(pos)
                pos += sizes[s_i]
                s_i += 1
        n = min(len(offsets), len(sizes))
        pts = []
        t_acc = 0
        ts = float(timescale or 1)
        for count, delta in stts_runs:
            for _ in range(count):
                if len(pts) >= n:
                    break
                pts.append(t_acc / ts)
                t_acc += delta
        while len(pts) < n:  # stts shorter than stsz: extend with last delta
            pts.append(t_acc / ts)
            t_acc += stts_runs[-1][1] if stts_runs else 1
        tracks.append({
            "track_id": track_id, "handler": handler, "codec": codec,
            "timescale": timescale, "width": width, "height": height,
            "channels": channels, "sample_rate": sample_rate,
            "codec_private": codec_private,
            "codec_private_type": codec_private_type,
            "offsets": offsets[:n], "sizes": sizes[:n], "pts": pts[:n],
        })
    return tracks


def mp4_extract_samples(data: bytes, track: dict, every_nth: int = 1,
                        max_samples: int | None = None) -> list[dict]:
    """Slice every-nth sample's raw bytes out of the container using the
    parsed table — the 'frame-sample' stage of a video pipeline. Returns
    [{sample_no, pts_sec, data}]."""
    out = []
    idxs = range(0, len(track["sizes"]), max(1, every_nth))
    for k, i in enumerate(idxs):
        if max_samples is not None and k >= max_samples:
            break
        off, size = track["offsets"][i], track["sizes"][i]
        if off + size > len(data):
            raise ValueError(f"sample {i} extends past the container end")
        out.append({"sample_no": i, "pts_sec": track["pts"][i],
                    "data": data[off:off + size]})
    return out


def make_mp4_media(samples: list[bytes], codec: bytes, handler: bytes,
                   width: int = 0, height: int = 0, timescale: int = 600,
                   sample_delta: int = 60, channels: int = 1,
                   sample_rate: int = 8000,
                   samples_per_chunk: int = 3,
                   codec_private: bytes | None = None,
                   codec_private_type: bytes = b"avcC") -> bytes:
    """Fully-addressable MP4: ftyp + mdat(samples) + moov with a COMPLETE
    stbl (stsd/stts/stsc/stsz/stco), so ``mp4_sample_tables`` can map and
    extract every sample. ``codec`` is the stsd fourcc (b"jpeg" for an
    MJPEG video track whose samples are whole JPEG images; b"sowt" for
    little-endian 16-bit PCM audio). mdat precedes moov so chunk offsets
    are known without patching."""
    ftyp = _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    mdat_payload = b"".join(samples)
    mdat_header_at = len(ftyp)
    data_at = mdat_header_at + 8
    # chunk layout: groups of samples_per_chunk consecutive samples
    sizes = [len(s) for s in samples]
    chunk_offsets = []
    pos = data_at
    for i, sz in enumerate(sizes):
        if i % samples_per_chunk == 0:
            chunk_offsets.append(pos)
        pos += sz
    n = len(samples)
    dur = n * sample_delta

    if handler == b"vide":
        entry_payload = (
            b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref idx
            + b"\x00" * 16                                # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4 + struct.pack(">H", 1)          # reserved + frame count
            + b"\x00" * 32                                # compressor name
            + struct.pack(">Hh", 24, -1))                 # depth, color table
        if codec_private is not None:
            entry_payload += _box(codec_private_type, codec_private)
        header_box = _box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    else:
        entry_payload = (
            b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HH", 0, 0) + b"\x00" * 4      # version/revision/vendor
            + struct.pack(">HHHH", channels, 16, 0, 0)
            + struct.pack(">I", sample_rate << 16))
        header_box = _box(b"smhd", b"\x00" * 8)
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + _box(codec, entry_payload))
    stts = _box(b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, n, sample_delta))
    # stsc runs: all chunks hold samples_per_chunk except a short tail
    runs = [(1, samples_per_chunk)]
    tail = n % samples_per_chunk
    if tail and n > samples_per_chunk:
        runs.append((len(chunk_offsets), tail))
    elif tail:
        runs = [(1, tail)]
    stsc = _box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">I", len(runs))
                + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs))
    stsz = _box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, n)
                + struct.pack(f">{n}I", *sizes))
    stco = _box(b"stco", b"\x00\x00\x00\x00"
                + struct.pack(">I", len(chunk_offsets))
                + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _box(b"dref", b"\x00\x00\x00\x00\x00\x00\x00\x01"
                              + _box(b"url ", b"\x00\x00\x00\x01")))
    minf = _box(b"minf", header_box + dinf + stbl)
    hdlr = _box(b"hdlr", b"\x00\x00\x00\x00\x00\x00\x00\x00" + handler
                + b"\x00" * 12 + b"\x00")
    mdhd = _box(b"mdhd", b"\x00\x00\x00\x00" + struct.pack(
        ">IIII", 0, 0, timescale, dur) + b"\x00\x00\x00\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(
        ">IIIII", 0, 0, 1, 0, dur) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00" + struct.pack(
        ">IIIII", 0, 0, timescale, dur, 0x00010000) + b"\x00" * 76)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def make_mp4(width: int, height: int, duration_sec: float,
             timescale: int = 1000, n_tracks: int = 1) -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd + trak(tkhd)*n) + empty mdat."""
    dur = int(round(duration_sec * timescale))
    mvhd = _box(b"mvhd", b"\x00\x00\x00\x00" + struct.pack(
        ">IIIII", 0, 0, timescale, dur, 0x00010000) + b"\x00" * 76)
    traks = b""
    for i in range(n_tracks):
        tkhd = _box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(
            ">IIIII", 0, 0, i + 1, 0, dur) + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16))
        traks += _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    return ftyp + moov + _box(b"mdat", b"")


# --------------------------------------------------------------------------
# Crawl-common image/audio header parses: WebP, TIFF, FLAC (round 5).
# Same philosophy as the MP3/MP4 walks above: real dimensions/durations
# from the published container layouts (RIFF/VP8 payload headers, TIFF 6.0
# IFDs, FLAC STREAMINFO) with the entropy-coded PIXEL/SAMPLE decode staying
# behind the declared stub boundary.

def parse_webp(data: bytes) -> dict:
    """RIFF WebP container -> {width, height, format, alpha, animation}.

    Reads the actual codec payload headers, not just the container:
    - ``VP8 `` (lossy): 3-byte frame tag (keyframe check) + the
      9D 01 2A start code, then 14-bit LE width/height;
    - ``VP8L`` (lossless): 0x2F signature then 14+14 bits LSB-first;
    - ``VP8X`` (extended): 24-bit LE canvas minus-one fields (flags
      carry alpha/animation) — still cross-read against the inner
      VP8/VP8L chunk when present.
    Raises ValueError on non-WebP or truncated payloads."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP RIFF container")
    riff_end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    pos = 12
    out: dict = {"width": 0, "height": 0, "format": None,
                 "alpha": False, "animation": False}
    while pos + 8 <= riff_end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        p = pos + 8
        if p + size > len(data):
            size = max(0, len(data) - p)  # truncated final chunk
        chunk = data[p:p + size]
        if fourcc == b"VP8X" and size >= 10:
            out["format"] = out["format"] or "VP8X"
            out["alpha"] = bool(chunk[0] & 0x10)
            out["animation"] = bool(chunk[0] & 0x02)
            w = 1 + (chunk[4] | (chunk[5] << 8) | (chunk[6] << 16))
            h = 1 + (chunk[7] | (chunk[8] << 8) | (chunk[9] << 16))
            out["width"], out["height"] = w, h
        elif fourcc == b"VP8 " and size >= 10:
            # frame tag: bit 0 of byte 0 = 0 for keyframe
            if (chunk[0] & 1) == 0 and chunk[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", chunk[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", chunk[8:10])[0] & 0x3FFF
                out["format"] = out["format"] or "VP8"
                if not out["width"]:
                    out["width"], out["height"] = w, h
        elif fourcc == b"VP8L" and size >= 5 and chunk[0] == 0x2F:
            bits = struct.unpack("<I", chunk[1:5])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            out["format"] = out["format"] or "VP8L"
            out["alpha"] = out["alpha"] or bool((bits >> 28) & 1)
            if not out["width"]:
                out["width"], out["height"] = w, h
        pos = p + size + (size & 1)  # chunks pad to even
    if out["format"] is None or not out["width"]:
        raise ValueError("no decodable WebP bitstream header")
    return out


def make_webp(width: int, height: int, fmt: str = "VP8L",
              alpha: bool = False, animation: bool = False) -> bytes:
    """Minimal WebP with a bit-exact codec payload HEADER (the pixel
    entropy stream is a dummy — fixtures test the header parse)."""
    if fmt == "VP8L":
        bits = ((width - 1) & 0x3FFF) | (((height - 1) & 0x3FFF) << 14) \
            | ((1 if alpha else 0) << 28)
        payload = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif fmt == "VP8":
        tag = b"\x10\x00\x00"  # keyframe (bit0=0), version 0, show_frame
        payload = (tag + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
                   + b"\x00" * 8)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    elif fmt == "VP8X":
        flags = (0x10 if alpha else 0) | (0x02 if animation else 0)
        payload = (bytes([flags, 0, 0, 0])
                   + struct.pack("<I", width - 1)[:3]
                   + struct.pack("<I", height - 1)[:3])
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError(f"unknown WebP fmt {fmt}")
    if len(chunk) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_tiff(data: bytes, max_entries: int = 4096) -> dict:
    """TIFF 6.0 header + first-IFD walk (both endiannesses) ->
    {width, height, compression, bits_per_sample, n_ifds}. Entry and
    IFD counts are bomb-guarded. SHORT/LONG values that fit the 4-byte
    field read inline; larger counts (BitsPerSample count=3 in every
    RGB TIFF) dereference the bounds-checked offset and take the first
    element."""
    if len(data) < 8:
        raise ValueError("truncated TIFF")
    if data[:4] == b"II\x2a\x00":
        e = "<"
    elif data[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    out = {"width": 0, "height": 0, "compression": 1,
           "bits_per_sample": 1, "n_ifds": 0}
    seen = set()
    while ifd_off and ifd_off + 2 <= len(data) and ifd_off not in seen:
        seen.add(ifd_off)
        out["n_ifds"] += 1
        (n,) = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])
        if n > max_entries:
            raise ValueError(f"IFD declares {n} entries")
        base = ifd_off + 2
        for i in range(n):
            ent = data[base + 12 * i:base + 12 * i + 12]
            if len(ent) < 12:
                break
            tag, typ = struct.unpack(e + "HH", ent[:4])
            (count,) = struct.unpack(e + "I", ent[4:8])
            # inline only when the value FITS the 4-byte field; otherwise
            # the field is a file offset to the value array (TIFF 6.0 §2)
            # — BitsPerSample in every RGB TIFF is SHORT count=3, and
            # reading the offset word as the value yields garbage. For
            # count>1 the FIRST element stands in (the per-channel values
            # are equal in practice; a metadata pipeline filters on one).
            if typ == 3:        # SHORT (2 bytes each)
                if count == 0:
                    continue
                if count <= 2:
                    (val,) = struct.unpack(e + "H", ent[8:10])
                else:
                    (off,) = struct.unpack(e + "I", ent[8:12])
                    if off + 2 > len(data):
                        continue
                    (val,) = struct.unpack(e + "H", data[off:off + 2])
            elif typ == 4:      # LONG (4 bytes each)
                if count == 0:
                    continue
                if count == 1:
                    (val,) = struct.unpack(e + "I", ent[8:12])
                else:
                    (off,) = struct.unpack(e + "I", ent[8:12])
                    if off + 4 > len(data):
                        continue
                    (val,) = struct.unpack(e + "I", data[off:off + 4])
            else:
                continue
            if out["n_ifds"] == 1:  # first image's geometry wins
                if tag == 256:
                    out["width"] = val
                elif tag == 257:
                    out["height"] = val
                elif tag == 259:
                    out["compression"] = val
                elif tag == 258:
                    out["bits_per_sample"] = val
        nxt = base + 12 * n
        if nxt + 4 > len(data) or out["n_ifds"] > 64:
            break
        (ifd_off,) = struct.unpack(e + "I", data[nxt:nxt + 4])
    if not out["width"] or not out["height"]:
        raise ValueError("TIFF carries no ImageWidth/ImageLength")
    return out


def make_tiff(width: int, height: int, big_endian: bool = False,
              compression: int = 1, n_ifds: int = 1) -> bytes:
    """Minimal multi-IFD TIFF (header fields only, no strip data)."""
    e = ">" if big_endian else "<"
    head = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") \
        + struct.pack(e + "I", 8)
    out = bytearray(head)
    off = 8
    for k in range(n_ifds):
        tags = [(256, 3, width), (257, 3, height), (258, 3, 8),
                (259, 3, compression)]
        ifd = struct.pack(e + "H", len(tags))
        for tag, typ, val in tags:
            ifd += struct.pack(e + "HHI", tag, typ, 1) \
                + struct.pack(e + "H", val) + b"\x00\x00"
        nxt = off + 2 + 12 * len(tags) + 4
        ifd += struct.pack(e + "I", nxt if k + 1 < n_ifds else 0)
        out += ifd
        off = nxt
    return bytes(out)


def parse_flac(data: bytes) -> dict:
    """FLAC STREAMINFO (the mandatory first metadata block) ->
    {sample_rate, channels, bits_per_sample, total_samples,
    duration_sec, n_meta_blocks}. Sample DECODE stays stubbed."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    out = None
    n_blocks = 0
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + length]
        n_blocks += 1
        if btype == 0 and len(body) >= 18:  # STREAMINFO
            bits = int.from_bytes(body[10:18], "big")
            rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            out = {"sample_rate": rate, "channels": channels,
                   "bits_per_sample": bps, "total_samples": total,
                   "duration_sec": (total / rate) if rate else 0.0}
        if hdr & 0x80:  # last-metadata-block flag
            break
        pos += 4 + length
        if n_blocks > 1024:
            raise ValueError("metadata block bomb")
    if out is None:
        raise ValueError("no STREAMINFO block")
    out["n_meta_blocks"] = n_blocks
    return out


def make_flac(sample_rate: int = 44100, channels: int = 2,
              total_samples: int = 44100, bits_per_sample: int = 16) -> bytes:
    """Minimal FLAC: fLaC magic + one last STREAMINFO block (no frames)."""
    bits = ((sample_rate & 0xFFFFF) << 44) \
        | (((channels - 1) & 0x7) << 41) \
        | (((bits_per_sample - 1) & 0x1F) << 36) \
        | (total_samples & ((1 << 36) - 1))
    body = (struct.pack(">HH", 4096, 4096)      # min/max block size
            + b"\x00\x00\x00" * 2               # min/max frame size (u24)
            + bits.to_bytes(8, "big")
            + b"\x00" * 16)                     # md5 of unencoded audio
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


_HEIF_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"hevc", b"mif1",
                b"msf1", b"heim", b"heis"}


def parse_heif(data: bytes) -> dict:
    """AVIF/HEIF still image (ISO 23008-12 over ISO BMFF) ->
    {brand, width, height, n_items, alpha}.

    These files carry no ``moov``: the image lives under
    ``meta`` (a FullBox) -> ``iprp`` -> ``ipco``, whose ``ispe``
    property boxes hold the pixel dimensions. The LARGEST ispe wins
    (smaller ones are thumbnails/alpha planes); ``auxC`` presence
    marks an auxiliary (usually alpha) item. Raises ValueError when
    no ispe is found."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    brand = data[8:12]
    if brand not in _HEIF_BRANDS:
        raise ValueError(f"not a HEIF/AVIF brand: {brand!r}")
    best = (0, 0)
    n_items = 0
    alpha = False
    for btype, p0, p1 in _walk_boxes(data, 0, len(data)):
        if btype != b"meta":
            continue
        # meta is a FullBox: 4 bytes version/flags precede its children
        for ctype, c0, c1 in _walk_boxes(data, p0 + 4, p1):
            if ctype == b"iinf" and c1 - c0 >= 6:
                version = data[c0]
                off = c0 + 4
                if version == 0:
                    n_items = struct.unpack(">H", data[off:off + 2])[0]
                else:
                    n_items = struct.unpack(">I", data[off:off + 4])[0]
            elif ctype == b"iprp":
                for ptype, q0, q1 in _walk_boxes(data, c0, c1):
                    if ptype != b"ipco":
                        continue
                    for etype, r0, r1 in _walk_boxes(data, q0, q1):
                        if etype == b"ispe" and r1 - r0 >= 12:
                            w, h = struct.unpack(
                                ">II", data[r0 + 4:r0 + 12])
                            if w * h > best[0] * best[1]:
                                best = (w, h)
                        elif etype == b"auxC":
                            alpha = True
    if not best[0]:
        raise ValueError("no ispe property: not a decodable HEIF image")
    return {"brand": brand.decode("latin-1"), "width": best[0],
            "height": best[1], "n_items": n_items, "alpha": alpha}


def make_heif(width: int, height: int, brand: bytes = b"avif",
              alpha: bool = False, thumb: tuple | None = None) -> bytes:
    """Minimal AVIF/HEIF: ftyp + meta(iinf + iprp(ipco(ispe...)))."""
    ftyp = _box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand + b"mif1")
    ispe = _box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", width, height))
    props = ispe
    if thumb is not None:
        props += _box(b"ispe", b"\x00\x00\x00\x00"
                      + struct.pack(">II", *thumb))
    if alpha:
        props += _box(b"auxC", b"\x00\x00\x00\x00"
                      b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha\x00")
    iinf = _box(b"iinf", b"\x00\x00\x00\x00" + struct.pack(">H", 2 if alpha else 1))
    meta = _box(b"meta", b"\x00\x00\x00\x00" + iinf
                + _box(b"iprp", _box(b"ipco", props)))
    return ftyp + meta + _box(b"mdat", b"\x00" * 16)


def parse_ogg(data: bytes, max_pages: int = 100_000) -> dict:
    """Ogg container (RFC 3533) with an Opus (RFC 7845) or Vorbis id
    header -> {codec, sample_rate, channels, duration_sec, n_pages,
    pre_skip}.

    Duration comes from the LAST audio page's granule position — PCM
    samples at the codec rate for Vorbis, 48 kHz samples minus pre-skip
    for Opus (the spec's playback clock regardless of the input rate
    recorded in OpusHead). Raises ValueError on non-Ogg payloads or
    streams with no recognized id header."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    codec = None
    rate = None
    channels = None
    pre_skip = 0
    audio_serial = None
    last_granule = 0
    n_pages = 0
    pos = 0
    n = len(data)
    while pos + 27 <= n and n_pages < max_pages:
        if data[pos:pos + 4] != b"OggS":
            break
        n_pages += 1
        granule = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        serial = struct.unpack("<I", data[pos + 14:pos + 18])[0]
        n_segs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + n_segs]
        body_len = sum(seg_table)
        body = data[pos + 27 + n_segs:pos + 27 + n_segs + body_len]
        if codec is None:
            if body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                pre_skip = struct.unpack("<H", body[10:12])[0]
                rate = 48000  # Opus always plays out at 48 kHz
                audio_serial = serial
            elif body[:7] == b"\x01vorbis" and len(body) >= 30:
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack("<I", body[12:16])[0]
                audio_serial = serial
        if serial == audio_serial and granule >= 0:
            last_granule = max(last_granule, granule)
        pos += 27 + n_segs + body_len
    if codec is None:
        raise ValueError("no Opus/Vorbis id header in Ogg stream")
    samples = max(0, last_granule - (pre_skip if codec == "opus" else 0))
    return {"codec": codec, "sample_rate": rate, "channels": channels,
            "duration_sec": samples / float(rate) if rate else 0.0,
            "n_pages": n_pages, "pre_skip": pre_skip}


def _ogg_page(serial: int, seq: int, granule: int, body: bytes,
              header_type: int = 0) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (b"OggS\x00" + bytes([header_type])
            + struct.pack("<q", granule) + struct.pack("<I", serial)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + bytes(segs) + body)


def make_ogg(codec: str = "opus", sample_rate: int = 48000,
             channels: int = 2, total_samples: int = 48000,
             pre_skip: int = 312, n_audio_pages: int = 3) -> bytes:
    """Minimal Ogg stream: id-header page + audio pages whose final
    granule encodes ``total_samples`` (+ pre-skip for Opus)."""
    serial = 0x1234
    if codec == "opus":
        ident = (b"OpusHead\x01" + bytes([channels])
                 + struct.pack("<H", pre_skip)
                 + struct.pack("<I", sample_rate) + b"\x00\x00\x00")
        final_granule = total_samples + pre_skip
    else:
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", sample_rate) + b"\x00" * 16 + b"\x01")
        final_granule = total_samples
    out = _ogg_page(serial, 0, 0, ident, header_type=2)
    for i in range(n_audio_pages):
        granule = final_granule * (i + 1) // n_audio_pages
        ht = 4 if i == n_audio_pages - 1 else 0
        out += _ogg_page(serial, i + 1, granule, b"\x00" * 32, header_type=ht)
    return out
