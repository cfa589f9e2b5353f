"""JPEG (ITU-T T.81) codec in pure numpy/stdlib.

Decoder: baseline sequential DCT (SOF0/1) and progressive DCT (SOF2),
8-bit, grayscale or YCbCr with per-component sampling factors up to 2x2
(4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI/RSTn), multiple DQT/DHT
segments. Progressive covers the full Annex G Huffman feature set:
spectral selection, successive approximation (DC + AC first/refinement
scans), and cross-block EOB runs — scan semantics mirror libjpeg's
jdphuff.c. Arithmetic coding, hierarchical (SOF5+), and 12-bit precision
raise NotImplementedError — they surface as per-row errors at the
pipeline layer, never job failures.

Encoders (test/corpus twins): ``make_jpeg`` — baseline 4:4:4/4:2:0 YCbCr,
Annex K quantization scaled for a quality setting, Annex K Huffman
tables; ``make_jpeg_progressive`` — SOF2 with a scan script exercising
every progressive decode path (DC first+refine, split spectral bands,
AC Al=1 first + refinement, EOB runs).

Everything here derives from the published T.81 spec. The baseline
encode → decode round-trip is checked via PSNR (JPEG is lossy by
design); the progressive round-trip is checked EXACTLY — a fully refined
progressive file shares the baseline twin's quantization, so both must
reconstruct pixel-identical images.
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import check_pixels

__all__ = ["decode_jpeg", "make_jpeg"]

# ---------------------------------------------------------------------------
# Shared constants (T.81 Annex K)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA_SPEC = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]):
    """T.81 C.2: canonical code assignment. Returns {(length, code): symbol}
    for the decoder and {symbol: (code, length)} for the encoder."""
    dec = {}
    enc = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            sym = values[idx]
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return dec, enc


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (caller inspects ``marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        data = self.data
        while self.nbits <= 24:
            if self.pos >= len(data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.acc |= 0  # pad with zeros at EOF (spec allows)
                self.nbits += 8
                continue
            b = data[self.pos]
            if b == 0xFF:
                nxt = data[self.pos + 1] if self.pos + 1 < len(data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via read_marker()
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker and reset bit state."""
        data = self.data
        p = self.pos
        while p + 1 < len(data):
            if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                return
            p += 1
        self.pos = len(data)


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n-bit magnitude to signed value."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG bytes -> (width, height, (h, w, 3) uint8 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    prog_coefs = None  # progressive: per-component zigzag coefficient grids
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qtables[tq] = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int32)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = [0] + list(body[b + 1 : b + 17])
                nv = sum(bits)
                values = list(body[b + 17 : b + 17 + nv])
                htables[(tc, th)], _ = _canonical_codes(bits, values)
                b += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            check_pixels(w, h, "JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline and progressive DCT JPEG are supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2], body[2 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ah, al = body[3 + ns * 2] >> 4, body[3 + ns * 2] & 0x0F
            if not frame["prog"]:
                return _decode_scan(data, pos, frame, scan, qtables, htables,
                                    restart_interval)
            if prog_coefs is None:
                prog_coefs = _prog_alloc(frame)
            pos = _decode_scan_prog(data, pos, frame, scan, htables,
                                    restart_interval, prog_coefs, ss, se, ah, al)
            pos = _next_marker(data, pos)
    if frame is not None and frame["prog"] and prog_coefs is not None:
        return _prog_reconstruct(frame, prog_coefs, qtables)
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes[c["id"]] = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    dct_t = _DCT.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                dc_tbl = htables[(0, c["dc"])]
                ac_tbl = htables[(1, c["ac"])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(br, dc_tbl)
                        diff = _extend(br.receive(t), t) if t else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = (zz * q)[_UNZIGZAG].reshape(8, 8).astype(np.float64)
                        px = dct_t @ block @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    return _planes_to_rgb(frame, scan, planes, hmax, vmax)


def _planes_to_rgb(frame, comps, planes, hmax, vmax):
    """Upsample component planes to full resolution and convert to RGB."""
    w, h = frame["w"], frame["h"]
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.repeat(y[:, :, None], 3, axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    else:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    return w, h, rgb.astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2): T.81 Annex G, mirroring libjpeg's
# jdphuff.c scan semantics (DC/AC first + refinement, EOB runs).
# Coefficients accumulate across scans in zigzag order per component;
# reconstruction dequantizes + IDCTs once after the last scan.
# ---------------------------------------------------------------------------


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next real marker at/after ``p``: skips residual
    entropy bytes, 0xFF00 stuffing, fill bytes, and RSTn."""
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00:  # stuffed data byte
            p += 2
        elif nxt == 0xFF:  # fill byte
            p += 1
        elif 0xD0 <= nxt <= 0xD7:  # restart marker inside leftover entropy
            p += 2
        else:
            return p
    return n


def _prog_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _prog_alloc(frame):
    """Per-component coefficient grid (padded to the interleaved-MCU
    boundary; non-interleaved scans address the true block dims inside)."""
    hmax, vmax, mcux, mcuy = _prog_geometry(frame)
    coefs = {}
    for c in frame["comps"]:
        coefs[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
    return coefs


def _comp_block_dims(frame, c):
    """True (non-interleaved) block grid of a component: T.81 A.2.2."""
    hmax = max(k["h"] for k in frame["comps"])
    vmax = max(k["v"] for k in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _refine_nonzero(br, coef, k, p1):
    """Append one correction bit to an already-nonzero coefficient
    (T.81 G.1.2.3 / libjpeg jdphuff decode_mcu_AC_refine inner step)."""
    if br.read_bit():
        v = int(coef[k])
        if (v & p1) == 0:
            coef[k] = v + (p1 if v >= 0 else -p1)


def _decode_scan_prog(data, pos, frame, scan, htables, restart_interval,
                      coefs, ss, se, ah, al):
    """One progressive scan; mutates ``coefs``; returns position of the
    next marker."""
    br = _BitReader(data, pos)
    state = {"eobrun": 0, "preds": {c["id"]: 0 for c in scan}}

    def maybe_restart(unit_count):
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            br.align_restart()
            state["eobrun"] = 0
            state["preds"] = {c["id"]: 0 for c in scan}

    if ss == 0:  # DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        hmax, vmax, mcux, mcuy = _prog_geometry(frame)
        interleaved = len(scan) > 1
        if interleaved:
            units = mcuy * mcux
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(unit)
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                                _prog_dc_block(br, htables, state, c, blk, ah, al)
                    unit += 1
        else:
            c = scan[0]
            bh, bw = _comp_block_dims(frame, c)
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(unit)
                    _prog_dc_block(br, htables, state, c, coefs[c["id"]][by, bx], ah, al)
                    unit += 1
    else:  # AC scan: spec requires exactly one component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        c = scan[0]
        ac_tbl = htables.get((1, c["ac"]))
        bh, bw = _comp_block_dims(frame, c)
        grid = coefs[c["id"]]
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                maybe_restart(unit)
                if ah == 0:
                    _prog_ac_first(br, ac_tbl, state, grid[by, bx], ss, se, al)
                else:
                    _prog_ac_refine(br, ac_tbl, state, grid[by, bx], ss, se, al)
                unit += 1
    # BitReader stops with pos at the 0xFF of the next marker (or EOF)
    return br.pos


def _prog_dc_block(br, htables, state, c, blk, ah, al):
    if ah == 0:  # first DC scan: Huffman diff of the point-transformed value
        t = _decode_huff(br, htables[(0, c["dc"])])
        diff = _extend(br.receive(t), t) if t else 0
        state["preds"][c["id"]] += diff
        blk[0] = state["preds"][c["id"]] << al
    else:  # refinement: one bit per block
        if br.read_bit():
            blk[0] = int(blk[0]) | (1 << al)


def _prog_ac_first(br, ac_tbl, state, coef, ss, se, al):
    """AC first scan (Ah == 0): band Ss..Se, values scaled by 2^Al,
    EOB-run support (T.81 G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        coef[k] = _extend(br.receive(s), s) << al
        k += 1


def _prog_ac_refine(br, ac_tbl, state, coef, ss, se, al):
    """AC refinement scan (Ah > 0): newly-significant coefficients plus
    correction bits for already-nonzero ones (libjpeg jdphuff
    decode_mcu_AC_refine)."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid newly-significant size in refinement")
                val = p1 if br.read_bit() else -p1
            elif r != 15:
                state["eobrun"] = 1 << r
                if r:
                    state["eobrun"] += br.receive(r)
                break
            # advance over r zero-history coefficients, correcting nonzero ones
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(br, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # correction bits for the rest of the band
            if coef[k] != 0:
                _refine_nonzero(br, coef, k, p1)
            k += 1
        state["eobrun"] -= 1


def _prog_reconstruct(frame, coefs, qtables):
    """Dequantize + inverse DCT every component block, then the shared
    upsample/color path."""
    hmax, vmax, _, _ = _prog_geometry(frame)
    planes = {}
    dct_t = _DCT.T
    for c in frame["comps"]:
        grid = coefs[c["id"]]
        gh, gw = grid.shape[0], grid.shape[1]
        q = qtables[c["tq"]]
        plane = np.empty((gh * 8, gw * 8), dtype=np.float64)
        deq = (grid * q[None, None, :])[:, :, _UNZIGZAG].reshape(gh, gw, 8, 8)
        for by in range(gh):
            for bx in range(gw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    dct_t @ deq[by, bx].astype(np.float64) @ _DCT + 128.0)
        planes[c["id"]] = plane
    return _planes_to_rgb(frame, frame["comps"], planes, hmax, vmax)


# ---------------------------------------------------------------------------
# Encoder (4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, magnitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def _encode_block(bw, plane, by, bx, q, dc_enc, ac_enc, pred):
    block = plane[by : by + 8, bx : bx + 8] - 128.0
    coef = _DCT @ block @ _DCT.T
    zz = np.round(coef.reshape(-1)[_ZIGZAG] / q[_ZIGZAG]).astype(np.int32)
    diff = int(zz[0]) - pred
    size, mag = _mag_bits(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(mag, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0 and k > last_nz:
            code, length = ac_enc[0x00]  # EOB
            bw.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, mag = _mag_bits(v)
        code, length = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(mag, size)
        run = 0
    return int(zz[0])


# Single generous Huffman spec for progressive scans: every (run, size)
# symbol the scans can emit (r 0..15, s 0..11 — s=11 covers DC diffs), all
# at code length 8 (192 codes; canonical, no all-ones code). Compression is
# irrelevant for fixtures; what matters is that EOB-run symbols (r<<4|0,
# r=1..14) exist, which the Annex K baseline tables lack.
_PROG_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 192, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(12)],
)


class _ProgRun:
    """EOB-run + buffered-correction-bit state shared across blocks of one
    progressive AC scan (libjpeg jcphuff emit_eobrun/BE buffer)."""

    def __init__(self, bw: "_BitWriter", enc: dict):
        self.bw = bw
        self.enc = enc
        self.eobrun = 0
        self.bits: list[int] = []  # correction bits owed to run members

    def flush(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.enc[nbits << 4]
            self.bw.write(code, length)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def add_block(self, bits: list[int]):
        self.eobrun += 1
        self.bits.extend(bits)
        if self.eobrun == 0x7FFF or len(self.bits) > 900:
            self.flush()


def _prog_block_coefs(plane, q):
    """(ph, pw) padded plane -> (bh, bw, 64) quantized zigzag coefficients."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    out = np.empty((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            out[by, bx] = np.round(coef.reshape(-1)[_ZIGZAG] / q[_ZIGZAG]).astype(np.int32)
    return out


def _emit_ac_first_scan(bw, enc, grid, ss, se, al):
    """Progressive AC first scan (Ah=0) over one component's blocks in
    raster order: T.81 G.1.2.2 with cross-block EOB runs."""
    run = _ProgRun(bw, enc)
    bh, bw_blocks = grid.shape[0], grid.shape[1]
    for by in range(bh):
        for bx in range(bw_blocks):
            zz = grid[by, bx]
            r = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(zz[k])
                a = abs(v) >> al
                if a == 0:
                    r += 1
                    continue
                run.flush()  # pending EOB run ends before this block's data
                while r > 15:
                    code, length = enc[0xF0]
                    bw.write(code, length)
                    r -= 16
                size, mag = _mag_bits(a if v > 0 else -a)
                code, length = enc[(r << 4) | size]
                bw.write(code, length)
                bw.write(mag, size)
                r = 0
                emitted = True
            if r > 0 or not emitted:
                run.add_block([])  # trailing zeros (or empty block) join the run
    run.flush()


def _emit_ac_refine_scan(bw, enc, grid, ss, se, al):
    """Progressive AC refinement scan (Ah=Al+1): libjpeg jcphuff
    encode_mcu_AC_refine — newly-significant (r<<4|1) symbols with a FIFO
    of correction bits for already-significant coefficients."""
    run = _ProgRun(bw, enc)
    bh, bw_blocks = grid.shape[0], grid.shape[1]
    for by in range(bh):
        for bx in range(bw_blocks):
            zz = grid[by, bx]
            absvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            # position (band-relative) of the last newly-significant coef
            eob_rel = -1
            for i, a in enumerate(absvals):
                if a == 1:
                    eob_rel = i
            r = 0
            pending: list[int] = []  # correction bits since last symbol
            for i, a in enumerate(absvals):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob_rel:
                    run.flush()
                    code, length = enc[0xF0]
                    bw.write(code, length)
                    r -= 16
                    for b in pending:
                        bw.write(b, 1)
                    pending = []
                if a > 1:  # already significant: one correction bit
                    pending.append(a & 1)
                    continue
                # newly significant
                run.flush()
                code, length = enc[(r << 4) | 1]
                bw.write(code, length)
                bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                for b in pending:
                    bw.write(b, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                run.add_block(pending)
    run.flush()


def make_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes, 4:4:4.

    Scan script exercises every progressive decode path: interleaved DC
    first (Al=1) + DC refinement, split spectral bands for luma, AC first
    scans at Al=1, and AC refinement scans down to Al=0. Uses the same
    quantization as ``make_jpeg``, so a fully refined progressive file
    reconstructs pixel-identically to its baseline twin (pinned in
    tests/test_ops_spark.py)."""
    h, w, _ = pixels.shape
    px = pixels.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    grids = [_prog_block_coefs(pad(p), q)
             for p, q in ((y, qy), (cb, qc), (cr, qc))]
    _, enc = _canonical_codes(*_PROG_SPEC)
    bh, bw_blocks = grids[0].shape[0], grids[0].shape[1]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])  # Td=0 / Ta=0 -> _PROG_SPEC tables
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc[_ZIGZAG].astype(np.uint8)))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    spec_bits, spec_vals = _PROG_SPEC
    out += seg(0xC4, bytes([0x00]) + bytes(spec_bits[1:]) + bytes(spec_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(spec_bits[1:]) + bytes(spec_vals))

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_blocks):
            for ci in range(3):
                v = int(grids[ci][by, bx, 0]) >> 1
                size, mag = _mag_bits(v - preds[ci])
                preds[ci] = v
                code, length = enc[size]
                bw.write(code, length)
                if size:
                    bw.write(mag, size)
    bw.flush()
    out += sos([0, 1, 2], 0, 0, 0, 1) + bytes(bw.out)

    # scan 2: DC refinement (raw bits, one per block, interleaved)
    bw = _BitWriter()
    for by in range(bh):
        for bx in range(bw_blocks):
            for ci in range(3):
                bw.write(int(grids[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += sos([0, 1, 2], 0, 0, 1, 0) + bytes(bw.out)

    # scans 3-6: AC first at Al=1 (luma split into two spectral bands)
    for ci, ss, se in ((0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)):
        bw = _BitWriter()
        _emit_ac_first_scan(bw, enc, grids[ci], ss, se, 1)
        bw.flush()
        out += sos([ci], ss, se, 0, 1) + bytes(bw.out)

    # scans 7-9: AC refinement down to full precision
    for ci in (0, 1, 2):
        bw = _BitWriter()
        _emit_ac_refine_scan(bw, enc, grids[ci], 1, 63, 0)
        bw.flush()
        out += sos([ci], 1, 63, 1, 0) + bytes(bw.out)

    return out + b"\xff\xd9"


def make_jpeg(pixels: np.ndarray, quality: int = 90, subsampling: str = "444",
              restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes. ``subsampling`` is
    '444' (one 8x8 block per component per MCU) or '420' (2x2 luma blocks
    + mean-downsampled chroma); ``restart_interval`` > 0 emits DRI/RSTn."""
    h, w, _ = pixels.shape
    px = pixels.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    _, dc_l = _canonical_codes(*_DC_LUMA_SPEC)
    _, ac_l = _canonical_codes(*_AC_LUMA_SPEC)
    _, dc_c = _canonical_codes(*_DC_CHROMA_SPEC)
    _, ac_c = _canonical_codes(*_AC_CHROMA_SPEC)
    if subsampling == "444":
        hs = vs = 1
    elif subsampling == "420":
        hs = vs = 2
    else:
        raise ValueError(f"subsampling {subsampling!r}")
    mcu = 8 * hs
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    yp = pad(y)
    if hs == 2:
        cbp = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cbp, crp = pad(cb), pad(cr)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(0, ph, mcu):
        for mx in range(0, pw, mcu):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    preds[0] = _encode_block(
                        bw, yp, my + by * 8, mx + bx * 8, qy, dc_l, ac_l, preds[0])
            preds[1] = _encode_block(bw, cbp, my // vs, mx // hs, qc, dc_c, ac_c, preds[1])
            preds[2] = _encode_block(bw, crp, my // vs, mx // hs, qc, dc_c, ac_c, preds[2])
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(values)

    samp = (hs << 4) | vs
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc[_ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += seg(0xC4, dht(0, 0, _DC_LUMA_SPEC))
    out += seg(0xC4, dht(1, 0, _AC_LUMA_SPEC))
    out += seg(0xC4, dht(0, 1, _DC_CHROMA_SPEC))
    out += seg(0xC4, dht(1, 1, _AC_CHROMA_SPEC))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bytes(bw.out) + b"\xff\xd9"
    return out
