"""Pure-NumPy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public).

Decoder: baseline sequential DCT, Huffman entropy coding, 8-bit
samples, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling,
restart intervals, JFIF full-range color conversion.  Progressive,
arithmetic-coded, and 12-bit streams raise ``ValueError`` (per-row
failure at pipeline scale, never per-job).

Encoder: baseline 4:4:4 (or grayscale) with the spec's Annex-K example
quantization and Huffman tables, quality-scaled per the widely
published IJG curve — enough to synthesize real `.jpg` fixtures and
round-trip tests without any external library.

Scale note: this decode runs inside the same Arrow ``mapInPandas``
stage as the PNG/FIMG paths (`multimodal.decode_image`); cost is
NumPy-vectorized per block except the inherently serial Huffman scan.
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

# ------------------------------------------------------------- constants
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K example tables (luminance / chrominance), zigzag order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99]).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

# Annex K typical Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_C = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None]
            * np.pi / 16)
_ALPHA = np.full(8, np.sqrt(2.0 / 8.0))
_ALPHA[0] = np.sqrt(1.0 / 8.0)
DCT_M = _ALPHA[:, None] * _C          # forward:  F = M @ f @ M.T


def _fdct(block: np.ndarray) -> np.ndarray:
    return DCT_M @ block @ DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return DCT_M.T @ coef @ DCT_M


# -------------------------------------------------------- Huffman helpers
def _build_decode_table(bits, values) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol for a canonical Huffman table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # real marker: pad with zeros
                self.acc = (self.acc << 8) | byte
                self.nbits += 8
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | byte
                self.nbits += 8
        while self.nbits <= 24:
            self.acc = (self.acc << 8) | 0
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.take(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def sync_restart(self):
        """Skip to just past the next RST marker and reset bit state."""
        d = self.data
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: missing restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a size-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, HxWxC uint8) from a baseline JPEG byte string.

    Per-row failure contract: every corrupt/truncated/unsupported input
    raises ``ValueError`` (callers catch exactly that); short segment
    bodies that would surface as ``struct.error`` are re-raised."""
    try:
        return _decode_jpeg(payload)
    except struct.error as e:
        raise ValueError(f"JPEG: truncated segment ({e})") from e


def _decode_jpeg(payload: bytes) -> Tuple[dict, np.ndarray]:
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame = None
    restart = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: lengthless — a premature one just
            break          # ends the walk (fail-loud below if no SOS)
        if pos + 2 > n:    # truncated where a length segment belongs:
            # keep the documented per-row contract (ValueError, never
            # struct.error) for callers that catch ValueError only
            raise ValueError("JPEG: truncated marker segment")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables "
                                     "unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[bp:bp + 64],
                                            dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                bp += 64
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1:bp + 17])
                cnt = sum(bits)
                vals = list(body[bp + 17:bp + 17 + cnt])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                bp += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), \
                body[5]
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(
                    f"JPEG: {nc}-component frames (CMYK/YCCK) "
                    "unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: non-baseline frame (marker 0xFF{marker:02X}) "
                "unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan[cid] = (tt >> 4, tt & 0xF)
            pos = pos + seglen
            return _decode_scan(payload, pos, frame, scan, qt, huff_dc,
                                huff_ac, restart)
        pos += seglen
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = br.huff(huff_dc[dc_t])
                        diff = _extend(br.take(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(huff_ac[ac_t])
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index "
                                                 "overflow")
                            zz[k] = _extend(br.take(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * qt[c["tq"]]
                        sp = _idct(blk) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = sp
            mcu_count += 1
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[..., None]
        ncomp = 1
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                     255).astype(np.uint8)
        ncomp = 3
    meta = {"format": "JPEG", "width": int(frame["w"]),
            "height": int(frame["h"]), "channels": ncomp,
            "n_bytes": len(payload)}
    return meta, px


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl.astype(np.int64) * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw, block, quant, dc_enc, ac_enc, pred):
    coef = _fdct(block - 128.0)
    q = np.round(coef / quant).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _size_cat(diff)
    code, length = dc_enc[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.put(code, length)
            run -= 16
        s = _size_cat(v)
        code, length = ac_enc[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_enc[0x00]
        bw.put(code, length)
    return int(zz[0])


def _pad_to(p: np.ndarray, hh: int, ww: int) -> np.ndarray:
    out = np.empty((hh, ww), dtype=np.float64)
    h, w = p.shape
    out[:h, :w] = p
    if hh > h:
        out[h:, :w] = p[-1:, :]
    if ww > w:
        out[:, w:] = out[:, w - 1:w]
    return out


def encode_jpeg(px: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encode of an (H, W[, C]) uint8 array, C in
    {1, 3}.  ``subsampling``: '444' (one luma block per MCU) or '420'
    (2x2 luma + mean-downsampled chroma).  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs —
    exercises the decoder's resync path (and is what real encoders do
    so a corrupt scan loses one interval, not the image)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"JPEG: cannot encode {c}-channel raster")
    if subsampling not in ("444", "420"):
        raise ValueError("JPEG: subsampling must be '444' or '420'")
    sub = subsampling == "420" and c == 3
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if c == 3:
        f = px.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] \
            + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] \
            - 0.081312 * f[..., 2]
        if sub:
            he, we = h + (h & 1), w + (w & 1)
            cb = _pad_to(cb, he, we).reshape(he // 2, 2, we // 2, 2) \
                .mean(axis=(1, 3))
            cr = _pad_to(cr, he, we).reshape(he // 2, 2, we // 2, 2) \
                .mean(axis=(1, 3))
        planes = [y, cb, cr]
        quants = [ql, qc, qc]
        tq = [0, 1, 1]
        hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [px[..., 0].astype(np.float64)]
        quants = [ql]
        tq = [0]
        hv = [(1, 1)]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xFF\xD8")
    dqt = bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, dqt)
    if c == 3:
        out += seg(0xDB, bytes([1])
                   + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([c])
    for ci in range(c):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], tq[ci]])
    out += seg(0xC0, sof)
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if c == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([c])
    for ci in range(c):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    dc_enc = [_build_encode_table(*DC_LUMA)] + \
        [_build_encode_table(*DC_CHROMA)] * 2
    ac_enc = [_build_encode_table(*AC_LUMA)] + \
        [_build_encode_table(*AC_CHROMA)] * 2
    hmax = max(x for x, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to(planes[ci], mcuy * hv[ci][1] * 8, mcux * hv[ci][0] * 8)
        for ci in range(c)]
    bw = _BitWriter()
    pred = [0] * c
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * c
            for ci in range(c):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, quants[ci], dc_enc[ci],
                            ac_enc[ci], pred[ci])
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)
