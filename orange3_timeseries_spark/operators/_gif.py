"""Pure-stdlib GIF codec (GIF89a, public spec): LZW decode/encode,
global/local color tables, multi-frame animation.

This is the VIDEO tier's real container: animated-GIF frames are
palette-indexed and lossless, so — unlike JPEG — decoded pixels are
exactly replayable from a synthesis formula, which lets the driver's
SQL oracle hash-verify the full byte path of frame-sampling and
perceptual video signatures on a real format.

Supported: 8-bit color tables of any size, multiple image blocks
(frames), graphic-control extensions (delay/transparency parsed;
transparency composited over the previous canvas), disposal methods 0/1
(leave in place) and 2 (restore to background).  Interlaced frames and
disposal 3 (restore previous) raise ``ValueError`` — per-row failure at
pipeline scale.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np


# ------------------------------------------------------------------ LZW
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int
                ) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as a list of byte sequences
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table: List[bytes] = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes = b""
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = b""
                continue
            if code == end:
                return out[:n_out]
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev:
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF: corrupt LZW stream")
            take = min(len(entry), n_pixels - n_out)
            out[n_out:n_out + take] = np.frombuffer(
                entry[:take], dtype=np.uint8)
            n_out += take
            if prev:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if n_out >= n_pixels:
                return out[:n_pixels]
    return out[:n_out]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: Dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    outbits = bytearray()
    acc = 0
    nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            outbits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    prev = b""
    for v in indices.tobytes():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        put(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                put(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                width = min_code_size + 1
        prev = bytes([v])
    if prev:
        put(table[prev])
    put(end)
    if nbits:
        outbits.append(acc & 0xFF)
    return bytes(outbits)


# ---------------------------------------------------------------- decoder
def decode_gif(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, (n_frames, H, W, 3) uint8 array) from GIF bytes,
    frames composited onto the logical screen."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames = []
    transparent = None
    disposal = 0
    delays = []
    delay = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:
                size = payload[pos]
                gfl, delay, tidx = struct.unpack(
                    "<BHB", payload[pos + 1:pos + 5])
                disposal = (gfl >> 2) & 0x7
                transparent = tidx if gfl & 1 else None
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("GIF: bad graphic control block")
                pos += 1
            else:  # skip sub-blocks of any other extension
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, ifl = struct.unpack(
                "<HHHHB", payload[pos:pos + 9])
            pos += 9
            if ifl & 0x40:
                raise ValueError("GIF: interlaced frames unsupported")
            ct = gct
            if ifl & 0x80:
                n = 2 << (ifl & 0x07)
                ct = np.frombuffer(payload[pos:pos + 3 * n],
                                   dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: frame without color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), mcs, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("GIF: truncated frame data")
            idx = idx.reshape(fh, fw)
            if disposal == 3:
                raise ValueError("GIF: disposal 'restore previous' "
                                 "unsupported")
            prev_region = canvas[top:top + fh, left:left + fw].copy()
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            if transparent is not None:
                mask = (idx == transparent)[..., None]
                rgb = np.where(mask, prev_region, rgb)
            canvas[top:top + fh, left:left + fw] = rgb
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:
                canvas[top:top + fh, left:left + fw] = \
                    gct[bg] if (gct is not None and bg < len(gct)) else 0
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF: no image data")
    meta = {"format": "GIF", "width": int(w), "height": int(h),
            "n_frames": len(frames),
            "duration_ms": int(sum(delays) * 10)}
    return meta, np.stack(frames)


# ---------------------------------------------------------------- encoder
def encode_gif(frames: np.ndarray, palette: np.ndarray,
               delay_cs: int = 4) -> bytes:
    """GIF89a-encode (n_frames, H, W) palette indices with an
    (N, 3) color table (N a power of two, <= 256).  Full-screen frames,
    disposal 'leave in place'."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None, ...]
    nf, h, w = frames.shape
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("GIF: palette size must be a power of two "
                         "in [2, 256]")
    if frames.size and int(frames.max()) >= n:
        raise ValueError(
            f"GIF: frame index {int(frames.max())} outside the "
            f"{n}-entry palette")
    depth = (n - 1).bit_length()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    # Netscape looping extension (standard for animations)
    if nf > 1:
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for f in frames:
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) \
            + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        data = _lzw_encode(f.reshape(-1), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
