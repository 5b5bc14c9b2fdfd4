"""Pure-stdlib PNG codec: real image decode without PIL/ffmpeg.

The container has no media libraries, but PNG needs only ``zlib`` + ``struct``
(both stdlib), so the image-decode step of the multimodal pipeline can be
REAL, not a stub: parse the signature/IHDR for dimensions, inflate + unfilter
IDAT for pixels, nearest-neighbor resample, and re-encode. The encoder also
generates deterministic test fixtures, so the decode branch is exercised in
any environment.

Scope: 8-bit greyscale/RGB/RGBA (color types 0/2/6), non-interlaced — the
shapes a training-data pipeline normalizes to anyway. PIL, when present,
remains the fallback for everything else (see ops/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels`` bytes)
    as a valid PNG. ``filter_type`` applies the same PNG filter to every row
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) — useful for exercising every
    unfilter branch of the decoder from tests."""
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    prev = bytes(stride)
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw.extend(_filter_row(row, prev, channels, filter_type))
        prev = row
    idat = zlib.compress(bytes(raw), 9)
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _filter_row(row: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def parse_ihdr(payload: bytes) -> tuple[int, int, int]:
    """Signature + IHDR → (width, height, channels). This is what real
    metadata extraction does — dimensions come from the header, no pixel
    inflation needed."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    length, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("first chunk is not a valid IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    return width, height, _CHANNELS[color_type]


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: (width, height, channels, raw pixel bytes row-major).

    Real work: walk chunks, inflate concatenated IDAT, undo per-row filters
    (all five PNG filter types). 8-bit depth, non-interlaced only."""
    width, height, channels = parse_ihdr(payload)
    bit_depth, color_type, _c, _f, interlace = struct.unpack(">BBBBB", payload[24:29])
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8 only)")
    if interlace != 0:
        raise ValueError("interlaced PNGs not supported")
    if color_type == 3:
        raise ValueError("palette PNGs not supported")
    idat = bytearray()
    off = 8
    while off < len(payload):
        length, tag = struct.unpack(">I4s", payload[off : off + 8])
        if tag == b"IDAT":
            idat.extend(payload[off + 8 : off + 8 + length])
        elif tag == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ft == 0:
                pass
            elif ft == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + (a + b) // 2) & 0xFF
            elif ft == 4:
                row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter {ft}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, target_w: int, target_h: int
) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer."""
    out = bytearray(target_w * target_h * channels)
    for ty in range(target_h):
        sy = min(height - 1, ty * height // target_h)
        for tx in range(target_w):
            sx = min(width - 1, tx * width // target_w)
            src = (sy * width + sx) * channels
            dst = (ty * target_w + tx) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)
