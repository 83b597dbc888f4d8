"""Pure-stdlib PNG codec: real byte-level decode with zero image deps.

This container ships no PIL/ffmpeg, so the engine's REAL image-decode
path (``operators/multimodal.py::decode_real_meta``) would otherwise
never execute in-sandbox. PNG needs only ``zlib`` + ``struct``: the
encoder here emits spec-conformant 8-bit grayscale/RGB PNGs (chunk CRCs,
per-scanline filters) and the decoder parses the chunk stream, inflates
IDAT, and reverses all five scanline filters (None/Sub/Up/Average/Paeth,
PNG spec §9 "Filtering") — so width/height/format come from ACTUAL
bytes, and the recovered pixel sum proves the inflate + unfilter path
end-to-end, oracle-checkable on deterministic synthetic images.

Scope: bit depth 8, color types 0 (grayscale) and 2 (RGB), no
interlacing — the deterministic-synthetic subset the decode gate needs,
not a general imaging library (swap in PIL where the environment has
it; ``operators/multimodal.py`` probes for it first).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Encode raw 8-bit samples (row-major, ``width*height*channels``
    bytes) as a spec-conformant PNG. Scanline filters cycle 0..4 by row
    index so a decode of the result exercises every unfilter branch."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} sample bytes, got {len(pixels)}")
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes((row[x] - (row[x - ch] if x >= ch else 0)) & 0xFF for x in range(stride))
        elif ft == 2:  # Up
            raw += bytes((row[x] - prior[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[x] - ((row[x - ch] if x >= ch else 0) + prior[x]) // 2) & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - ch] if x >= ch else 0,
                        prior[x],
                        prior[x - ch] if x >= ch else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Parse a PNG byte stream: IHDR geometry, inflate IDAT, reverse the
    scanline filters. Returns ``{width, height, bit_depth, color_type,
    n_frames, fmt, pixel_sum}`` — ``n_frames`` from the APNG ``acTL``
    chunk when present (still 1 scanline pass; only the count is read),
    ``pixel_sum`` = sum of all recovered samples (the unfilter proof)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG byte stream")
    pos = 8
    ihdr = None
    idat = bytearray()
    n_frames = 1
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"acTL":
            n_frames = struct.unpack(">I", payload[:4])[0]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match geometry")
    pixel_sum = 0
    prior = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + (a + prior[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prior[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft} on row {y}")
        pixel_sum += sum(line)
        prior = line
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "n_frames": n_frames,
        "fmt": "png",
        "pixel_sum": pixel_sum,
    }
