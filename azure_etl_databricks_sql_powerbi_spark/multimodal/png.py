"""Minimal pure-stdlib PNG codec (zlib + struct) for 8-bit RGB/RGBA.

This container has no image libraries (no PIL, no libjpeg bindings) and
installs are not allowed, but PNG's pixel stream is just zlib — which IS
in the stdlib — behind per-scanline difference filters. So a real,
deterministic decode path for the multimodal operators needs ~100 lines,
no fakes: parse chunks, inflate IDAT, undo filters 0-4. The encoder
(filter-0, 8-bit RGB) exists so tests and contract queries can generate
real PNGs to decode end-to-end.

Scope is deliberately the subset the engine generates: 8-bit depth,
color types 2 (RGB) / 6 (RGBA), no interlace. Anything else raises
``NotImplementedError`` loudly — same contract as the optional PIL path
in ``multimodal.ops._decode_image`` (which remains preferred when PIL is
importable, e.g. on a real cluster image).
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, rgb: bytes, compress_level: int = 6
) -> bytes:
    """8-bit RGB PNG, filter 0 every scanline. ``rgb`` is w*h*3 bytes,
    row-major. ``compress_level=0`` emits stored (uncompressed) deflate
    blocks — still a fully valid PNG, with the property that the total
    byte length is pure arithmetic (``encoded_png_size``), which lets a
    SQL oracle verify real generated-image byte sizes."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def encoded_png_size(width: int, height: int) -> int:
    """Exact byte length of ``encode_png(width, height, _,
    compress_level=0)``: signature 8 + IHDR 25 + IDAT (12 + zlib stored:
    2 header + 5/block + raw + 4 adler) + IEND 12, raw = height *
    (1 + 3*width) filtered scanlines."""
    raw = height * (1 + 3 * width)
    n_blocks = max(1, (raw + 65534) // 65535)
    return 8 + 25 + (12 + 2 + 5 * n_blocks + raw + 4) + 12


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode to ``(width, height, channels, pixels)`` — pixels row-major,
    ``channels`` 3 (RGB) or 4 (RGBA). Supports filters 0-4, 8-bit depth,
    no interlace."""
    if data[:8] != SIGNATURE:
        raise NotImplementedError("not a PNG payload")
    pos, idat = 8, bytearray()
    w = h = ch = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG variant: depth={depth} color={ctype} "
                    f"interlace={interlace} (8-bit RGB/RGBA only)"
                )
            ch = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("unexpected PNG pixel-stream length")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise NotImplementedError(f"unknown PNG filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)
