"""Minimal pure-Python PIL.Image stand-in (stdlib only) for offline
contract tests of the REAL-codec path in plans/multimodal.py.

Pillow cannot install in this sandbox (no network egress — see
tests/test_multimodal_codecs.py), so this implements just enough of the
``PIL.Image`` surface that decode_image_real / resize_image_real use:
``open`` / ``new`` / ``load`` / ``width`` / ``height`` / ``getbands`` /
``format`` / ``resize`` / ``save`` — over a REAL (if tiny) codec: 8-bit
RGB PNG, filter-0 scanlines, zlib IDAT, CRC-checked chunks.  Bytes it
writes are valid PNG (readable by any real decoder); bytes it reads
must be PNG it (or Pillow, for filter-0 images) produced.
"""

from __future__ import annotations

import io
import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


class FakeImage:
    def __init__(self, width: int, height: int, pixels: list, fmt=None):
        # pixels: row-major list of (r, g, b) tuples, len == w*h
        self.width = width
        self.height = height
        self._pixels = pixels
        self.format = fmt

    # --- PIL.Image surface used by the plans ---------------------------
    def load(self):
        return self

    def getbands(self):
        return ("R", "G", "B")

    def resize(self, size):
        w2, h2 = size
        out = []
        for y in range(h2):
            sy = min(self.height - 1, (y * self.height) // h2)
            row = sy * self.width
            for x in range(w2):
                sx = min(self.width - 1, (x * self.width) // w2)
                out.append(self._pixels[row + sx])
        return FakeImage(w2, h2, out)

    def save(self, fp, format="PNG"):
        if format != "PNG":
            raise ValueError("fake codec writes PNG only")
        raw = bytearray()
        for y in range(self.height):
            raw.append(0)  # filter type 0 (None)
            for x in range(self.width):
                raw.extend(self._pixels[y * self.width + x])
        ihdr = struct.pack(
            ">IIBBBBB", self.width, self.height, 8, 2, 0, 0, 0
        )
        fp.write(
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def new(mode: str, size: tuple, color=(0, 0, 0)) -> FakeImage:
    if mode != "RGB":
        raise ValueError("fake codec supports RGB only")
    w, h = size
    return FakeImage(w, h, [tuple(color)] * (w * h))


def open(fp) -> FakeImage:  # noqa: A001 - mirrors PIL.Image.open
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc[0] != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError("bad CRC")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(
                ">IIBB", payload[:10]
            )
            if (depth, ctype) != (8, 2):
                raise ValueError("fake codec reads 8-bit RGB only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + 3 * width
    pixels = []
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("fake codec reads filter-0 scanlines only")
        pixels.extend(
            tuple(row[1 + 3 * x : 4 + 3 * x]) for x in range(width)
        )
    return FakeImage(width, height, pixels, fmt="PNG")
