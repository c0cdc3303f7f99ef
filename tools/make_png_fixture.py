#!/usr/bin/env python3
"""Writes the committed PNG decode fixture (pure-python encoder, no PIL):
a 16x9 RGB gradient whose pixel values are a closed form of (x, y), so
the JVM-side javax.imageio decode in MultimodalSpec is verified against
an INDEPENDENT encoder implementation (python zlib here vs ImageIO's
PNG plugin there) — not against itself.

Pixel law (kept in sync with MultimodalSpec's expected values):
  r = (7x + 13y) % 256, g = (3x + 101) % 256, b = (11y + 29) % 256

Usage: python3 tools/make_png_fixture.py
Prints the expected (width, height, pixel_sum) triple the spec asserts.
"""
import struct
import zlib

W, H = 16, 9


def chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def main() -> None:
    raw = bytearray()
    total = 0
    for y in range(H):
        raw.append(0)  # filter type None per scanline
        for x in range(W):
            r = (7 * x + 13 * y) % 256
            g = (3 * x + 101) % 256
            b = (11 * y + 29) % 256
            raw += bytes((r, g, b))
            total += r + g + b
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
           + chunk(b"IEND", b""))
    out = "src/test/resources/graft/gradient.png"
    with open(out, "wb") as f:
        f.write(png)
    print(f"wrote {out}: width={W} height={H} pixel_sum={total}")


if __name__ == "__main__":
    main()
