"""Dependency-free image codec: PPM (P6/P3) and 24-bit uncompressed BMP.

This container ships no codec libraries (no PIL), but `decode_image`
(multimodal.py) takes an injected decoder — these two formats are simple
enough to parse straight from their public specs in pure Python, so the
*real* decode path of `extract_features` can be exercised end-to-end:
payload bytes → decoded dimensions + pixel statistics flowing into the
feature schema. On a real cluster you'd inject PIL/torchvision instead;
the contract is identical.

Both decoders return row-major, top-down RGB. Encoders exist so tests can
manufacture valid payloads without fixtures on disk.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class DecodedImage:
    width: int
    height: int
    pixels: bytes  # row-major top-down RGB triples, len == width*height*3

    def mean_luma(self) -> float:
        """Rec.601 luma averaged over all pixels (0..255 scale)."""
        n = self.width * self.height
        if n == 0:
            return 0.0
        px = self.pixels
        r = sum(px[0::3])
        g = sum(px[1::3])
        b = sum(px[2::3])
        return (0.299 * r + 0.587 * g + 0.114 * b) / n


# ---------------------------------------------------------------------------
# PPM — netpbm "P6" (binary) and "P3" (ascii), maxval <= 255.
# Header tokens are whitespace-separated; '#' starts a comment to EOL.
# ---------------------------------------------------------------------------


def _ppm_tokens(payload: bytes, n: int, start: int) -> tuple[list[bytes], int]:
    toks: list[bytes] = []
    i = start
    size = len(payload)
    while len(toks) < n and i < size:
        c = payload[i : i + 1]
        if c == b"#":
            while i < size and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < size and not payload[j : j + 1].isspace() and payload[j : j + 1] != b"#":
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < n:
        raise ValueError("ppm: truncated header")
    return toks, i


def decode_ppm(payload: bytes) -> DecodedImage:
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError("ppm: bad magic")
    binary = payload[:2] == b"P6"
    (w_tok, h_tok, max_tok), i = _ppm_tokens(payload, 3, 2)
    width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    need = width * height * 3
    if binary:
        # exactly one whitespace byte separates header from raster
        raster = payload[i + 1 : i + 1 + need]
        if len(raster) != need:
            raise ValueError("ppm: truncated raster")
    else:
        vals, _ = _ppm_tokens(payload, need, i)
        raster = bytes(int(v) for v in vals)
    if maxval != 255:
        raster = bytes(v * 255 // maxval for v in raster)
    return DecodedImage(width, height, raster)


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


# ---------------------------------------------------------------------------
# BMP — BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed).
# Pixel rows are 4-byte aligned, stored bottom-up (positive height) in BGR.
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> DecodedImage:
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    if len(payload) < 34:
        # struct.unpack_from on a shorter buffer raises struct.error, which
        # is NOT a ValueError — normalize truncation to the decoder's
        # documented rejection type
        raise ValueError("bmp: truncated header")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height_raw) = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24bpp BI_RGB supported (bpp={bpp})")
    bottom_up = height_raw > 0
    height = abs(height_raw)
    if not (0 < width <= 1 << 15 and 0 < height <= 1 << 15):
        # a corrupt header can declare gigapixel dimensions; allocating the
        # raster before validating would raise MemoryError and kill the
        # executor instead of rejecting the row
        raise ValueError(f"bmp: implausible dimensions {width}x{height_raw}")
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = (height - 1 - row) if bottom_up else row
        base = data_off + src_row * stride
        line = payload[base : base + width * 3]
        if len(line) != width * 3:
            raise ValueError("bmp: truncated raster")
        dst = row * width * 3
        for x in range(width):
            out[dst + 3 * x] = line[3 * x + 2]      # R <- B position
            out[dst + 3 * x + 1] = line[3 * x + 1]  # G
            out[dst + 3 * x + 2] = line[3 * x]      # B <- R position
    return DecodedImage(width, height, bytes(out))


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(width):
            r = pixels[(row * width + x) * 3]
            g = pixels[(row * width + x) * 3 + 1]
            b = pixels[(row * width + x) * 3 + 2]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - width * 3)
        raster += line
    data_off = 14 + 40
    file_size = data_off + len(raster)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return file_hdr + dib + bytes(raster)


def decode_any(payload: bytes) -> DecodedImage:
    """Magic-sniffing decoder — the injectable for `decode_image`."""
    if payload[:2] in (b"P6", b"P3"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unknown image format (PPM/BMP supported)")
