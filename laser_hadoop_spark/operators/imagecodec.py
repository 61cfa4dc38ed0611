"""Pure-numpy image codecs for the multimodal decode kernels (L5).

The container has no image libraries (no Pillow/OpenCV, and installs are
out of scope), but the decode path is REAL: actual bytes in, actual
(h, w, c) uint8 rasters out.

Supported:
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters; no interlace.
- BMP: uncompressed 24/32-bit BITMAPINFOHEADER.
- PPM/PGM: binary P6/P5, maxval 255.
- JPEG: baseline sequential (SOF0) incl. chroma subsampling and restart
  markers, via operators/jpegcodec.py; progressive stays unsupported.
- encode_png: filter-0 8-bit encoder (test fixtures + png sink kernel).

Reference for PNG structure: the public PNG specification (RFC 2083) —
chunk layout, filter definitions, Paeth predictor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> raw channels


class UnsupportedImage(NotImplementedError):
    """Format/feature outside the pure-numpy codec's envelope (e.g.
    progressive JPEG)."""


def sniff_format(data: bytes) -> str | None:
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


def _paeth_row(prev: np.ndarray, cur: np.ndarray, bpp: int) -> np.ndarray:
    """Paeth unfilter for one scanline (sequential in x by definition)."""
    out = np.empty_like(cur)
    n = len(cur)
    for x in range(n):
        a = int(out[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        out[x] = (int(cur[x]) + pred) & 0xFF
    return out


def _avg_row(prev: np.ndarray, cur: np.ndarray, bpp: int) -> np.ndarray:
    out = np.empty_like(cur)
    for x in range(len(cur)):
        a = int(out[x - bpp]) if x >= bpp else 0
        out[x] = (int(cur[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
    return out


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    """Sub unfilter: recon[x] = raw[x] + recon[x-bpp] — a per-lane
    prefix sum mod 256, vectorized over each byte lane."""
    out = cur.copy()
    if len(out) % bpp == 0:
        lanes = out.reshape(-1, bpp)
        out = (
            (np.cumsum(lanes, axis=0, dtype=np.uint64) & 0xFF)
            .astype(np.uint8)
            .reshape(-1)
        )
    else:  # ragged fallback (shouldn't happen for whole scanlines)
        for x in range(bpp, len(out)):
            out[x] = (int(out[x]) + int(out[x - bpp])) & 0xFF
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (h, w, c) uint8 array."""
    if data[:8] != PNG_MAGIC:
        raise UnsupportedImage("not a PNG signature")
    pos = 8
    idat = bytearray()
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedImage("PNG missing IHDR")
    if bit_depth != 8:
        raise UnsupportedImage(f"PNG bit depth {bit_depth} (only 8 supported)")
    if interlace:
        raise UnsupportedImage("interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedImage(f"PNG color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedImage("PNG IDAT size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        prev = out[y - 1] if y else zero
        f, cur = int(filters[y]), rows[y]
        if f == 0:
            out[y] = cur
        elif f == 1:
            out[y] = _sub_row(cur, channels)
        elif f == 2:
            out[y] = cur + prev  # uint8 wraps mod 256
        elif f == 3:
            out[y] = _avg_row(prev, cur, channels)
        elif f == 4:
            out[y] = _paeth_row(prev, cur, channels)
        else:
            raise UnsupportedImage(f"PNG filter {f}")
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise UnsupportedImage("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise UnsupportedImage("not a BMP signature")
    pix_offset = struct.unpack("<I", data[10:14])[0]
    header_size = struct.unpack("<I", data[14:18])[0]
    if header_size < 40:
        raise UnsupportedImage("BMP core header not supported")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedImage(f"BMP bpp={bpp} compression={compression}")
    flip = height > 0
    height = abs(height)
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3  # rows pad to 4 bytes
    img = np.empty((height, width, nch), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            data, dtype=np.uint8, count=width * nch, offset=pix_offset + y * row_size
        ).reshape(width, nch)
        img[height - 1 - y if flip else y] = row
    return img[:, :, [2, 1, 0]] if nch == 3 else img[:, :, [2, 1, 0, 3]]  # BGR(A)->RGB(A)


def decode_pnm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise UnsupportedImage("only binary P5/P6 PNM supported")
    # header: magic, whitespace/comments, width, height, maxval, 1 ws byte
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise UnsupportedImage(f"PNM maxval {maxval}")
    nch = 3 if magic == b"P6" else 1
    return np.frombuffer(
        data, dtype=np.uint8, count=width * height * nch, offset=pos
    ).reshape(height, width, nch)


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG/BMP/PPM/baseline-JPEG bytes to (h, w, c) uint8.

    Progressive JPEG and unknown formats raise UnsupportedImage."""
    fmt = sniff_format(bytes(data))
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "bmp":
        return decode_bmp(bytes(data))
    if fmt == "pnm":
        return decode_pnm(bytes(data))
    if fmt == "jpeg":
        from laser_hadoop_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(bytes(data))
    raise UnsupportedImage("unrecognized image format")


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit gray/RGB/RGBA, filter 0 every row."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pure index arithmetic, no codec)."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return img[ys][:, xs]
