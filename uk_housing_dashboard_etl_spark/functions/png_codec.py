"""Minimal pure-Python PNG codec (stdlib zlib + numpy).

Implements the subset of the W3C PNG specification (RFC 2083) needed to
make the multimodal decode path REAL in an environment without
Pillow/libjpeg: 8-bit depth, color types 0 (grayscale), 2 (RGB) and
6 (RGBA), all five scanline filter types (None/Sub/Up/Average/Paeth),
non-interlaced. Used per Arrow batch inside ``mapInPandas`` — the codec
itself is single-image; parallelism comes from Spark partitioning.

The encoder exists for tests and fixtures: it can emit any supported
filter type so the decoder's unfiltering paths are all exercised by
round-trips against numpy ground truth.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel

MAX_DECODED_BYTES = 128 * 1024 * 1024
"""Ceiling on IHDR-implied raw scanline bytes (~128 MB ≈ a 5600² RGBA
frame): zip-bomb IDATs and absurd declared dimensions fail as PngError
instead of allocating executor-killing buffers."""


class PngError(ValueError):
    """Raised for malformed or unsupported PNG payloads."""


def sniff_format(payload: bytes) -> str:
    """Cheap magic-byte sniff: 'png', 'bmp', 'jpeg', 'webp' or 'unknown'."""
    if payload[:8] == PNG_SIGNATURE:
        return "png"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch decode by sniffed format: PNG and 24-bit BMP are real
    pure-Python paths; everything else raises."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise PngError(f"no pure-Python decoder for format {fmt!r}")


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG byte string to a (height, width, channels) uint8 array.

    Supports bit depth 8, color types 0/2/6, no interlacing. Raises
    :class:`PngError` on anything else — the caller decides whether that
    is a hard failure or a null row.
    """
    if payload[:8] != PNG_SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise PngError("bad IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = height * (stride + 1)
    # Reject absurd dimensions BEFORE inflating and bound the inflate to
    # the IHDR-implied size: a tiny zip-bomb IDAT (or a crafted huge
    # IHDR) must raise PngError — which on_error='null' survives — not
    # MemoryError an executor dies on.
    if expected > MAX_DECODED_BYTES:
        raise PngError(
            f"refusing {width}x{height}x{ch} decode: {expected} bytes "
            f"exceeds MAX_DECODED_BYTES={MAX_DECODED_BYTES}"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if d.unconsumed_tail or len(raw) != expected:
        raise PngError("decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    scans = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        out[y] = _unfilter_row(
            filters[y], scans[y], out[y - 1] if y else np.zeros(stride, np.int32), ch
        )
    return out.astype(np.uint8).reshape(height, width, ch)


def _unfilter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """Reverse one scanline filter (PNG spec §6). ``row`` is int32."""
    if ftype == 0:  # None
        return row % 256
    out = np.empty_like(row)
    if ftype == 2:  # Up — vectorizable, no intra-row dependency
        return (row + prev) % 256
    for i in range(len(row)):
        a = out[i - ch] if i >= ch else 0  # left
        b = prev[i]  # up
        c = prev[i - ch] if i >= ch else 0  # upper-left
        if ftype == 1:  # Sub
            pred = a
        elif ftype == 3:  # Average
            pred = (a + b) // 2
        elif ftype == 4:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[i] = (row[i] + pred) % 256
    return out


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) or (h, w, {1,3,4}) uint8 array as PNG bytes.

    ``filter_type`` applies the same filter to every scanline so tests can
    exercise each decoder unfiltering path. Deterministic output (fixed
    zlib level 6, no ancillary chunks).
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise PngError(f"unsupported channel count {ch}")
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        lines.append(filter_type)
        lines.extend(_filter_row(filter_type, flat[y], prev, ch).astype(np.uint8).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """Apply one scanline filter (forward direction) for the encoder."""
    if ftype == 0:
        return row % 256
    if ftype == 2:
        return (row - prev) % 256
    out = np.empty_like(row)
    for i in range(len(row)):
        a = row[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ftype == 1:
            pred = a
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[i] = (row[i] - pred) % 256
    return out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → (h, w) float32 luma in [0, 1] (Rec. 601)."""
    img = img.astype(np.float32)
    if img.shape[2] == 1:
        return img[:, :, 0] / 255.0
    return (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ) / 255.0


def resize_nearest(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a 2D array via index striding."""
    h, w = gray.shape
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return gray[np.ix_(ys, xs)]


# --------------------------------------------------------------- BMP
# 24-bit uncompressed Windows BMP (BITMAPINFOHEADER): the third real
# codec next to PNG and WAV — pure struct + numpy, no native libs.


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (height, width, 3) uint8 RGB.

    Handles the standard bottom-up row order, 4-byte row padding and
    BGR channel layout. Raises :class:`PngError` (shared codec error
    type) on other bit depths / compressed variants.
    """
    if payload[:2] != b"BM":
        raise PngError("not a BMP: bad signature")
    if len(payload) < 54:
        raise PngError("truncated BMP header")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size = struct.unpack("<I", payload[14:18])[0]
    if header_size < 40:
        raise PngError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise PngError(f"unsupported BMP: {bpp}-bit compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + stride * height
    if len(payload) < need:
        raise PngError("truncated BMP pixel data")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    bgr = raw[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise PngError("encode_bmp needs (h, w, 3) RGB")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pixel_bytes = rows.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_bytes), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes),
                      2835, 2835, 0, 0)
    )
    return header + pixel_bytes
