"""Stdlib-only image codec: PPM (P6) and BMP (24-bit uncompressed).

The container has no Pillow, so the multimodal real-decode branch could
never execute in-sandbox (round-3 verdict).  These two formats are
decodable with ``struct`` + numpy alone — headers are trivial, pixels
are raw RGB — which makes the REAL decode/resize path (bytes in →
dimensions/pixels out → resized bytes) executable and testable
everywhere, while Pillow remains the preferred backend when installed
(broader formats, fast C resampling).

Formats:
- PPM P6 (Netpbm binary): ``P6 <w> <h> <maxval>\\n`` + raw RGB rows.
  maxval must be 255 (the common case; 16-bit PPMs are rejected).
- BMP (Windows V3+): 14-byte file header + >=40-byte
  BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed), bottom-up rows
  padded to 4 bytes; pixels stored BGR.

Decoded pixels are ``numpy uint8 (h, w, 3)`` RGB.  Resize is
nearest-neighbor via numpy fancy indexing (one vectorized gather — no
per-pixel Python), which is deterministic and dependency-free; real
deployments that need better filters install Pillow and never hit
this module.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageCodecError(ValueError):
    """Unsupported or malformed image payload."""


def sniff(payload: bytes) -> str | None:
    """'ppm' / 'bmp' when this module can decode the payload, else None."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


# -- PPM ---------------------------------------------------------------------

def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, pixel_offset); comments (#...) allowed."""
    if payload[:2] != b"P6":
        raise ImageCodecError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace + comment lines
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ImageCodecError("truncated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ImageCodecError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    return fields[0], fields[1], fields[2], pos + 1  # ONE ws after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    w, h, maxval, off = _ppm_header(payload)
    if maxval != 255:
        raise ImageCodecError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    px = payload[off:off + need]
    if len(px) < need:
        raise ImageCodecError("truncated PPM pixel data")
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()


# -- BMP ---------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ImageCodecError("not a BMP")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ImageCodecError("pre-V3 BMP header unsupported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ImageCodecError(
            f"only 24bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3            # rows padded to 4 bytes
    need = stride * h
    px = payload[pixel_off:pixel_off + need]
    if len(px) < need:
        raise ImageCodecError("truncated BMP pixel data")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()        # BGR -> RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.ascontiguousarray(rgb[:, :, ::-1], dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    px = rows[::-1].tobytes()            # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                       2835, 2835, 0, 0)
    return header + info + px


# -- shared surface ----------------------------------------------------------

def decode(payload: bytes) -> np.ndarray:
    """RGB (h, w, 3) uint8 array for any format this module sniffs."""
    kind = sniff(bytes(payload))
    if kind == "ppm":
        return decode_ppm(bytes(payload))
    if kind == "bmp":
        return decode_bmp(bytes(payload))
    raise ImageCodecError("unsupported format (PPM P6 / 24bpp BMP only)")


def resize_nearest(rgb: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample: one vectorized gather (pixel-center
    sampling, matching the conventional floor((i + .5) * src/dst))."""
    h, w = rgb.shape[:2]
    yi = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return rgb[yi[:, None], xi[None, :]]
