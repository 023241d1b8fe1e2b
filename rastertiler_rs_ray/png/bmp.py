"""Pure-Python BMP (Windows DIB) encode/decode — the second REAL image
codec in the multimodal registry (next to png.writer).

Scope (classic BITMAPINFOHEADER, the overwhelmingly common on-disk
form): uncompressed (BI_RGB) 8-bit palettized and 24-bit BGR, bottom-up
or top-down row order, 4-byte row padding.  Decode returns grayscale
uint8 (palette/BGR reduced with the same integer BT.601 luma the PNG
path uses), so every image decoder in the registry agrees on output
semantics.

Public spec: the BMP file format is documented in the Windows SDK
(BITMAPFILEHEADER/BITMAPINFOHEADER); no external library involved.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, pixel offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """8-bit palettized BMP with an identity grayscale palette,
    bottom-up rows (the canonical layout)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = img
    pixel_data = rows[::-1].tobytes()  # bottom-up
    palette = bytearray()
    for v in range(256):
        palette += bytes((v, v, v, 0))  # BGRA
    offset = _FILE_HDR.size + _INFO_HDR.size + len(palette)
    info = _INFO_HDR.pack(40, w, h, 1, 8, 0, len(pixel_data), 2835, 2835, 256, 0)
    head = _FILE_HDR.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    return head + info + bytes(palette) + pixel_data


def encode_bmp_bgr24(img_rgb: np.ndarray) -> bytes:
    """24-bit BGR BMP from an (h, w, 3) RGB array, bottom-up rows."""
    img_rgb = np.asarray(img_rgb, dtype=np.uint8)
    h, w, _ = img_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img_rgb[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
    pixel_data = rows[::-1].tobytes()
    offset = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    head = _FILE_HDR.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    return head + info + pixel_data


def _luma(rgb: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma — identical to the PNG decoder's RGB path."""
    return (
        (
            77 * rgb[..., 0].astype(np.uint32)
            + 150 * rgb[..., 1].astype(np.uint32)
            + 29 * rgb[..., 2].astype(np.uint32)
        )
        >> 8
    ).astype(np.uint8)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → grayscale uint8 (h, w).  BI_RGB 8-bit palettized and
    24-bit BGR; bottom-up (height > 0) and top-down (height < 0)."""
    if len(payload) < _FILE_HDR.size + _INFO_HDR.size or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _FILE_HDR.unpack_from(payload, 0)
    (
        hdr_size,
        w,
        h,
        planes,
        bpp,
        compression,
        _img_size,
        _,
        _,
        clr_used,
        _,
    ) = _INFO_HDR.unpack_from(payload, _FILE_HDR.size)
    if hdr_size < 40:
        raise ValueError(f"BMP core-header size {hdr_size} unsupported (need >= 40)")
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if bpp not in (8, 24):
        raise ValueError(f"BMP bit depth {bpp} unsupported (8/24 only)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("BMP with non-positive dimensions")

    if bpp == 8:
        n_pal = clr_used or 256
        pal_off = _FILE_HDR.size + hdr_size
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_pal * 4, offset=pal_off
        ).reshape(n_pal, 4)
        pal_gray = _luma(pal[:, [2, 1, 0]])  # BGRA → RGB order for luma
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)[:, :w]
        img = pal_gray[rows]
    else:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)[:, : w * 3]
        bgr = rows.reshape(h, w, 3)
        img = _luma(bgr[:, :, ::-1])
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)
