"""Minimal deterministic PNG container writer + test-only decoder.

No imaging library is installable here, so tile blobs are produced by
this ~100-LoC chunk writer over stdlib ``zlib``. Determinism is part of
the contract (golden tile hashes): one ``zlib.compress(level=9)`` call,
filter byte 0 (None) on every scanline, fixed chunk order
signature/IHDR/[PLTE]/[tRNS]/IDAT/IEND — mirroring the reference
encoder settings ``Compression::Best`` + ``FilterType::NoFilter``
(/root/reference/src/png/grayscale.rs:35-39, colormap.rs:107-114,
rgb.rs:36-42).

``decode_png`` exists for tests and debugging only (filter-0 images as
produced by this writer).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# PNG color types
GRAYSCALE = 0
RGB = 2
INDEXED = 3


def _chunk(tag: bytes, data: bytes) -> bytes:
    raw = tag + data
    return struct.pack(">I", len(data)) + raw + struct.pack(">I", zlib.crc32(raw))


def encode_png_chunks(
    rows: np.ndarray,
    width: int,
    height: int,
    color_type: int,
    bit_depth: int,
    palette: bytes | None = None,
    trns: bytes | None = None,
) -> bytes:
    """Encode pre-packed scanline bytes into a PNG blob.

    ``rows`` is a (height, row_bytes) uint8 array of already-packed
    scanline payloads (no filter bytes).
    """
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    # prepend filter byte 0 to each scanline, single IDAT, zlib level 9
    h, row_bytes = rows.shape
    raw = np.zeros((h, row_bytes + 1), dtype=np.uint8)
    raw[:, 1:] = rows
    idat = zlib.compress(raw.tobytes(), 9)

    out = [_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_chunk(b"PLTE", palette))
    if trns is not None:
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", idat))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_png(data: bytes) -> dict:
    """Parse a filter-0 PNG produced by this writer (tests only).

    Returns dict with width, height, bit_depth, color_type, palette,
    trns, and ``pixels`` — a (H, W) array of gray values / palette
    indices, or (H, W, 3) for RGB.
    """
    assert data[:8] == _SIGNATURE, "bad signature"
    pos = 8
    chunks: dict[bytes, list[bytes]] = {}
    order = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + payload), f"bad crc in {tag!r}"
        chunks.setdefault(tag, []).append(payload)
        order.append(tag)
        pos += 12 + length

    width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[b"IHDR"][0]
    )
    assert comp == 0 and filt == 0 and interlace == 0
    raw = zlib.decompress(b"".join(chunks[b"IDAT"]))

    channels = 3 if color_type == RGB else 1
    row_bits = width * bit_depth * channels
    row_bytes = -(-row_bits // 8)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, row_bytes + 1)
    assert np.all(arr[:, 0] == 0), "only filter 0 supported"
    packed = arr[:, 1:]

    if bit_depth == 8:
        pixels = packed.reshape(height, width, channels).squeeze()
    else:
        per_byte = 8 // bit_depth
        shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * bit_depth
        mask = (1 << bit_depth) - 1
        expanded = (packed[:, :, None] >> shifts[None, None, :]) & mask
        pixels = expanded.reshape(height, -1)[:, :width]

    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "palette": chunks.get(b"PLTE", [None])[0],
        "trns": chunks.get(b"tRNS", [None])[0],
        "pixels": pixels,
        "chunk_order": order,
    }
