"""Minimal deterministic PNG container writer + test-only decoder.

No imaging library is installable here, so tile blobs are produced by
this ~100-LoC chunk writer over stdlib ``zlib``. Determinism is part of
the contract (golden tile hashes): one ``zlib.compress(level=9)`` call,
filter byte 0 (None) on every scanline, fixed chunk order
signature/IHDR/[PLTE]/[tRNS]/IDAT/IEND — mirroring the reference
encoder settings ``Compression::Best`` + ``FilterType::NoFilter``
(/root/reference/src/png/grayscale.rs:35-39, colormap.rs:107-114,
rgb.rs:36-42).

``decode_png`` reads PNGs with any scanline filter (types 0-4, no
interlace) — it doubles as the built-in real image codec for the
multimodal decode stage and the golden-bytes verifier in tests.
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


def _unfilter(arr: np.ndarray, channels: int, bit_depth: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4, PNG spec §6) in place on
    the (H, 1+row_bytes) filter-byte-prefixed array → (H, row_bytes).

    Filter 0 (None) and 2 (Up) are whole-row vectorized; 1 (Sub),
    3 (Average) and 4 (Paeth) carry a left-neighbour recurrence so they
    run a per-pixel loop — fine for the tile/thumbnail sizes this
    decoder serves."""
    h = arr.shape[0]
    bpp = max(1, (bit_depth * channels) // 8)
    out = np.zeros((h, arr.shape[1] - 1), dtype=np.int64)
    prev = np.zeros(arr.shape[1] - 1, dtype=np.int64)
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = row
            for x in range(len(row)):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:  # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif ft == 3:  # Average
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    if pa_ <= pb_ and pa_ <= pc_:
                        pr = a
                    elif pb_ <= pc_:
                        pr = b
                    else:
                        pr = c
                    cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png(data: bytes) -> dict:
    """Parse a PNG (filters 0-4, no interlace) — the built-in real
    image codec for the multimodal decode stage, and the golden-bytes
    verifier in tests.

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
    if np.all(arr[:, 0] == 0):
        packed = arr[:, 1:]  # fast path: this writer's own output
    else:
        packed = _unfilter(arr, channels, bit_depth)

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
