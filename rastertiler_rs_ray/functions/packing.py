"""Vectorized sub-byte bit packing for indexed PNG scanlines.

Semantics match the reference packers (/root/reference/src/png/util.rs:5-17):
the FIRST value lands in the HIGHEST bits of each output byte
(MSB-first), e.g. pack_1bit(1,0,0,0,0,0,0,1) = 0x81,
pack_2bit(3,2,1,0) = 0xE4, pack_4bit(0xF,0x1) = 0xF1.
"""

from __future__ import annotations

import numpy as np


def pack_bits_rows(rows: np.ndarray, depth: int) -> np.ndarray:
    """Pack a (H, W) uint8 index array into (H, ceil(W*depth/8)) bytes.

    depth ∈ {1, 2, 4, 8}; each row is packed independently (PNG
    scanlines are byte-aligned per row), partial trailing bytes are
    zero-padded in the low bits.
    """
    if depth == 8:
        return np.ascontiguousarray(rows, dtype=np.uint8)
    if depth not in (1, 2, 4):
        raise ValueError(f"unsupported bit depth {depth}")

    h, w = rows.shape
    per_byte = 8 // depth
    padded_w = -(-w // per_byte) * per_byte
    if padded_w != w:
        padded = np.zeros((h, padded_w), dtype=np.uint8)
        padded[:, :w] = rows
        rows = padded
    # group values per output byte: (H, n_bytes, per_byte)
    grouped = rows.reshape(h, padded_w // per_byte, per_byte).astype(np.uint16)
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint16) * depth
    packed = (grouped << shifts).sum(axis=2).astype(np.uint8)
    return packed
