"""Colors and colormaps for indexed PNG tiles.

Semantics match the reference (/root/reference/src/png/color.rs):

- ``rgb8_from_hex``: ``#rrggbb`` only (length-7 validation).
- ``rgb8_from_u32``: r = v>>16, g = v>>8, b = v & 0xFF (truncating).
- ``Colormap``: value → palette index; index 0 is ALWAYS the reserved
  nodata/transparent slot (color 0,0,0; tRNS [0]); unknown values map
  to index 0; entries keep insertion order (first occurrence wins).
"""

from __future__ import annotations

import numpy as np


def rgb8_from_hex(hex_str: str) -> tuple[int, int, int]:
    """'#rrggbb' → (r, g, b). Ref src/png/color.rs:14-26."""
    if len(hex_str) != 7 or not hex_str.startswith("#"):
        raise ValueError(f"unsupported hex format: {hex_str!r}")
    raw = bytes.fromhex(hex_str[1:])
    return (raw[0], raw[1], raw[2])


def rgb8_from_u32(values):
    """u32 value(s) → (r, g, b) uint8 arrays, 0xRRGGBB unpack. Vectorized.

    Ref src/png/color.rs:28-35.
    """
    v = np.asarray(values, dtype=np.uint32)
    r = (v >> np.uint32(16)).astype(np.uint8)
    g = (v >> np.uint32(8)).astype(np.uint8)
    b = (v & np.uint32(0xFF)).astype(np.uint8)
    return r, g, b


class Colormap:
    """Insertion-ordered value→palette-index map with reserved slot 0.

    Ref src/png/color.rs:38-81. ``index_of`` is vectorized via a
    sorted-key lookup so whole tile buffers map to indices in one
    numpy pass.
    """

    def __init__(self, nodata: int):
        self.nodata = nodata
        self._values: dict[int, int] = {int(nodata): 0}
        self._colors: list[int] = [0, 0, 0]  # index 0 = nodata, black/transparent
        self._lookup_cache = None

    def __len__(self) -> int:
        return len(self._colors) // 3

    def add_color(self, value: int, rgb: tuple[int, int, int]) -> None:
        value = int(value)
        if value not in self._values:
            self._values[value] = len(self._values)
            self._colors.extend(rgb)
            self._lookup_cache = None

    def palette_bytes(self) -> bytes:
        return bytes(self._colors)

    def transparency_bytes(self) -> bytes:
        return b"\x00"  # index 0 transparent (src/png/color.rs:112-115)

    def index_of(self, buffer: np.ndarray) -> np.ndarray:
        """Map an array of pixel values to palette indices (0 if absent)."""
        if self._lookup_cache is None:
            keys = np.array(sorted(self._values), dtype=np.int64)
            idxs = np.array([self._values[int(k)] for k in keys], dtype=np.uint8)
            self._lookup_cache = (keys, idxs)
        keys, idxs = self._lookup_cache
        flat = buffer.ravel().astype(np.int64)
        pos = np.searchsorted(keys, flat)
        pos = np.clip(pos, 0, len(keys) - 1)
        found = keys[pos] == flat
        out = np.where(found, idxs[pos], np.uint8(0)).astype(np.uint8)
        return out.reshape(buffer.shape)


def parse_colormap(colormap_str: str, nodata: int) -> Colormap:
    """Parse ``"value:#rrggbb,value:#rrggbb"``. Ref src/png/color.rs:83-97."""
    cm = Colormap(nodata)
    for entry in colormap_str.split(","):
        value_str, hex_str = entry.split(":")
        cm.add_color(int(value_str), rgb8_from_hex(hex_str))
    return cm
