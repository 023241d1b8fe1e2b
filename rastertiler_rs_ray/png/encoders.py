"""The three tile encoders + the u32 adaptive palette policy.

Reference parity:
- GrayscaleEncoder: 8-bit grayscale, tRNS = [0, nodata]
  (/root/reference/src/png/grayscale.rs:29-49).
- ColormapEncoder: indexed PNG, bit depth auto-selected from palette
  size (≤2→1, ≤4→2, ≤16→4, else 8), PLTE from colormap, tRNS=[0]
  (/root/reference/src/png/colormap.rs:95-133).  Like the reference's
  ``ColormapEncoder<T: PixelValue>`` — the one encoder generic over
  u8/u16/u32 (/root/reference/src/png/mod.rs:15-19) — it accepts any
  integer pixel dtype: ``Colormap.index_of`` maps values through an
  int64 sorted-key LUT, so u16 buffers encode without a cast.  (The
  render entry still rejects u16 rasters, matching
  /root/reference/src/render.rs:43-48, where u16 is equally dead.)
- RGBEncoder: 8-bit RGB, tRNS = [0,r,0,g,0,b] of the nodata color
  (/root/reference/src/png/rgb.rs:30-56).
- build_dynamic_palette: per-tile insertion-ordered palette with the
  exact 256-cap overflow rule of the reference's u32 worker loop
  (/root/reference/src/render.rs:257-279).

All encode paths are vectorized (numpy index LUTs + row packing); one
PNG blob per tile.
"""

from __future__ import annotations

import numpy as np

from ..functions.packing import pack_bits_rows
from .color import Colormap, rgb8_from_u32
from .writer import GRAYSCALE, INDEXED, RGB, encode_png_chunks


def _select_depth(palette_len: int) -> int:
    """Ref src/png/colormap.rs:96-101."""
    if palette_len <= 2:
        return 1
    if palette_len <= 4:
        return 2
    if palette_len <= 16:
        return 4
    return 8


class GrayscaleEncoder:
    def __init__(self, width: int, height: int, nodata: int):
        self.width = width
        self.height = height
        self.nodata = int(nodata)

    def encode(self, buffer: np.ndarray) -> bytes:
        rows = np.ascontiguousarray(buffer.reshape(self.height, self.width), np.uint8)
        return encode_png_chunks(
            rows, self.width, self.height, GRAYSCALE, 8,
            trns=bytes([0, self.nodata]),
        )


class ColormapEncoder:
    def __init__(self, width: int, height: int, colormap: Colormap):
        self.width = width
        self.height = height
        self.colormap = colormap

    def encode(self, buffer: np.ndarray) -> bytes:
        depth = _select_depth(len(self.colormap))
        indices = self.colormap.index_of(buffer.reshape(self.height, self.width))
        rows = pack_bits_rows(indices, depth)
        return encode_png_chunks(
            rows, self.width, self.height, INDEXED, depth,
            palette=self.colormap.palette_bytes(),
            trns=self.colormap.transparency_bytes(),
        )


class RGBEncoder:
    def __init__(self, width: int, height: int, nodata: int):
        self.width = width
        self.height = height
        r, g, b = rgb8_from_u32(np.uint32(nodata))
        self.trns = bytes([0, int(r), 0, int(g), 0, int(b)])

    def encode_rgb(self, rgb: np.ndarray) -> bytes:
        """rgb: (H, W, 3) uint8."""
        rows = np.ascontiguousarray(rgb.reshape(self.height, self.width * 3))
        return encode_png_chunks(
            rows, self.width, self.height, RGB, 8, trns=self.trns
        )

    def encode_u32(self, buffer: np.ndarray) -> bytes:
        """Unpack a (H, W) uint32 buffer to RGB and encode."""
        r, g, b = rgb8_from_u32(buffer.reshape(self.height, self.width))
        return self.encode_rgb(np.stack([r, g, b], axis=-1))


def build_dynamic_palette(buffer: np.ndarray, nodata: int) -> Colormap | None:
    """Per-tile dynamic palette for u32 tiles, or None → use RGB path.

    Reproduces the reference's streaming loop semantics
    (src/render.rs:257-279) vectorized: entries are distinct buffer
    values in FIRST-OCCURRENCE order (nodata pre-pinned at index 0);
    the palette path is abandoned as soon as any pixel is processed
    while the palette is already at 256 entries — i.e. palette survives
    iff ≤254 distinct non-nodata values, or exactly 255 whose last new
    value appears at the final pixel.
    """
    flat = buffer.ravel()
    values, first_idx = np.unique(flat, return_index=True)
    non_nodata = values != nodata
    values, first_idx = values[non_nodata], first_idx[non_nodata]
    order = np.argsort(first_idx, kind="stable")
    values, first_idx = values[order], first_idx[order]

    d = len(values)
    if d > 255 or (d == 255 and int(first_idx[-1]) != flat.size - 1):
        return None

    cm = Colormap(int(nodata))
    rs, gs, bs = rgb8_from_u32(values)
    for v, r, g, b in zip(values.tolist(), rs.tolist(), gs.tolist(), bs.tolist()):
        cm.add_color(v, (r, g, b))
    return cm
