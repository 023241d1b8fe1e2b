"""XYZ tile addressing: tile bounds, tile cover, point→tile assignment.

Semantics match the reference (/root/reference/src/tileid.rs):

- ``tile_geo_bounds`` / ``tile_mercator_bounds``: vectorized over
  (zoom, x, y) columns (src/tileid.rs:54-82).
- ``TileRange`` / ``tile_range``: Mercator bounds → covering tile rect
  at a zoom, with eps=1e-11 shaved off the max edges and clamping to
  [0, 2^z - 1] (src/tileid.rs:100-131). Enumeration is x-major
  (src/tileid.rs:138-145).
- ``point_to_tile``: the same floor-assignment math applied to point
  coordinates — this is the spatial keying primitive the joins reuse.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bounds import Bounds
from .mercator import CE, ORIGIN

EPS = 1e-11  # reference eps (src/tileid.rs:103)


def tile_geo_bounds(zoom, x, y):
    """(zoom,x,y) arrays → (xmin, ymin, xmax, ymax) lon/lat arrays.

    Ref src/tileid.rs:54-66.
    """
    zoom = np.asarray(zoom, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.exp2(zoom)
    rad2deg = 180.0 / np.pi
    xmin = x / z * 360.0 - 180.0
    ymin = np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1.0) / z))) * rad2deg
    xmax = (x + 1.0) / z * 360.0 - 180.0
    ymax = np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / z))) * rad2deg
    return xmin, ymin, xmax, ymax


def tile_mercator_bounds(zoom, x, y):
    """(zoom,x,y) arrays → EPSG:3857 bounds arrays. Ref src/tileid.rs:67-82."""
    zoom = np.asarray(zoom, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.exp2(zoom)
    tile_size = CE / z
    xmin = x * tile_size - CE / 2.0
    ymax = CE / 2.0 - y * tile_size
    return xmin, ymax - tile_size, xmin + tile_size, ymax


@dataclass(frozen=True)
class TileRange:
    zoom: int
    xmin: int
    ymin: int
    xmax: int
    ymax: int

    def count(self) -> int:
        return (self.xmax - self.xmin + 1) * (self.ymax - self.ymin + 1)

    def tile_at(self, index):
        """index (0-based, x-major order) → (x, y). Vectorized.

        Matches the reference's cartesian_product enumeration order
        (src/tileid.rs:138-145): x outer, y inner.
        """
        index = np.asarray(index, dtype=np.int64)
        ny = self.ymax - self.ymin + 1
        x = self.xmin + index // ny
        y = self.ymin + index % ny
        return x.astype(np.uint32), y.astype(np.uint32)

    def iter(self):
        for x in range(self.xmin, self.xmax + 1):
            for y in range(self.ymin, self.ymax + 1):
                yield (self.zoom, x, y)


def tile_range(zoom: int, bounds: Bounds) -> TileRange:
    """Mercator bounds → covering TileRange. Ref src/tileid.rs:100-131."""
    z = float(1 << zoom)
    origin = -ORIGIN

    def _clamp(v: float) -> int:
        return int(min(max(np.floor(v), 0.0), z - 1.0))

    xmin = _clamp(((bounds.xmin - origin) / CE) * z)
    ymin = _clamp((1.0 - ((bounds.ymax - origin) / CE)) * z)
    xmax = _clamp((((bounds.xmax - origin) / CE) - EPS) * z)
    ymax = _clamp((1.0 - (((bounds.ymin - origin) / CE) + EPS)) * z)
    return TileRange(zoom=zoom, xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax)


def point_to_tile(zoom, mx, my):
    """Assign Mercator point(s) to the containing tile at ``zoom``.

    Same floor math as ``tile_range`` applied to a point (no eps —
    points on a boundary go to the tile to their right/below, which is
    the tile whose half-open [min, max) extent contains them).
    Vectorized; clamps to [0, 2^z - 1].
    """
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    z = float(1 << int(zoom))
    x = np.floor(((mx + ORIGIN) / CE) * z)
    y = np.floor((1.0 - ((my + ORIGIN) / CE)) * z)
    x = np.clip(x, 0.0, z - 1.0).astype(np.uint32)
    y = np.clip(y, 0.0, z - 1.0).astype(np.uint32)
    return x, y
