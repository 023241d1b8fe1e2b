"""S2-style hierarchical cell index on the Web Mercator quadtree.

The north rule requires an H3/S2-style cell index; no such library is
installable here, so this is a from-scratch hierarchical quadkey over
the same Mercator grid the reference's tile math defines
(/root/reference/src/tileid.rs:100-131 provides the floor-assignment
bijection we reuse). A cell at ``level`` L is exactly the XYZ tile
(L, x, y); the packed 64-bit id is::

    cell_id = (level << 58) | (x << 29) | y        (level ≤ 29)

Parent/child/neighbor relations are pure bit/integer ops, so they
vectorize over uint64 columns inside ``map_batches`` kernels. Neighbor
semantics: x wraps around the antimeridian, y clamps at the poles
(rows outside [0, 2^L) are dropped).
"""

from __future__ import annotations

import numpy as np

from .mercator import geo_to_mercator
from .tileid import point_to_tile

LEVEL_SHIFT = 58
X_SHIFT = 29
XY_MASK = np.uint64((1 << 29) - 1)
MAX_LEVEL = 29


def cell_id(level, x, y):
    """(level, x, y) → packed uint64 cell id. Vectorized."""
    level = np.asarray(level, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return (level << np.uint64(LEVEL_SHIFT)) | (x << np.uint64(X_SHIFT)) | y


def cell_level(cid):
    return (np.asarray(cid, dtype=np.uint64) >> np.uint64(LEVEL_SHIFT)).astype(np.uint8)


def cell_xy(cid):
    cid = np.asarray(cid, dtype=np.uint64)
    x = (cid >> np.uint64(X_SHIFT)) & XY_MASK
    y = cid & XY_MASK
    return x.astype(np.uint32), y.astype(np.uint32)


def cell_parent(cid, levels_up=1):
    """Parent cell ``levels_up`` levels above. Vectorized."""
    cid = np.asarray(cid, dtype=np.uint64)
    level = cell_level(cid).astype(np.int64)
    new_level = level - int(levels_up)
    if np.any(new_level < 0):
        raise ValueError("cell_parent below level 0")
    x, y = cell_xy(cid)
    shift = np.uint64(levels_up)
    return cell_id(new_level.astype(np.uint64),
                   x.astype(np.uint64) >> shift,
                   y.astype(np.uint64) >> shift)


def cell_children(cid):
    """The 4 children of a single cell id (scalar) as a uint64 array."""
    level = int(cell_level(cid))
    if level >= MAX_LEVEL:
        raise ValueError("cell_children above max level")
    x, y = cell_xy(cid)
    x2, y2 = int(x) * 2, int(y) * 2
    kids = [(x2 + dx, y2 + dy) for dy in (0, 1) for dx in (0, 1)]
    return cell_id(
        np.full(4, level + 1, dtype=np.uint64),
        np.array([k[0] for k in kids], dtype=np.uint64),
        np.array([k[1] for k in kids], dtype=np.uint64),
    )


def cell_neighbors(cid, ring=1, include_self=True):
    """All cells within ``ring`` king-moves of each input cell.

    Vectorized over an array of cell ids (all at the same level).
    Returns (center_index, neighbor_cell_id) so callers can explode a
    column into (cell, neighbor) candidate rows for kNN ring gathers.
    x wraps (antimeridian); y outside the grid is dropped (poles).
    """
    cid = np.atleast_1d(np.asarray(cid, dtype=np.uint64))
    level = cell_level(cid).astype(np.int64)
    if cid.size and not np.all(level == level[0]):
        raise ValueError("cell_neighbors requires uniform level")
    n = int(level[0]) if cid.size else 0
    size = np.int64(1) << np.int64(n)
    x, y = cell_xy(cid)
    x = x.astype(np.int64)
    y = y.astype(np.int64)

    offs = [
        (dx, dy)
        for dy in range(-ring, ring + 1)
        for dx in range(-ring, ring + 1)
        if include_self or (dx, dy) != (0, 0)
    ]
    k = len(offs)
    dx = np.array([o[0] for o in offs], dtype=np.int64)
    dy = np.array([o[1] for o in offs], dtype=np.int64)

    nx = (x[:, None] + dx[None, :]) % size          # wrap in x
    ny = y[:, None] + dy[None, :]                   # clamp in y (mask below)
    valid = (ny >= 0) & (ny < size)

    centers = np.repeat(np.arange(cid.size, dtype=np.int64), k)[valid.ravel()]
    ncells = cell_id(
        np.full(valid.sum(), n, dtype=np.uint64),
        nx.ravel()[valid.ravel()].astype(np.uint64),
        ny.ravel()[valid.ravel()].astype(np.uint64),
    )
    return centers, ncells


def cell_from_mercator(level, mx, my):
    """Mercator point(s) → cell id at ``level``. Vectorized."""
    x, y = point_to_tile(level, mx, my)
    return cell_id(np.full(np.shape(x) or (), level, dtype=np.uint64),
                   x.astype(np.uint64), y.astype(np.uint64))


def cell_from_lonlat(level, lon, lat):
    """lon/lat point(s) → cell id at ``level``. Vectorized."""
    mx, my = geo_to_mercator(lon, lat)
    return cell_from_mercator(level, mx, my)


_MORTON_SPREAD = (
    (np.uint64(16), np.uint64(0x0000FFFF0000FFFF)),
    (np.uint64(8), np.uint64(0x00FF00FF00FF00FF)),
    (np.uint64(4), np.uint64(0x0F0F0F0F0F0F0F0F)),
    (np.uint64(2), np.uint64(0x3333333333333333)),
    (np.uint64(1), np.uint64(0x5555555555555555)),
)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 32 bits of each uint64 lane
    (0b1011 -> 0b1000101), the standard shift-mask spread."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    for shift, mask in _MORTON_SPREAD:
        v = (v | (v << shift)) & mask
    return v


def morton_interleave(x, y):
    """Z-order (Morton) key: bit-interleave of x (even bits) and y (odd
    bits), vectorized — the space-filling-curve sort key that makes a
    range shuffle place spatially-near tiles/cells in the same output
    partitions (locality for the resumable parquet sink and for
    range-pruned readers).  x, y < 2^32."""
    return _spread_bits(np.asarray(x)) | (_spread_bits(np.asarray(y)) << np.uint64(1))
