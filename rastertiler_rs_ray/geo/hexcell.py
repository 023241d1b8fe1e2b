"""H3-style hexagonal cell index on the Web Mercator plane.

The north rule asks for an "H3/S2 cell index"; `geo/cell.py` provides
the S2 side (hierarchical quadkey).  This module is the hexagonal
side, built from scratch on public hex-grid math (Amit Patel's axial /
cube coordinate treatment): pointy-top hexagons of circumradius
``size(res) = ORIGIN / 2**res`` tile the EPSG:3857 plane, a point maps
to fractional axial coordinates and snaps to its containing hex by
cube rounding.  All kernels are vectorized numpy over coordinate
columns — the `map_batches` form the pipelines consume.

Unlike true H3 there is no aperture-7 hierarchy (hex grids do not
nest); cross-resolution relations go through the cell CENTER
(re-assign a cell's center at the coarser resolution), and proximity
queries use exact k-ring neighbor arithmetic instead of parent
containment.  This is the documented partitioning assumption for the
hex family: co-location is by (res, q, r) key; radius queries expand
k rings, never a parent walk.

Rounding convention: ``floor(x + 0.5)`` (round half toward +inf) on
BOTH the numpy and the SQL-oracle side — the repo-wide tie convention
(every e-quantized aggregate uses it), so DuckDB mirrors are exact.

Packing: ``hex_id = (res << 52) | ((q + 2^25) << 26) | (r + 2^25)``
with res ≤ 1023 and |q|,|r| < 2^25 — integer-exact in SQL
(``res*2^52 + (q+33554432)*2^26·... `` stays under 2^62).
"""

from __future__ import annotations

import numpy as np

from .mercator import ORIGIN

SQRT3 = np.sqrt(3.0)
_OFF = 1 << 25
_Q_SHIFT = 26
_RES_SHIFT = 52

# axial offsets of the 6 neighbors of any hex (pointy-top, axial coords)
NEIGHBOR_OFFSETS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def hex_size(res: int) -> float:
    """Hex circumradius (center → vertex) in mercator metres at ``res``."""
    return ORIGIN / float(1 << int(res))


def hex_assign(mx, my, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Mercator (mx, my) → containing-hex axial (q, r) at ``res``.

    Pointy-top fractional axial coords then cube rounding; vectorized.
    """
    s = hex_size(res)
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    qf = (SQRT3 / 3.0 * mx - 1.0 / 3.0 * my) / s
    rf = (2.0 / 3.0 * my) / s
    return _cube_round(qf, rf)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-round fractional axial coords to the containing hex.

    x=q, z=r, y=-x-z; round each (half toward +inf), then repair the
    axis with the largest rounding error so x+y+z == 0 holds.
    """
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_center(q, r, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) → hex center in mercator metres. Vectorized."""
    s = hex_size(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    mx = s * (SQRT3 * q + SQRT3 / 2.0 * r)
    my = s * (1.5 * r)
    return mx, my


def hex_id(res, q, r) -> np.ndarray:
    """(res, q, r) → packed int64 hex id. Vectorized."""
    res = np.asarray(res, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    if np.any((np.abs(q) >= _OFF) | (np.abs(r) >= _OFF)):
        raise ValueError("axial coordinate out of packing range (|q|,|r| < 2^25)")
    return (res << np.int64(_RES_SHIFT)) | ((q + _OFF) << np.int64(_Q_SHIFT)) | (r + _OFF)


def hex_unpack(hid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed id → (res, q, r). Vectorized."""
    hid = np.asarray(hid, dtype=np.int64)
    res = hid >> np.int64(_RES_SHIFT)
    q = ((hid >> np.int64(_Q_SHIFT)) & np.int64((1 << 26) - 1)) - _OFF
    r = (hid & np.int64((1 << 26) - 1)) - _OFF
    return res, q, r


def hex_neighbors(q, r) -> tuple[np.ndarray, np.ndarray]:
    """The 6 adjacent hexes of each input cell: returns (q6, r6) arrays
    of shape (n, 6). Vectorized."""
    q = np.asarray(q, dtype=np.int64)[:, None]
    r = np.asarray(r, dtype=np.int64)[:, None]
    return q + NEIGHBOR_OFFSETS[:, 0][None, :], r + NEIGHBOR_OFFSETS[:, 1][None, :]


def hex_kring_offsets(k: int) -> np.ndarray:
    """All axial offsets within hex distance ≤ k (the filled k-ring,
    3k²+3k+1 cells including the center), deterministic order."""
    offs = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            offs.append((dq, dr))
    return np.array(offs, dtype=np.int64)


def hex_distance(q1, r1, q2, r2) -> np.ndarray:
    """Hex (cube) distance between two axial cells. Vectorized."""
    dq = np.asarray(q1, dtype=np.int64) - np.asarray(q2, dtype=np.int64)
    dr = np.asarray(r1, dtype=np.int64) - np.asarray(r2, dtype=np.int64)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
