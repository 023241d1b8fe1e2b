"""Hilbert space-filling curve — the S2-style cell ordering.

S2's cell ids order cells along a Hilbert curve because Hilbert
locality beats Morton: every pair of consecutive curve positions is
4-adjacent on the grid (Morton jumps a half-plane every power-of-two
boundary), so range scans over the key touch spatially compact runs.
This module is the curve itself (the classic bit-twiddling form,
vectorized over numpy arrays); ``pipelines.spatial.hilbert_sort``
uses it exactly like ``zorder_sort`` uses the Morton interleave.

Complements ``geo.cell`` (quadkey + Morton), ``geo.geohash`` and
``geo.hexcell`` (H3-style) for the survey's §2.11 cell-index family;
the SQL oracle mirrors the per-bit state machine as a recursive CTE.
"""

from __future__ import annotations

import numpy as np


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) on the 2^order grid → distance along the Hilbert curve.

    The standard iteration (one step per bit, high to low): quadrant
    digit ``(3·rx) xor ry`` weighted by s², then the frame rotation —
    when ry=0 the frame transposes (and reflects when rx=1) so the
    child quadrant's curve lines up with the parent's.  All state is
    per-row numpy; ``order`` ≤ 31 keeps d in int64.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(np.broadcast(x, y).shape, dtype=np.int64)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate: ry=0 → transpose, reflecting when rx=1
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= np.int64(1)
    return d


def hilbert_d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_xy2d` (low bit-pair to high)."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    top = np.int64(1) << np.int64(order)
    while s < top:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # un-rotate the frame accumulated so far
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= np.int64(1)
    return x, y


# ------------------------------------------------------------- S2-style ids
# S2 packs (face, level, curve position) into one uint64 whose LOW bits
# carry a single sentinel 1 followed by zeros — the level is implicit in
# the sentinel position, parent/child containment is a bit-range test,
# and ids of ALL levels sort together along the curve.  This is the
# planar (single-face Mercator-grid) analog: MAX_LEVEL quadtree levels
# over the 3857 tile grid.

MAX_LEVEL = 30  # 2·30 position bits + sentinel = 61 bits < int64


def s2_cell_id(level: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(tile x, y) at ``level`` → packed cell id (int64).

    Layout (LSB-first): ``pos << 1 | 1`` shifted so that every level's
    ids interleave correctly: ``id = (h << (2·(MAX_LEVEL−level)+1))
    | (1 << (2·(MAX_LEVEL−level)))`` with h the level-order Hilbert
    position.  A child's id always lies strictly inside its parent's
    [range_min, range_max] — the S2 containment convention."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level {level} outside [0, {MAX_LEVEL}]")
    h = hilbert_xy2d(level, x, y) if level > 0 else np.zeros_like(
        np.asarray(x, dtype=np.int64)
    )
    shift = 2 * (MAX_LEVEL - level)
    return (h << np.int64(shift + 1)) | (np.int64(1) << np.int64(shift))


def s2_cell_level(cell_id: np.ndarray) -> np.ndarray:
    """Recover the level from the sentinel (lowest set bit) position."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    # sentinel at bit 2·(MAX_LEVEL−level) → level = MAX_LEVEL − bit/2
    bit = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - bit // 2


def s2_cell_range(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] ids covered by this cell — every
    descendant's id (any deeper level) falls inside, inclusively."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    return cid - lsb + 1, cid + lsb - 1


def s2_cell_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (must be ≤ the cell's own level)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    shift = np.int64(2 * (MAX_LEVEL - level))
    sentinel = np.int64(1) << shift
    return (cid & ~(2 * sentinel - 1)) | sentinel


def s2_cell_contains(parent: np.ndarray, child: np.ndarray) -> np.ndarray:
    lo, hi = s2_cell_range(parent)
    c = np.asarray(child, dtype=np.int64)
    return (c >= lo) & (c <= hi)
