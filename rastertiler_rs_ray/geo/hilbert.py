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
