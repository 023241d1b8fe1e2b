"""Hex cell index: geometry and packing invariants (no Ray needed)."""

import numpy as np

from rastertiler_rs_ray.geo.hexcell import (
    hex_assign,
    hex_center,
    hex_distance,
    hex_id,
    hex_kring_offsets,
    hex_neighbors,
    hex_size,
    hex_unpack,
)
from rastertiler_rs_ray.geo.mercator import ORIGIN


def test_center_roundtrip():
    rng = np.random.default_rng(7)
    q = rng.integers(-1000, 1000, 500)
    r = rng.integers(-1000, 1000, 500)
    for res in (3, 6, 9):
        mx, my = hex_center(q, r, res)
        q2, r2 = hex_assign(mx, my, res)
        assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_assign_is_nearest_center():
    """A hexagon is the Voronoi cell of its center: every random point's
    assigned center must be the closest among the 2-ring candidates."""
    rng = np.random.default_rng(11)
    res = 6
    mx = rng.uniform(-ORIGIN * 0.9, ORIGIN * 0.9, 2000)
    my = rng.uniform(-ORIGIN * 0.9, ORIGIN * 0.9, 2000)
    q, r = hex_assign(mx, my, res)
    cx, cy = hex_center(q, r, res)
    d_assigned = (mx - cx) ** 2 + (my - cy) ** 2
    for dq, dr in hex_kring_offsets(2):
        if dq == 0 and dr == 0:
            continue
        ox, oy = hex_center(q + dq, r + dr, res)
        d_other = (mx - ox) ** 2 + (my - oy) ** 2
        assert np.all(d_assigned <= d_other + 1e-6)


def test_neighbors_distance_one():
    q = np.array([0, 5, -3])
    r = np.array([0, -2, 7])
    nq, nr = hex_neighbors(q, r)
    assert nq.shape == (3, 6)
    d = hex_distance(q[:, None], r[:, None], nq, nr)
    assert np.all(d == 1)


def test_kring_counts_and_distance():
    for k in (0, 1, 2, 3):
        offs = hex_kring_offsets(k)
        assert len(offs) == 3 * k * k + 3 * k + 1
        d = hex_distance(0, 0, offs[:, 0], offs[:, 1])
        assert d.max() == (k if k else 0) and len(np.unique(offs, axis=0)) == len(offs)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    res = rng.integers(0, 16, 300)
    q = rng.integers(-(1 << 24), 1 << 24, 300)
    r = rng.integers(-(1 << 24), 1 << 24, 300)
    hid = hex_id(res, q, r)
    res2, q2, r2 = hex_unpack(hid)
    assert np.array_equal(res, res2)
    assert np.array_equal(q, q2)
    assert np.array_equal(r, r2)
    # ids are unique per (res,q,r)
    assert len(np.unique(hid)) == len(hid)


def test_size_halves_per_res():
    assert hex_size(5) == 2 * hex_size(6)
    assert hex_size(0) == ORIGIN
