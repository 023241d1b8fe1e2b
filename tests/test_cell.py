"""S2-style cell index unit tests (graft capability; SURVEY.md §2.11)."""

import numpy as np

from rastertiler_rs_ray.geo import (
    cell_children,
    cell_from_lonlat,
    cell_id,
    cell_level,
    cell_neighbors,
    cell_parent,
    cell_xy,
)


def test_pack_unpack_roundtrip():
    levels = np.array([0, 5, 12, 29], dtype=np.uint64)
    xs = np.array([0, 31, 4000, (1 << 29) - 1], dtype=np.uint64)
    ys = np.array([0, 17, 1234, (1 << 29) - 1], dtype=np.uint64)
    cid = cell_id(levels, xs, ys)
    np.testing.assert_array_equal(cell_level(cid), levels.astype(np.uint8))
    x2, y2 = cell_xy(cid)
    np.testing.assert_array_equal(x2, xs.astype(np.uint32))
    np.testing.assert_array_equal(y2, ys.astype(np.uint32))


def test_parent_child():
    c = cell_id(3, 5, 6)
    p = cell_parent(c)
    assert int(cell_level(p)) == 2
    px, py = cell_xy(p)
    assert (int(px), int(py)) == (2, 3)
    kids = cell_children(p)
    assert c in set(int(k) for k in kids)
    assert len(set(int(k) for k in kids)) == 4
    # every child's parent is p
    assert all(int(cell_parent(k)) == int(p) for k in kids)


def test_neighbors_interior():
    c = cell_id(4, 8, 8)
    centers, neigh = cell_neighbors(np.array([int(c)], dtype=np.uint64), ring=1)
    assert len(neigh) == 9  # 3x3 incl self
    xs, ys = cell_xy(neigh)
    assert sorted(set(int(v) for v in xs)) == [7, 8, 9]
    assert sorted(set(int(v) for v in ys)) == [7, 8, 9]


def test_neighbors_wrap_and_clamp():
    # top-left corner: x wraps, y clamps
    c = cell_id(3, 0, 0)
    _, neigh = cell_neighbors(np.array([int(c)], dtype=np.uint64), ring=1)
    xs, ys = cell_xy(neigh)
    assert len(neigh) == 6  # 3 x-cols x 2 valid y-rows
    assert set(int(v) for v in xs) == {7, 0, 1}  # x=-1 wraps to 7 at level 3
    assert set(int(v) for v in ys) == {0, 1}


def test_cell_from_lonlat_consistency():
    lon = np.array([-122.4, 0.0, 151.2])
    lat = np.array([37.77, 0.0, -33.87])
    cid = cell_from_lonlat(10, lon, lat)
    # parent at level 9 equals direct assignment at level 9
    np.testing.assert_array_equal(cell_parent(cid), cell_from_lonlat(9, lon, lat))
