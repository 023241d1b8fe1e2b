"""Property-based tests (hypothesis) for the pure-math layer.

SURVEY §7.6 watch-list: NN clamp/padding arithmetic, mercator
round-trips, tile/cell bijections, bit-packing invariants.  No Ray —
pure numpy, fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rastertiler_rs_ray.functions.packing import pack_bits_rows
from rastertiler_rs_ray.geo.cell import (
    cell_children,
    cell_from_lonlat,
    cell_id,
    cell_level,
    cell_parent,
    cell_xy,
)
from rastertiler_rs_ray.geo.mercator import LAT_LIMIT, geo_to_mercator, mercator_to_geo
from rastertiler_rs_ray.geo.tileid import (
    point_to_tile,
    tile_geo_bounds,
    tile_mercator_bounds,
    tile_range,
)
from rastertiler_rs_ray.geo import Bounds

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-LAT_LIMIT + 1e-3, max_value=LAT_LIMIT - 1e-3, allow_nan=False)
zooms = st.integers(min_value=0, max_value=18)


@given(lons, lats)
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip(lon, lat):
    mx, my = geo_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_geo(mx, my)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(lons, lats, zooms)
@settings(max_examples=200, deadline=None)
def test_point_lands_in_its_tile_bounds(lon, lat, zoom):
    """point → tile → tile mercator bounds must contain the point
    (half-open: [xmin, xmax) × (ymin, ymax] up to edge clamping)."""
    mx, my = geo_to_mercator(lon, lat)
    x, y = point_to_tile(zoom, mx, my)
    xmin, ymin, xmax, ymax = (
        float(v) for v in tile_mercator_bounds(np.array([zoom]), x, y)
    )
    eps = 1e-6
    assert xmin - eps <= float(mx) <= xmax + eps
    assert ymin - eps <= float(my) <= ymax + eps


@given(lons, lats, zooms)
@settings(max_examples=200, deadline=None)
def test_tile_range_of_point_is_singleton(lon, lat, zoom):
    """A degenerate bounds around a point covers exactly the point's
    tile — except for points ON a tile boundary, where the reference's
    intentional EPS shaving of max edges (src/tileid.rs:100-131, pinned
    by its origin edge-case test) makes the degenerate cover empty."""
    from hypothesis import assume

    mx, my = geo_to_mercator(lon, lat)
    x, y = point_to_tile(zoom, mx, my)
    # skip points within EPS-ish of a tile edge (boundary semantics differ)
    from rastertiler_rs_ray.geo.mercator import CE, ORIGIN

    tile_m = CE / (1 << zoom)
    fx = ((float(mx) + ORIGIN) % tile_m) / tile_m
    fy = ((float(my) + ORIGIN) % tile_m) / tile_m
    # the reference shaves EPS=1e-11 off the normalized WORLD fraction
    # (src/tileid.rs:103), i.e. 1e-11 * 2^zoom of a tile — guard a few
    # multiples of that around both edges
    band = 4.0 * 1e-11 * (1 << zoom)
    assume(band < fx < 1 - band and band < fy < 1 - band)
    tr = tile_range(zoom, Bounds(float(mx), float(my), float(mx), float(my)))
    assert tr.count() == 1
    assert (tr.xmin, tr.ymin) == (int(x), int(y))


@given(zooms, st.data())
@settings(max_examples=100, deadline=None)
def test_tile_geo_mercator_bounds_consistent(zoom, data):
    n = 1 << zoom
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    za, xa, ya = np.array([zoom]), np.array([x], np.uint32), np.array([y], np.uint32)
    gxmin, gymin, gxmax, gymax = (float(v[0]) for v in tile_geo_bounds(za, xa, ya))
    mxmin, mymin, mxmax, mymax = (float(v[0]) for v in tile_mercator_bounds(za, xa, ya))
    # geo bounds forward-projected must equal mercator bounds
    fx0, fy0 = geo_to_mercator(gxmin, gymin)
    fx1, fy1 = geo_to_mercator(gxmax, gymax)
    assert abs(float(fx0) - mxmin) < 1e-6
    assert abs(float(fx1) - mxmax) < 1e-6
    assert abs(float(fy0) - mymin) < 1e-4
    assert abs(float(fy1) - mymax) < 1e-4


@given(st.integers(min_value=1, max_value=20), st.data())
@settings(max_examples=100, deadline=None)
def test_cell_parent_child_roundtrip(level, data):
    n = 1 << level
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    cid = cell_id(np.uint64(level), np.uint64(x), np.uint64(y))
    assert int(cell_level(cid)) == level
    cx, cy = cell_xy(cid)
    assert (int(cx), int(cy)) == (x, y)
    parent = cell_parent(cid)
    assert int(cell_level(parent)) == level - 1
    kids = cell_children(parent)
    assert int(cid) in {int(c) for c in np.asarray(kids).reshape(-1)}


@given(lons, lats, st.integers(min_value=1, max_value=20))
@settings(max_examples=100, deadline=None)
def test_cell_from_lonlat_matches_tile_math(lon, lat, level):
    cid = cell_from_lonlat(level, lon, lat)
    mx, my = geo_to_mercator(lon, lat)
    x, y = point_to_tile(level, mx, my)
    assert int(cid) == int(cell_id(np.uint64(level), np.uint64(int(x)), np.uint64(int(y))))


@given(
    st.integers(min_value=1, max_value=3).map(lambda d: {1: 1, 2: 2, 3: 4}[d]),
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_pack_bits_roundtrip_msb_first(depth, vals):
    """pack_bits_rows is invertible and MSB-first (ref src/png/util.rs:5-17)."""
    arr = (np.array(vals, dtype=np.uint8) & ((1 << depth) - 1)).reshape(1, -1)
    packed = pack_bits_rows(arr, depth)
    per_byte = 8 // depth
    # unpack: split each byte into per_byte fields, high bits first
    shifts = np.arange(per_byte - 1, -1, -1) * depth
    fields = (packed[0][:, None] >> shifts[None, :]) & ((1 << depth) - 1)
    assert np.array_equal(fields.reshape(-1)[: arr.shape[1]], arr[0])
    # first value in the HIGH bits of byte 0
    assert (packed[0, 0] >> (8 - depth)) == arr[0, 0]
