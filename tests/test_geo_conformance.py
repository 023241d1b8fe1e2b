"""Conformance corpus: reference unit tests transcribed from FIXTURES.md §B.

Every case below pins our math to the reference's inline test modules
(/root/reference/src/tileid.rs, affine.rs, window.rs), tolerance 1e-6.
"""

import numpy as np
import pytest

from rastertiler_rs_ray.geo import (
    ORIGIN,
    Affine,
    Bounds,
    geo_to_mercator,
    mercator_to_geo,
    point_to_tile,
    tile_geo_bounds,
    tile_mercator_bounds,
    tile_range,
)

EPS = 1e-6


# B1: geo_to_mercator (src/tileid.rs:154-170)
@pytest.mark.parametrize(
    "lon,lat,x,y",
    [
        (0.0, 0.0, 0.0, 0.0),
        (-180.0, 0.0, -ORIGIN, 0.0),
        (-180.0, -90.0, -ORIGIN, -20037508.6269291),
        (-180.0, -85.051129, -ORIGIN, -20037508.6269291),
    ],
)
def test_geo_to_mercator(lon, lat, x, y):
    ax, ay = geo_to_mercator(lon, lat)
    assert abs(ax - x) < EPS and abs(ay - y) < EPS


def test_mercator_roundtrip():
    lon = np.array([-179.0, -45.5, 0.0, 33.3, 179.9])
    lat = np.array([-84.0, -10.0, 0.0, 45.0, 84.9])
    mx, my = geo_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_geo(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


# B2: TileID.geo_bounds (src/tileid.rs:185-197)
@pytest.mark.parametrize(
    "tile,expected",
    [
        ((0, 0, 0), (-180.0, -85.051129, 180.0, 85.051129)),
        ((1, 1, 1), (0.0, -85.051129, 180.0, 0.0)),
        ((10, 20, 30), (-172.968750, 84.016022, -172.617188, 84.052561)),
    ],
)
def test_tile_geo_bounds(tile, expected):
    z, x, y = tile
    actual = tile_geo_bounds(np.array([z]), np.array([x]), np.array([y]))
    for a, e in zip(actual, expected):
        assert abs(float(a[0]) - e) < EPS


# B3: TileID.mercator_bounds (src/tileid.rs:199-211)
@pytest.mark.parametrize(
    "tile,expected",
    [
        ((0, 0, 0), (-20037508.342789, -20037508.342789, 20037508.342789, 20037508.342789)),
        ((1, 1, 1), (0.0, -20037508.342789, 20037508.342789, 0.0)),
        ((10, 20, 30), (-19254793.173149, 18824299.829847, -19215657.414667, 18863435.588329)),
    ],
)
def test_tile_mercator_bounds(tile, expected):
    z, x, y = tile
    actual = tile_mercator_bounds(np.array([z]), np.array([x]), np.array([y]))
    for a, e in zip(actual, expected):
        assert abs(float(a[0]) - e) < EPS


def _mercator_bounds_of(geo: Bounds) -> Bounds:
    xmin, ymin = geo_to_mercator(geo.xmin, geo.ymin)
    xmax, ymax = geo_to_mercator(geo.xmax, geo.ymax)
    return Bounds(float(xmin), float(ymin), float(xmax), float(ymax))


# B4: TileRange cover / count / iteration (src/tileid.rs:213-280)
RANGE_CASES = [
    (0, Bounds(-180, -90, 180, 90), (0, 0, 0, 0), 1, (0, 0, 0), (0, 0, 0)),
    (1, Bounds(-180, -90, 90, 90), (0, 0, 1, 1), 4, (1, 0, 0), (1, 1, 1)),
    (1, Bounds(-180, -90, 0, 90), (0, 0, 0, 1), 2, (1, 0, 0), (1, 0, 1)),
    (4, Bounds(-100, -20, -20, 20), (3, 7, 7, 8), 10, (4, 3, 7), (4, 7, 8)),
    (4, Bounds(-1e-6, -1e-6, 1e-6, 1e-6), (7, 7, 8, 8), 4, (4, 7, 7), (4, 8, 8)),
]


@pytest.mark.parametrize("zoom,geo,rect,count,first,last", RANGE_CASES)
def test_tile_range(zoom, geo, rect, count, first, last):
    tr = tile_range(zoom, _mercator_bounds_of(geo))
    assert (tr.xmin, tr.ymin, tr.xmax, tr.ymax) == rect
    assert tr.count() == count
    tiles = list(tr.iter())
    assert tiles[0] == first
    assert tiles[-1] == last
    # vectorized enumeration matches the python iterator
    xs, ys = tr.tile_at(np.arange(tr.count()))
    assert [(zoom, int(x), int(y)) for x, y in zip(xs, ys)] == tiles


# B5: Affine (src/affine.rs:90-191)
def _affine_close(l: Affine, r: Affine):
    for fa, fb in zip(
        (l.a, l.b, l.c, l.d, l.e, l.f), (r.a, r.b, r.c, r.d, r.e, r.f)
    ):
        assert abs(fa - fb) < EPS, (l, r)


def test_affine_from_gdal():
    _affine_close(Affine.from_gdal([0, 1, 2, 3, 4, 5]), Affine(1, 2, 0, 4, 5, 3))


def test_affine_gdal_roundtrip():
    assert Affine.from_gdal([0, 1, 2, 3, 4, 5]).to_gdal() == [0, 1, 2, 3, 4, 5]


def test_affine_invert():
    _affine_close(
        Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0).invert(),
        Affine(
            0.03333333333333333, 0.0, -33.333333333333336,
            0.0, -0.03333333333333333, 66.66666666666667,
        ),
    )


def test_affine_multiply():
    x, y = Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0).multiply(2.0, 3.0)
    assert abs(x - 1060.0) < EPS and abs(y - 1910.0) < EPS


def test_affine_scale():
    _affine_close(
        Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0).scale(2.0, 3.0),
        Affine(60.0, 0.0, 1000.0, 0.0, -90.0, 2000.0),
    )


def test_affine_resolution():
    assert Affine(30.0, 0.0, 1000.0, 0.0, -60.0, 2000.0).resolution() == (30.0, 60.0)


# B6: Window (src/window.rs:92-140)
def test_window_from_bounds():
    from rastertiler_rs_ray.geo import window_from_bounds

    w = window_from_bounds(
        Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0), Bounds(0.0, 10.0, 100.0, 200.0)
    )
    assert abs(w.x_offset - -33.333333333333336) < EPS
    assert abs(w.y_offset - 60.00000000000001) < EPS
    assert abs(w.width - 3.333333333333332) < EPS
    assert abs(w.height - 6.333333333333336) < EPS


@pytest.mark.parametrize(
    "win,expected",
    [
        ((0.0, 0.0, 10.0, 20.0), Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0)),
        ((10.0, 20.0, 10.0, 20.0), Affine(30.0, 0.0, 1300.0, 0.0, -30.0, 1400.0)),
        ((-10.0, -20.0, 10.0, 20.0), Affine(30.0, 0.0, 700.0, 0.0, -30.0, 2600.0)),
    ],
)
def test_window_transform(win, expected):
    from rastertiler_rs_ray.geo import Window, window_transform

    base = Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0)
    _affine_close(window_transform(Window(*win), base), expected)


def test_point_to_tile_matches_range_cover():
    # a point strictly inside a tile must be assigned to that tile
    z, x, y = 7, 41, 53
    xmin, ymin, xmax, ymax = (float(v[0]) for v in
                              tile_mercator_bounds(np.array([z]), np.array([x]), np.array([y])))
    cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
    ax, ay = point_to_tile(z, np.array([cx]), np.array([cy]))
    assert (int(ax[0]), int(ay[0])) == (x, y)
