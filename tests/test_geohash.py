"""Geohash encode: public test vectors + structural invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.geo.geohash import geohash_cells, geohash_code, geohash_encode


def test_known_vectors():
    # public spec examples (Wikipedia / original geohash.org)
    assert geohash_encode([10.40744], [57.64911], 11)[0] == "u4pruydqqvj"
    assert geohash_encode([-5.603], [42.605], 5)[0] == "ezs42"


def test_edges_and_clamp():
    gh = geohash_encode([0.0, -180.0, 179.99999, 180.0], [0.0, -90.0, 89.99999, 90.0], 6)
    assert list(gh) == ["s00000", "000000", "zzzzzz", "zzzzzz"]


def test_prefix_nesting():
    """The defining hierarchy property: encode at p is a prefix of
    encode at p+k for the same point."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    g8 = geohash_encode(lon, lat, 8)
    for p in (2, 4, 6):
        gp = geohash_encode(lon, lat, p)
        assert all(full.startswith(pre) for full, pre in zip(g8, gp))


def test_code_monotone_in_cells():
    lon_cell, lat_cell = geohash_cells([10.0], [20.0], 6)
    code = geohash_code([10.0], [20.0], 6)
    assert code[0] >= 0
    # deinterleave round-trips the cells
    nbits, nlon, nlat = 30, 15, 15
    lc = sum(((int(code[0]) >> (nbits - 1 - i)) & 1) << (nlon - 1 - i // 2)
             for i in range(nbits) if i % 2 == 0)
    la = sum(((int(code[0]) >> (nbits - 1 - i)) & 1) << (nlat - 1 - i // 2)
             for i in range(nbits) if i % 2 == 1)
    assert lc == int(lon_cell[0]) and la == int(lat_cell[0])


def test_geohash_density_pipeline(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import geohash_density

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-90, 90, 4000)
    ds = ray.data.from_arrow(pa.table({"lon": pa.array(lon), "lat": pa.array(lat)}))
    got = geohash_density(ds, precision=2).to_pandas().sort_values("geohash")
    import pandas as pd

    want = (
        pd.Series(geohash_encode(lon, lat, 2))
        .value_counts()
        .rename_axis("geohash")
        .rename("n_docs")
        .reset_index()
        .sort_values("geohash")
    )
    assert np.array_equal(got["geohash"].to_numpy(), want["geohash"].to_numpy())
    assert np.array_equal(got["n_docs"].to_numpy(), want["n_docs"].to_numpy())
    assert int(got["n_docs"].sum()) == 4000
