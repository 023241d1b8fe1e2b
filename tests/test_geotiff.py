"""GeoTIFF ingestion: reader/writer roundtrip, tile-kernel parity with
the synthetic source, overview selection, strips/predictor/u16 format
coverage, 4326 warp, and the end-to-end render-from-GeoTIFF pipeline
(S1/S3/M16 parity; ref src/dataset.rs:25-35, :74-110, :199-230)."""

import hashlib
import os
import struct
import zlib

import numpy as np
import pytest

from rastertiler_rs_ray.geo import Affine, CE, ORIGIN
from rastertiler_rs_ray.raster import (
    GeoTiffRaster,
    MercatorWarp,
    SyntheticRaster,
    open_raster,
    raster_from_spec,
    write_geotiff,
)

_RES = CE / (1 << 17)
_T = Affine(_RES, 0.0, -ORIGIN / 3.0, 0.0, -_RES, ORIGIN / 5.0)
W, H = 700, 500


def _fixture_array(dtype=np.uint8):
    s = SyntheticRaster(dtype="uint8", nodata=0, width=W, height=H, transform=_T)
    return s.values_at(np.arange(W)[None, :], np.arange(H)[:, None]).astype(dtype)


@pytest.fixture(scope="module")
def tif_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("gt") / "fix.tif")
    write_geotiff(p, _fixture_array(), _T, nodata=0, tile_size=128,
                  overview_factors=(2, 4))
    return p


def test_roundtrip_exact(tif_path):
    g = GeoTiffRaster(tif_path)
    assert (g.width, g.height) == (W, H)
    assert g.dtype == "uint8" and g.nodata == 0 and g.crs_epsg == 3857
    back = g.values_at(np.arange(W)[None, :], np.arange(H)[:, None])
    assert np.array_equal(back, _fixture_array())
    t = g.transform
    for got, want in zip((t.a, t.b, t.c, t.d, t.e, t.f),
                         (_T.a, _T.b, _T.c, _T.d, _T.e, _T.f)):
        assert got == pytest.approx(want, abs=1e-6)


def test_tile_read_parity_with_synthetic(tif_path):
    """read_tile from the GeoTIFF must be pixel-identical to the
    synthetic raster on the same grid — same kernel, different source."""
    g = GeoTiffRaster(tif_path, disable_overviews=True)
    s = SyntheticRaster(dtype="uint8", nodata=0, width=W, height=H, transform=_T)
    from rastertiler_rs_ray.geo.tileid import tile_range

    n = 0
    for z in (8, 10, 11):
        tr = tile_range(z, g.bounds())
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                a = g.read_tile(z, x, y, 256)
                b = s.read_tile(z, x, y, 256)
                assert (a is None) == (b is None), (z, x, y)
                if a is not None:
                    assert np.array_equal(a, b), (z, x, y)
                    n += 1
    assert n > 20


def test_overview_selection(tif_path):
    """A decimated read ≥2× picks the matching overview grid (fewer
    source pixels touched); disable_overviews forces the base grid and
    matches the synthetic kernel exactly."""
    g = GeoTiffRaster(tif_path)
    assert len(g._overviews) == 2
    # 4× decimation → factor-4 overview: result equals NN over that grid
    out = g.read_decimated(0, 0, W, H, W // 4, H // 4)
    ov = g._overviews[1]
    assert (ov.width, ov.height) == (W // 4, H // 4)
    expected = g._gather(
        ov,
        np.minimum(((np.arange(W // 4) + 0.5) * (W / 4) / (W // 4)).astype(np.int64),
                   ov.width - 1)[None, :],
        np.minimum(((np.arange(H // 4) + 0.5) * (H / 4) / (H // 4)).astype(np.int64),
                   ov.height - 1)[:, None],
    )
    assert np.array_equal(out, expected)

    gd = GeoTiffRaster(tif_path, disable_overviews=True)
    s = SyntheticRaster(dtype="uint8", nodata=0, width=W, height=H, transform=_T)
    assert np.array_equal(
        gd.read_decimated(0, 0, W, H, W // 4, H // 4),
        s.read_decimated(0, 0, W, H, W // 4, H // 4),
    )


def test_spec_roundtrip_and_factory(tif_path):
    g = GeoTiffRaster(tif_path)
    g2 = raster_from_spec(g.spec())
    assert isinstance(g2, GeoTiffRaster)
    assert g2.read_tile(10, 341, 408, 64) is None or True  # opens + reads


def test_u16_reads_but_render_rejects(tmp_path):
    p = str(tmp_path / "u16.tif")
    arr = (_fixture_array(np.uint16) * 7).astype(np.uint16)
    write_geotiff(p, arr, _T, nodata=0, tile_size=256)
    g = GeoTiffRaster(p)
    assert g.dtype == "uint16"
    assert np.array_equal(
        g.values_at(np.arange(W)[None, :], np.arange(H)[:, None]), arr
    )
    # pipeline validation parity: u16 has no render path (src/render.rs:43-48)
    from rastertiler_rs_ray.stages.tile_render import TileRenderer

    with pytest.raises(ValueError, match="not supported"):
        TileRenderer(raster_spec=g.spec(), tilesize=64)


def test_stripped_and_predictor_tiff(tmp_path):
    """Hand-built stripped TIFF with deflate + horizontal predictor —
    the layout GDAL commonly emits for small rasters."""
    w, h, rps = 37, 23, 7
    rng = np.random.RandomState(3)
    arr = rng.randint(1, 255, size=(h, w), dtype=np.uint8)

    strips = []
    for y0 in range(0, h, rps):
        sub = arr[y0 : y0 + rps].astype(np.int16)
        diff = sub.copy()
        diff[:, 1:] = sub[:, 1:] - sub[:, :-1]  # horizontal differencing
        strips.append(zlib.compress(diff.astype(np.uint8).tobytes()))

    # minimal classic TIFF, little-endian, strip layout
    tags = []  # (tag, type, values)
    n_strips = len(strips)
    body = bytearray()
    offsets, counts = [], []
    data_start = 8
    for s in strips:
        offsets.append(data_start + len(body))
        counts.append(len(s))
        body += s

    def entry(tag, ftype, vals):
        return (tag, ftype, vals)

    tags = [
        entry(256, 4, [w]), entry(257, 4, [h]), entry(258, 3, [8]),
        entry(259, 3, [8]), entry(262, 3, [1]),
        entry(273, 4, offsets), entry(277, 3, [1]), entry(278, 4, [rps]),
        entry(279, 4, counts), entry(317, 3, [2]), entry(339, 3, [1]),
        entry(33550, 12, [_RES, _RES, 0.0]),
        entry(33922, 12, [0.0, 0.0, 0.0, _T.c, _T.f, 0.0]),
        entry(34735, 3, [1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, 3857]),
    ]
    tags.sort()
    ifd_off = data_start + len(body)
    out = bytearray(b"II" + struct.pack("<HI", 42, ifd_off)) + body
    sizes = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}
    ifd = bytearray(struct.pack("<H", len(tags)))
    extra_off = ifd_off + 2 + 12 * len(tags) + 4
    extra = bytearray()
    for tag, ftype, vals in tags:
        ch, sz = sizes[ftype]
        payload = struct.pack("<" + ch * len(vals), *vals)
        ifd += struct.pack("<HHI", tag, ftype, len(vals))
        if len(payload) <= 4:
            ifd += payload.ljust(4, b"\0")
        else:
            ifd += struct.pack("<I", extra_off + len(extra))
            extra += payload
    ifd += struct.pack("<I", 0)
    out += ifd + extra
    p = str(tmp_path / "strips.tif")
    with open(p, "wb") as f:
        f.write(out)

    g = GeoTiffRaster(p)
    assert not g._main.tiled
    assert np.array_equal(
        g.values_at(np.arange(w)[None, :], np.arange(h)[:, None]), arr
    )


def test_4326_warp_semantics(tmp_path):
    """EPSG:4326 source opens as a MercatorWarp view: NN reprojection,
    nodata outside the source, Mercator-clamped bounds — the reference's
    warped-VRT semantics (src/dataset.rs:74-110)."""
    lon_res = 360.0 / 720
    t = Affine(lon_res, 0, -180.0, 0, -lon_res, 80.0)  # 80N..-70S partial globe
    rng = np.random.RandomState(5)
    arr = rng.randint(1, 255, size=(300, 720), dtype=np.uint8)
    p = str(tmp_path / "geo.tif")
    write_geotiff(p, arr, t, nodata=0, crs_epsg=4326, tile_size=128)

    w = open_raster(p)
    assert isinstance(w, MercatorWarp)
    b = w.bounds()
    assert b.xmin == pytest.approx(-ORIGIN, rel=1e-9)
    assert b.ymax < ORIGIN  # clamped at 80N < 85.05
    # spot-check NN correctness: the warped value at a target pixel equals
    # the source pixel its center maps to
    tile = w.read_tile(3, 2, 3, 64)
    assert tile is not None
    from rastertiler_rs_ray.geo.mercator import mercator_to_geo
    from rastertiler_rs_ray.geo.tileid import tile_mercator_bounds

    (xmin,), (ymin,), (xmax,), (ymax,) = tile_mercator_bounds(
        np.array([3]), np.array([2]), np.array([3])
    )
    # target grid of the warp view, row/col of a center pixel in the tile
    res = (xmax - xmin) / 64
    mx = xmin + (31 + 0.5) * res
    my = ymax - (17 + 0.5) * res
    # read_tile decimates from the warp grid; recompute via values_at on
    # the exact warp-grid pixel under that mercator point
    wt = w.transform
    col = int(np.floor((mx - wt.c) / wt.a))
    row = int(np.floor((my - wt.f) / wt.e))
    v = w.values_at(np.array([[col]]), np.array([[row]]))[0, 0]
    lon, lat = mercator_to_geo(wt.c + (col + 0.5) * wt.a, wt.f + (row + 0.5) * wt.e)
    sc = int(np.floor((lon - t.c) / t.a))
    sr = int(np.floor((lat - t.f) / t.e))
    assert v == arr[sr, sc]

    # spec → actor reopen path
    w2 = raster_from_spec(w.spec())
    assert isinstance(w2, MercatorWarp) and w2.width == w.width


def test_render_pipeline_from_geotiff(ray_session, tmp_path, tif_path):
    """End-to-end: render_pyramid over the GeoTIFF produces tile-for-tile
    identical output to the synthetic raster on the same grid."""
    import pyarrow.dataset as pads

    from rastertiler_rs_ray.pipelines.render import render_pyramid, tileset_counts

    def hashes(out_dir):
        t = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet").to_table()
        return {
            f"{t.column('zoom')[i]}/{t.column('x')[i]}/{t.column('y')[i]}":
                hashlib.sha256(t.column("tile_data")[i].as_py()).hexdigest()
            for i in range(len(t))
        }

    g = GeoTiffRaster(tif_path, disable_overviews=True)
    s = SyntheticRaster(dtype="uint8", nodata=0, width=W, height=H, transform=_T)
    out_g = str(tmp_path / "from_tif")
    out_s = str(tmp_path / "from_syn")
    render_pyramid(g, out_g, 6, 10, tilesize=128, concurrency=3, resume=False)
    render_pyramid(s, out_s, 6, 10, tilesize=128, concurrency=3, resume=False)
    assert hashes(out_g) == hashes(out_s)
    assert tileset_counts(out_g) == tileset_counts(out_s)


def test_cli_render_tif(ray_session, tmp_path, tif_path):
    """CLI: `render --tif` works; missing file errors cleanly (clap
    file_exists parity)."""
    from rastertiler_rs_ray.__main__ import main

    out = str(tmp_path / "cli_ts")
    rc = main(["render", out, "--tif", tif_path, "--minzoom", "6", "--maxzoom", "7",
               "--tilesize", "128", "--workers", "2"])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "tiles"))
    rc = main(["render", str(tmp_path / "x"), "--tif", str(tmp_path / "missing.tif")])
    assert rc == 2


# -------------------------------------------------------------- LZW


def test_lzw_known_vector():
    """Hand-derived TIFF-LZW stream for b"\\x07"*5: codes
    Clear(256), 7, 258, 258, EOI(257) packed MSB-first at 9 bits
    (258 = "77"; the second 258 exercises the just-added-entry case)."""
    from rastertiler_rs_ray.raster import lzw

    data = b"\x07" * 5
    assert lzw.encode(data) == bytes([0x80, 0x01, 0xE0, 0x50, 0x28, 0x08])
    assert lzw.decode(lzw.encode(data)) == data


def test_lzw_roundtrip_widths_and_clear():
    """Streams long enough to cross the 9→10→11→12-bit early-change
    boundaries AND force a table-reset ClearCode."""
    from rastertiler_rs_ray.raster import lzw

    rng = np.random.RandomState(3)
    for data in (
        rng.randint(0, 256, 60_000, dtype=np.uint8).tobytes(),  # incompressible
        (np.arange(30_000, dtype=np.uint8) % 7).tobytes(),       # repetitive
        rng.randint(0, 3, 200_000, dtype=np.uint8).tobytes(),    # resets table
        b"",
        b"\xff",
    ):
        enc = lzw.encode(data)
        assert lzw.decode(enc, max_size=len(data)) == data


def test_lzw_geotiff_roundtrip_and_tile_parity(tmp_path):
    """compression='lzw' writes the reference's own format
    (src/dataset.rs:213 COMPRESS=LZW); pixels and rendered tiles must be
    bit-identical to the deflate-authored file."""
    arr = _fixture_array()
    p_lzw = str(tmp_path / "lzw.tif")
    p_defl = str(tmp_path / "defl.tif")
    write_geotiff(p_lzw, arr, _T, nodata=0, tile_size=128, compression="lzw",
                  overview_factors=(2,))
    write_geotiff(p_defl, arr, _T, nodata=0, tile_size=128, compression="deflate",
                  overview_factors=(2,))

    g = GeoTiffRaster(p_lzw)
    assert g._main.compression == 5
    back = g.values_at(np.arange(W)[None, :], np.arange(H)[:, None])
    assert np.array_equal(back, arr)

    d = GeoTiffRaster(p_defl)
    from rastertiler_rs_ray.geo.tileid import tile_range

    n = 0
    for z in (9, 11):
        tr = tile_range(z, g.bounds())
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                a = g.read_tile(z, x, y, 256)
                b = d.read_tile(z, x, y, 256)
                assert (a is None) == (b is None)
                if a is not None:
                    assert np.array_equal(a, b)
                    n += 1
    assert n > 6


# -------------------------------------------------------------- BigTIFF


def test_bigtiff_forced_roundtrip_and_tile_parity(tmp_path):
    """BigTIFF (magic 43, 64-bit offsets) reads back bit-identical to
    the same data in classic layout — pixels, overviews, and rendered
    tiles."""
    arr = _fixture_array(np.uint32)
    p_big = str(tmp_path / "big.tif")
    p_cls = str(tmp_path / "cls.tif")
    write_geotiff(p_big, arr, _T, nodata=0, tile_size=128, bigtiff=True,
                  overview_factors=(2,))
    write_geotiff(p_cls, arr, _T, nodata=0, tile_size=128, bigtiff=False,
                  overview_factors=(2,))
    with open(p_big, "rb") as f:
        assert f.read(4) == b"II" + struct.pack("<H", 43)
    g, c = GeoTiffRaster(p_big), GeoTiffRaster(p_cls)
    assert (g.width, g.height, g.dtype, g.nodata) == (c.width, c.height, c.dtype, c.nodata)
    back = g.values_at(np.arange(W)[None, :], np.arange(H)[:, None])
    assert np.array_equal(back, arr)
    assert len(g._overviews) == 1
    from rastertiler_rs_ray.geo.tileid import tile_range

    tr = tile_range(10, g.bounds())
    n = 0
    for x in range(tr.xmin, tr.xmax + 1):
        for y in range(tr.ymin, tr.ymax + 1):
            a, b = g.read_tile(10, x, y, 256), c.read_tile(10, x, y, 256)
            assert (a is None) == (b is None)
            if a is not None:
                assert np.array_equal(a, b)
                n += 1
    assert n >= 2


def test_bigtiff_over_4gib_offsets(tmp_path):
    """Real tile data placed BEYOND the 4 GiB boundary (sparse hole
    after the header): the >4 GiB raster case 64-bit offsets exist for.
    The file is > 4 GiB by size but costs only KiBs of disk."""
    arr = _fixture_array()
    hole = (1 << 32) + (1 << 20)  # tiles start past 4 GiB
    p = str(tmp_path / "huge.tif")
    write_geotiff(p, arr, _T, nodata=0, tile_size=128, bigtiff=True,
                  compression="deflate", _sparse_offset=hole)
    assert os.path.getsize(p) > (1 << 32)
    g = GeoTiffRaster(p)
    assert int(g._main.offsets[0]) > (1 << 32)
    back = g.values_at(np.arange(W)[None, :], np.arange(H)[:, None])
    assert np.array_equal(back, arr)


def test_classic_tiff_offset_overflow_raises(tmp_path):
    arr = _fixture_array()
    with pytest.raises(ValueError, match="bigtiff=True"):
        write_geotiff(str(tmp_path / "x.tif"), arr, _T, nodata=0,
                      bigtiff=False, _sparse_offset=(1 << 32))


# -------------------------------------------------------------- UTM warp


def _karney_tm_forward(lon, lat, lon0):
    """Independent cross-implementation: Karney-style Krueger series
    (arXiv:1002.1417, 4th order in n) — a different public formulation
    from the Snyder series the engine uses; they agree < 1 mm in-zone."""
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    e = np.sqrt(e2)
    n = f / (2 - f)
    k0 = 0.9996
    A1 = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    al = [
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
        61 * n**3 / 240 - 103 * n**4 / 140,
        49561 * n**4 / 161280,
    ]
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    t = np.tan(phi)
    sig = np.sinh(e * np.arctanh(e * t / np.sqrt(1 + t * t)))
    tp = t * np.sqrt(1 + sig * sig) - sig * np.sqrt(1 + t * t)
    xip = np.arctan2(tp, np.cos(lam))
    etp = np.arcsinh(np.sin(lam) / np.sqrt(tp * tp + np.cos(lam) ** 2))
    xi, eta = xip, etp
    for j, c in enumerate(al, 1):
        xi = xi + c * np.sin(2 * j * xip) * np.cosh(2 * j * etp)
        eta = eta + c * np.cos(2 * j * xip) * np.sinh(2 * j * etp)
    return k0 * A1 * eta + 500_000.0, k0 * A1 * xi


def test_tmerc_matches_independent_karney():
    from rastertiler_rs_ray.geo.tmerc import tmerc_forward

    rng = np.random.RandomState(0)
    lon0 = -123.0  # UTM zone 10
    lon = rng.uniform(lon0 - 3, lon0 + 3, 2000)
    lat = rng.uniform(-80, 84, 2000)
    x1, y1 = tmerc_forward(lon, lat, lon0)
    x2, y2 = _karney_tm_forward(lon, lat, lon0)
    assert np.abs(x1 - x2).max() < 1e-3
    assert np.abs(y1 - y2).max() < 1e-3


def test_tmerc_roundtrip_both_hemispheres():
    from rastertiler_rs_ray.geo.tmerc import (
        tmerc_forward,
        tmerc_inverse,
        utm_zone_params,
    )

    lon0, fn = utm_zone_params(32633)  # zone 33 north
    assert (lon0, fn) == (15.0, 0.0)
    lon0s, fns = utm_zone_params(32733)  # zone 33 south
    assert (lon0s, fns) == (15.0, 10_000_000.0)
    with pytest.raises(NotImplementedError):
        utm_zone_params(2154)  # Lambert-93, not UTM

    rng = np.random.RandomState(1)
    lon = rng.uniform(12, 18, 1000)
    lat = rng.uniform(-80, 84, 1000)
    for f_n in (0.0, 10_000_000.0):
        x, y = tmerc_forward(lon, lat, 15.0, f_n)
        lo, la = tmerc_inverse(x, y, 15.0, f_n)
        assert np.abs(lo - lon).max() < 1e-8
        assert np.abs(la - lat).max() < 1e-8


def test_utm_warp_golden_parity(tmp_path):
    """A UTM-authored raster rendered through the lazy warp must be
    bit-identical to the same data authored natively in 3857 (the warp
    grid materialized once) — the reference's any-CRS warped-VRT parity
    point (src/dataset.rs:74-110)."""
    # source: 600x400 10 m pixels in UTM zone 10, around (-122.3, 37.8)
    from rastertiler_rs_ray.geo.tmerc import tmerc_forward

    e0, n0 = tmerc_forward(np.float64(-122.35), np.float64(37.84), -123.0)
    t_utm = Affine(10.0, 0.0, float(e0), 0.0, -10.0, float(n0))
    rng = np.random.RandomState(7)
    arr = rng.randint(1, 255, size=(400, 600), dtype=np.uint8)
    p_utm = str(tmp_path / "utm.tif")
    write_geotiff(p_utm, arr, t_utm, nodata=0, crs_epsg=32610, tile_size=128)

    w = open_raster(p_utm)
    assert isinstance(w, MercatorWarp)
    assert w.dtype == "uint8" and w.nodata == 0

    # materialize the warp grid once and author it natively in 3857
    full = w.values_at(np.arange(w.width)[None, :], np.arange(w.height)[:, None])
    assert (full != 0).mean() > 0.5  # warp actually covers the source
    p_merc = str(tmp_path / "merc.tif")
    write_geotiff(p_merc, full, w.transform, nodata=0, crs_epsg=3857, tile_size=128)
    native = GeoTiffRaster(p_merc, disable_overviews=True)

    from rastertiler_rs_ray.geo.tileid import tile_range

    n = 0
    for z in (12, 14):
        tr = tile_range(z, w.bounds())
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                a = w.read_tile(z, x, y, 256)
                b = native.read_tile(z, x, y, 256)
                assert (a is None) == (b is None), (z, x, y)
                if a is not None:
                    assert np.array_equal(a, b), (z, x, y)
                    n += 1
    assert n > 4

    # spot-check the NN source index against the INDEPENDENT projection:
    # dest pixel center -> lon/lat -> Karney forward -> source pixel
    from rastertiler_rs_ray.geo import mercator_to_geo

    cols = np.arange(0, w.width, 17)
    rows = np.arange(0, w.height, 13)
    got = w.values_at(cols[None, :], rows[:, None])
    t = w.transform
    mx = t.c + (cols[None, :].astype(np.float64) + 0.5) * t.a
    my = t.f + (rows[:, None].astype(np.float64) + 0.5) * t.e
    lon, lat = mercator_to_geo(*np.broadcast_arrays(mx, my))
    ex, ny = _karney_tm_forward(lon, lat, -123.0)
    sx = np.floor((ex - t_utm.c) / 10.0).astype(np.int64)
    sy = np.floor((ny - t_utm.f) / -10.0).astype(np.int64)
    inside = (sx >= 0) & (sx < 600) & (sy >= 0) & (sy < 400)
    want = np.zeros_like(got)
    want[inside] = arr[sy[inside], sx[inside]]
    assert np.array_equal(got, want)


def test_open_raster_rejects_non_utm_projected(tmp_path):
    arr = _fixture_array()
    p = str(tmp_path / "weird.tif")
    write_geotiff(p, arr, _T, nodata=0, crs_epsg=2154, tile_size=256)
    with pytest.raises(NotImplementedError, match="EPSG:2154"):
        open_raster(p)


# ------------------------------------------------------------------ multiband


def _write_multiband_tiff(
    path, bands, *, planar=1, rps=7, compression=1, predictor=1,
    crs_epsg=3857,
):
    """Test-local minimal multi-band stripped TIFF writer (classic,
    little-endian).  ``bands``: list of (h, w) uint8/uint16 arrays.
    planar=1 interleaves samples per pixel; planar=2 writes one plane
    of strips per band (band-major, per TIFF 6.0)."""
    h, w = bands[0].shape
    dt = bands[0].dtype
    assert all(b.shape == (h, w) and b.dtype == dt for b in bands)
    spp = len(bands)
    cube = np.stack(bands, axis=-1)  # (h, w, spp)

    def enc(block):  # block: (rows, w, nsamp)
        if predictor == 2:
            d = block.astype(np.int64)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            block = d.astype(dt)
        raw = np.ascontiguousarray(block).tobytes()
        return zlib.compress(raw) if compression == 8 else raw

    strips = []
    if planar == 1:
        for y0 in range(0, h, rps):
            strips.append(enc(cube[y0 : y0 + rps]))
    else:
        for b in bands:
            for y0 in range(0, h, rps):
                strips.append(enc(b[y0 : y0 + rps, :, None]))

    body = bytearray()
    offsets, counts = [], []
    for s in strips:
        offsets.append(8 + len(body))
        counts.append(len(s))
        body += s
    bits = dt.itemsize * 8
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * spp),
        (259, 3, [compression]), (262, 3, [2 if spp >= 3 else 1]),
        (273, 4, offsets), (277, 3, [spp]), (278, 4, [rps]),
        (279, 4, counts), (284, 3, [planar]), (317, 3, [predictor]),
        (339, 3, [1] * spp),
        (33550, 12, [_RES, _RES, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, _T.c, _T.f, 0.0]),
        (34735, 3, [1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1,
                    3072, 0, 1, crs_epsg]),
    ]
    tags.sort()
    ifd_off = 8 + len(body)
    out = bytearray(b"II" + struct.pack("<HI", 42, ifd_off)) + body
    sizes = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}
    ifd = bytearray(struct.pack("<H", len(tags)))
    extra_off = ifd_off + 2 + 12 * len(tags) + 4
    extra = bytearray()
    for tag, ftype, vals in tags:
        ch, _ = sizes[ftype]
        payload = struct.pack("<" + ch * len(vals), *vals)
        ifd += struct.pack("<HHI", tag, ftype, len(vals))
        if len(payload) <= 4:
            ifd += payload.ljust(4, b"\0")
        else:
            ifd += struct.pack("<I", extra_off + len(extra))
            extra += payload
    ifd += struct.pack("<I", 0)
    out += ifd + extra
    with open(path, "wb") as f:
        f.write(out)


@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("comp,pred", [(1, 1), (8, 2)])
def test_multiband_reads_band1(tmp_path, planar, comp, pred):
    """Multi-band TIFFs open and read BAND 1 (ref src/dataset.rs:112-114,
    src/render.rs:34) for both chunky and planar layouts, with and
    without deflate + per-component horizontal predictor."""
    rng = np.random.RandomState(11)
    h, w = 23, 37
    bands = [rng.randint(1, 255, size=(h, w)).astype(np.uint8) for _ in range(3)]
    p = str(tmp_path / f"mb_{planar}_{comp}.tif")
    _write_multiband_tiff(p, bands, planar=planar, compression=comp, predictor=pred)
    g = GeoTiffRaster(p)
    assert g.samples_per_px == 3
    got = g.values_at(np.arange(w)[None, :], np.arange(h)[:, None])
    assert np.array_equal(got, bands[0])


def test_multiband_uint16_chunky(tmp_path):
    rng = np.random.RandomState(5)
    h, w = 19, 31
    bands = [rng.randint(1, 60000, size=(h, w)).astype(np.uint16) for _ in range(2)]
    p = str(tmp_path / "mb16.tif")
    _write_multiband_tiff(p, bands, planar=1, compression=8, predictor=2)
    g = GeoTiffRaster(p)
    assert g.dtype == "uint16" and g.samples_per_px == 2
    got = g.values_at(np.arange(w)[None, :], np.arange(h)[:, None])
    assert np.array_equal(got, bands[0])


# ------------------------------------------------------------------ EPSG:3395


def test_world_mercator_projection_math():
    """EPSG:3395 forward/inverse: roundtrip to float64 round-off and the
    inverse fixed-point cross-checked against the INDEPENDENT conformal-
    latitude series (Snyder 3-5) — two different formulations."""
    from rastertiler_rs_ray.geo.tmerc import (
        world_mercator_forward,
        world_mercator_inverse,
    )

    rng = np.random.RandomState(2)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    x, y = world_mercator_forward(lon, lat)
    lon2, lat2 = world_mercator_inverse(x, y)
    assert np.max(np.abs(lon2 - lon)) < 1e-11
    assert np.max(np.abs(lat2 - lat)) < 1e-11

    # independent inverse: conformal latitude chi -> phi series (Snyder 3-5)
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    e4, e6, e8 = e2**2, e2**3, e2**4
    chi = np.pi / 2.0 - 2.0 * np.arctan(np.exp(-y / a))
    phi = (
        chi
        + (e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0) * np.sin(2 * chi)
        + (7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0) * np.sin(4 * chi)
        + (7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0) * np.sin(6 * chi)
        + (4279.0 * e8 / 161280.0) * np.sin(8 * chi)
    )
    assert np.max(np.abs(np.degrees(phi) - lat2)) < 1e-9

    # ellipsoidal vs spherical Mercator differ materially mid-latitude
    from rastertiler_rs_ray.geo import geo_to_mercator

    _, y_sph = geo_to_mercator(np.float64(0.0), np.float64(45.0))
    _, y_ell = world_mercator_forward(np.float64(0.0), np.float64(45.0))
    assert 15_000 < abs(float(y_sph) - float(y_ell)) < 40_000


def test_world_mercator_warp_golden_parity(tmp_path):
    """A 3395-authored raster rendered through the lazy warp must be
    bit-identical to the same warped grid authored natively in 3857 —
    the UTM golden-twin pattern extended one CRS tier."""
    from rastertiler_rs_ray.geo.tmerc import world_mercator_forward

    e0, n0 = world_mercator_forward(np.float64(11.3), np.float64(48.3))
    t_wm = Affine(25.0, 0.0, float(e0), 0.0, -25.0, float(n0))
    rng = np.random.RandomState(21)
    arr = rng.randint(1, 255, size=(400, 600), dtype=np.uint8)
    p_wm = str(tmp_path / "wm.tif")
    write_geotiff(p_wm, arr, t_wm, nodata=0, crs_epsg=3395, tile_size=128)

    w = open_raster(p_wm)
    assert isinstance(w, MercatorWarp)
    full = w.values_at(np.arange(w.width)[None, :], np.arange(w.height)[:, None])
    assert (full != 0).mean() > 0.5
    p_merc = str(tmp_path / "wm_native.tif")
    write_geotiff(p_merc, full, w.transform, nodata=0, crs_epsg=3857, tile_size=128)
    native = GeoTiffRaster(p_merc, disable_overviews=True)

    from rastertiler_rs_ray.geo.tileid import tile_range

    n = 0
    for z in (12, 14):
        tr = tile_range(z, w.bounds())
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                a = w.read_tile(z, x, y, 256)
                b = native.read_tile(z, x, y, 256)
                assert (a is None) == (b is None), (z, x, y)
                if a is not None:
                    assert np.array_equal(a, b), (z, x, y)
                    n += 1
    assert n > 4


# ------------------------------------------------------------- conic (LCC/Albers)


def test_conic_projection_math_snyder_examples():
    """LCC-2SP and Albers forward/inverse pinned to Snyder PP1395's
    published worked examples (Clarke 1866 ellipsoid, pp. 291-297) to
    sub-metre, plus WGS84 roundtrip to machine precision."""
    from rastertiler_rs_ray.geo.conic import AlbersEqualArea, LambertConformalConic

    a = 6378206.4
    e2 = 0.00676866
    f = 1 - (1 - e2) ** 0.5
    lcc = LambertConformalConic(33.0, 45.0, 23.0, -96.0, a=a, f=f)
    x, y = lcc.forward(-75.0, 35.0)
    assert abs(float(x) - 1894410.9) < 0.5 and abs(float(y) - 1564649.5) < 0.5
    alb = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, a=a, f=f)
    x, y = alb.forward(-75.0, 35.0)
    assert abs(float(x) - 1885472.7) < 0.5 and abs(float(y) - 1535925.0) < 0.5

    rng = np.random.RandomState(1)
    for proj in (
        LambertConformalConic(33.0, 45.0, 23.0, -96.0, 2_000_000.0, 500_000.0),
        AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    ):
        lo = rng.uniform(-130, -60, 800)
        la = rng.uniform(10, 65, 800)
        X, Y = proj.forward(lo, la)
        lo2, la2 = proj.inverse(X, Y)
        assert np.abs(lo2 - lo).max() < 1e-11
        assert np.abs(la2 - la).max() < 1e-11


@pytest.mark.parametrize("kind,params", [
    ("lcc2sp", dict(lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0,
                    fe=2_000_000.0, fn=500_000.0)),
    ("albers2sp", dict(lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0,
                       fe=0.0, fn=0.0)),
])
def test_conic_warp_golden_parity(tmp_path, kind, params):
    """A conic-authored raster (user-defined CRS, parameters in
    GeoDoubleParams) rendered through the lazy warp must be
    bit-identical to the warp grid authored natively in 3857."""
    from rastertiler_rs_ray.geo.conic import AlbersEqualArea, LambertConformalConic

    cls = LambertConformalConic if kind == "lcc2sp" else AlbersEqualArea
    proj = cls(params["lat1"], params["lat2"], params["lat0"], params["lon0"],
               params["fe"], params["fn"])
    e0, n0 = proj.forward(np.float64(-97.2), np.float64(39.4))
    t_c = Affine(40.0, 0.0, float(e0), 0.0, -40.0, float(n0))
    rng = np.random.RandomState(31)
    arr = rng.randint(1, 255, size=(300, 500), dtype=np.uint8)
    p_c = str(tmp_path / f"{kind}.tif")
    write_geotiff(p_c, arr, t_c, nodata=0, tile_size=128,
                  projection=dict(kind=kind, **params))

    g = GeoTiffRaster(p_c)
    assert g.crs_epsg == 32767  # user-defined, parameterized
    w = open_raster(p_c)
    assert isinstance(w, MercatorWarp)
    full = w.values_at(np.arange(w.width)[None, :], np.arange(w.height)[:, None])
    assert (full != 0).mean() > 0.5
    p_merc = str(tmp_path / f"{kind}_native.tif")
    write_geotiff(p_merc, full, w.transform, nodata=0, crs_epsg=3857, tile_size=128)
    native = GeoTiffRaster(p_merc, disable_overviews=True)

    from rastertiler_rs_ray.geo.tileid import tile_range

    n = 0
    for z in (11, 13):
        tr = tile_range(z, w.bounds())
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                a = w.read_tile(z, x, y, 256)
                b = native.read_tile(z, x, y, 256)
                assert (a is None) == (b is None), (z, x, y)
                if a is not None:
                    assert np.array_equal(a, b), (z, x, y)
                    n += 1
    assert n > 4
