"""Heatmap tileset rendering: pixel-level decode parity vs numpy."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray.data

from rastertiler_rs_ray.pipelines.heatmap import render_density_tileset
from rastertiler_rs_ray.png.writer import decode_png

O = 20037508.342789244


def _points(n=3000, seed=21):
    rng = np.random.default_rng(seed)
    return pa.table({"mx": rng.uniform(-O, O, n), "my": rng.uniform(-O, O, n)})


def _bin(t, zoom, ts):
    npx = (1 << zoom) * ts
    mx = t.column("mx").to_numpy()
    my = t.column("my").to_numpy()
    px = np.clip(np.floor((mx + O) / (2 * O) * npx), 0, npx - 1).astype(int)
    py = np.clip(np.floor((1 - (my + O) / (2 * O)) * npx), 0, npx - 1).astype(int)
    grids = {}
    for a, b in zip(px, py):
        key = (a // ts, b // ts)
        g = grids.setdefault(key, np.zeros((ts, ts), dtype=np.int64))
        g[b % ts, a % ts] += 1
    return grids


def test_heatmap_decode_parity(ray_session, tmp_path):
    t = _points()
    zoom, ts = 3, 32
    out = str(tmp_path / "hm")
    render_density_tileset(ray.data.from_arrow(t), out, [zoom], tilesize=ts)

    want = _bin(t, zoom, ts)
    rows = pads.dataset(os.path.join(out, "tiles"), format="parquet").to_table()
    got = {}
    for i in range(len(rows)):
        key = (rows.column("x")[i].as_py(), rows.column("y")[i].as_py())
        info = decode_png(rows.column("tile_data")[i].as_py())
        got[key] = info["pixels"]
        # tms flip stored alongside (ref src/mbtiles.rs:111-113)
        assert rows.column("tms_y")[i].as_py() == (1 << zoom) - 1 - key[1]
    assert set(got) == set(want)  # only lit tiles written, all of them
    for key, grid in want.items():
        sat = np.minimum(grid, 255).astype(np.uint8)
        assert np.array_equal(got[key], sat), key


def test_heatmap_saturation_and_colormap(ray_session, tmp_path):
    # all points on ONE pixel → count ≫ 255 saturates
    t = pa.table({"mx": np.full(500, 1000.0), "my": np.full(500, 2000.0)})
    out = str(tmp_path / "sat")
    render_density_tileset(ray.data.from_arrow(t), out, [2], tilesize=16)
    rows = pads.dataset(os.path.join(out, "tiles"), format="parquet").to_table()
    assert len(rows) == 1
    px = decode_png(rows.column("tile_data")[0].as_py())["pixels"]
    assert px.max() == 255 and (px > 0).sum() == 1

    # colormap path: indexed PNG, palette present
    out2 = str(tmp_path / "cm")
    render_density_tileset(
        ray.data.from_arrow(_points(400)), out2, [2], tilesize=16,
        colormap="1:#0000ff,2:#00ff00,255:#ff0000",
    )
    rows2 = pads.dataset(os.path.join(out2, "tiles"), format="parquet").to_table()
    info = decode_png(rows2.column("tile_data")[0].as_py())
    assert info["color_type"] == 3  # indexed


def test_heatmap_composes_with_tileset_ops(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.merge import diff_tilesets

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    render_density_tileset(ray.data.from_arrow(_points(seed=1)), a, [2], tilesize=16)
    render_density_tileset(ray.data.from_arrow(_points(seed=2)), b, [2], tilesize=16)
    d = diff_tilesets(a, b).to_pandas()
    assert (d["change"] == "changed").any()  # same cover, different densities
