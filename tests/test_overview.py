"""Overview roll-up (pipelines/overview.py): derive z-1 from z tiles.

Exactness contracts pinned here:
- ONE level below a native-resolution base zoom, roll-up output is
  bit-identical (same map rows, same content hashes) to rendering that
  zoom directly from the source — at full AND partial raster coverage.
- TWO levels down, the composed NN rule picks src[4i+3, 4j+3]
  (NN-of-NN), verified against the source pixel function directly.
  Direct render would pick src[4i+2] — overviews-of-overviews are the
  same approximation GDAL's are; the composition rule is what we pin.
"""

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from rastertiler_rs_ray.geo import CE, ORIGIN
from rastertiler_rs_ray.geo.affine import Affine
from rastertiler_rs_ray.raster.synthetic import SyntheticRaster

TS = 64
BASE_Z = 4


def aligned_raster(tiles_w=5, tiles_h=3, origin_tile=(3, 2), dtype="uint8", seed=7):
    """Raster whose grid coincides with the BASE_Z pixel grid (native res)."""
    res = CE / ((1 << BASE_Z) * TS)
    tx, ty = origin_tile
    x0 = -ORIGIN + tx * CE / (1 << BASE_Z)
    y0 = ORIGIN - ty * CE / (1 << BASE_Z)
    return SyntheticRaster(
        dtype=dtype,
        nodata=0,
        width=tiles_w * TS,
        height=tiles_h * TS,
        transform=Affine(res, 0.0, x0, 0.0, -res, y0),
        seed=seed,
    )


def _map_df(out_dir):
    t = pads.dataset(f"{out_dir}/tiles", format="parquet").to_table(
        columns=["zoom", "x", "y", "tms_y", "tile_hash"]
    )
    return (
        t.to_pandas()
        .astype({"zoom": int, "x": int, "y": int, "tms_y": int})
        .sort_values(["zoom", "x", "y"])
        .reset_index(drop=True)
    )


class TestRollupMatchesDirectRender:
    def _check(self, raster, tmp_path, colormap=None):
        from rastertiler_rs_ray.pipelines.overview import rollup_overviews
        from rastertiler_rs_ray.pipelines.render import render_pyramid

        direct = str(tmp_path / "direct")
        rolled = str(tmp_path / "rolled")
        render_pyramid(
            raster, direct, BASE_Z - 1, BASE_Z, tilesize=TS,
            colormap=colormap, resume=False,
        )
        render_pyramid(
            raster, rolled, BASE_Z, BASE_Z, tilesize=TS,
            colormap=colormap, resume=False,
        )
        rollup_overviews(rolled, BASE_Z - 1, colormap=colormap)
        want, got = _map_df(direct), _map_df(rolled)
        pd.testing.assert_frame_equal(want, got)
        assert (got.zoom == BASE_Z - 1).any()

    def test_full_coverage(self, ray_session, tmp_path):
        self._check(aligned_raster(), tmp_path)

    def test_partial_coverage(self, ray_session, tmp_path):
        # odd tile counts + odd origin: parents on the raster edge get
        # nodata quadrants from missing children
        self._check(aligned_raster(tiles_w=3, tiles_h=1, origin_tile=(5, 3)), tmp_path)

    def test_colormap_path(self, ray_session, tmp_path):
        # synthetic u8 values land in [0, 255]; map a handful and let
        # the rest render transparent (index 0) — lossy-by-design both
        # in the base render and the roll-up
        cm = ",".join(f"{v}:#{v:02x}{255 - v:02x}40" for v in range(1, 17))
        self._check(aligned_raster(), tmp_path, colormap=cm)


class TestComposedTwoLevels:
    def test_pixel_rule_src_4i_plus_3(self, ray_session, tmp_path):
        from rastertiler_rs_ray.pipelines.overview import rollup_overviews
        from rastertiler_rs_ray.pipelines.render import render_pyramid
        from rastertiler_rs_ray.png.writer import decode_png

        raster = aligned_raster(tiles_w=4, tiles_h=4, origin_tile=(4, 2))
        out = str(tmp_path / "two")
        render_pyramid(raster, out, BASE_Z, BASE_Z, tilesize=TS, resume=False)
        rollup_overviews(out, BASE_Z - 2)

        t = (
            pads.dataset(f"{out}/tiles", format="parquet")
            .to_table(columns=["zoom", "x", "y", "tile_data"])
            .to_pandas()
        )
        lvl2 = t[t.zoom == BASE_Z - 2]
        assert len(lvl2) >= 1
        # raster origin tile (4,2) at z4 → global z4 px origin (4*TS, 2*TS)
        gx0, gy0 = 4 * TS, 2 * TS
        for _, row in lvl2.iterrows():
            px = decode_png(bytes(row.tile_data))["pixels"]
            # z2 tile pixel (i, j) ← z4 mosaic pixel (4i+3, 4j+3) in the
            # tile's own frame; z2 tile (x,y) spans z4 px [x*4*TS, ...)
            jj = np.arange(TS) * 4 + 3 + int(row.x) * 4 * TS
            ii = np.arange(TS) * 4 + 3 + int(row.y) * 4 * TS
            cols = jj - gx0
            rows = ii - gy0
            inb_j = (cols >= 0) & (cols < raster.width)
            inb_i = (rows >= 0) & (rows < raster.height)
            want = np.zeros((TS, TS), np.uint8)  # nodata
            if inb_j.any() and inb_i.any():
                vals = raster.values_at(
                    cols[inb_j][None, :], rows[inb_i][:, None]
                )
                want[np.ix_(inb_i, inb_j)] = vals
            np.testing.assert_array_equal(px, want)


class TestImagesAndGuards:
    def test_images_updated_no_dup_hashes(self, ray_session, tmp_path):
        from rastertiler_rs_ray.pipelines.overview import rollup_overviews
        from rastertiler_rs_ray.pipelines.render import render_pyramid

        out = str(tmp_path / "img")
        render_pyramid(aligned_raster(), out, BASE_Z, BASE_Z, tilesize=TS, resume=False)
        rollup_overviews(out, BASE_Z - 2)
        imgs = pads.dataset(f"{out}/images", format="parquet").to_table(
            columns=["tile_hash"]
        )
        hashes = imgs.column("tile_hash").to_numpy()
        assert len(hashes) == len(np.unique(hashes))
        tile_hashes = (
            pads.dataset(f"{out}/tiles", format="parquet")
            .to_table(columns=["tile_hash"])
            .column("tile_hash")
            .to_numpy()
        )
        assert set(np.unique(tile_hashes)) == set(hashes)

    def test_resume_skips_complete_levels(self, ray_session, tmp_path):
        from rastertiler_rs_ray.pipelines.overview import rollup_overviews
        from rastertiler_rs_ray.pipelines.render import render_pyramid
        from rastertiler_rs_ray.state.manifest import Manifest
        import os

        out = str(tmp_path / "res")
        render_pyramid(aligned_raster(), out, BASE_Z, BASE_Z, tilesize=TS, resume=False)
        rollup_overviews(out, BASE_Z - 1)
        stamp = os.path.getmtime(
            next(
                os.path.join(r, f)
                for r, _, fs in os.walk(f"{out}/tiles/part=o{BASE_Z - 1:02d}")
                for f in fs
            )
        )
        rollup_overviews(out, BASE_Z - 1)  # no-op resume
        stamp2 = os.path.getmtime(
            next(
                os.path.join(r, f)
                for r, _, fs in os.walk(f"{out}/tiles/part=o{BASE_Z - 1:02d}")
                for f in fs
            )
        )
        assert stamp == stamp2
        assert Manifest(os.path.join(out, "manifest.json")).get_meta("minzoom") == BASE_Z - 1

    def test_u32_rolls_up_rgb_pixel_parity(self, ray_session, tmp_path):
        """u32 tilesets roll up in RGB space: rolled parents must be
        PIXEL-identical (as RGB) to directly rendered parents at native
        resolution — bytes may differ (direct render may pick the
        indexed encoding; roll-up always emits RGB), so the comparison
        decodes both to RGB."""
        from rastertiler_rs_ray.pipelines.overview import rollup_overviews
        from rastertiler_rs_ray.pipelines.render import render_pyramid
        from rastertiler_rs_ray.png.writer import decode_png

        raster = aligned_raster(dtype="uint32", seed=9)
        direct = str(tmp_path / "u32_direct")
        rolled = str(tmp_path / "u32_rolled")
        render_pyramid(raster, direct, BASE_Z - 1, BASE_Z, tilesize=TS, resume=False)
        render_pyramid(raster, rolled, BASE_Z, BASE_Z, tilesize=TS, resume=False)
        rollup_overviews(rolled, BASE_Z - 1)

        def rgb_tiles(out_dir, zoom):
            t = (
                pads.dataset(f"{out_dir}/tiles", format="parquet")
                .to_table(columns=["zoom", "x", "y", "tile_data"])
                .to_pandas()
            )
            t = t[t.zoom == zoom]
            out = {}
            for _, row in t.iterrows():
                info = decode_png(bytes(row.tile_data))
                if info["color_type"] == 2:
                    px = info["pixels"]
                else:
                    pal = np.frombuffer(info["palette"], np.uint8).reshape(-1, 3)
                    px = pal[info["pixels"]]
                out[(int(row.x), int(row.y))] = px
            return out

        want = rgb_tiles(direct, BASE_Z - 1)
        got = rgb_tiles(rolled, BASE_Z - 1)
        assert want.keys() == got.keys() and len(want) >= 1
        for key in want:
            np.testing.assert_array_equal(want[key], got[key])
