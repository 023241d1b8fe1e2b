"""Heatmap tileset rendering: point dataset → density PNG pyramid.

The vector→raster flagship composition: doc/point positions bin to
per-tile density grids (``spatial.point_density_blocks`` — one narrow
groupby per zoom, points never carry payloads), each grid saturates to
uint8 and encodes through the SAME PNG machinery the raster renderer
uses (grayscale + tRNS, or an indexed colormap with the reference's
nodata-slot-0 convention, png/encoders.py), and the tiles land in the
standard tileset layout (tiles/part=g{zz}, images/ content-dedup,
manifest) — so merge / diff / audit / export_mbtiles all work on a
heatmap tileset unchanged.

Scale contract: the only exchange per zoom is the density groupby on
the tile address (sparse (tile, pixel) rows, ~24 B per LIT pixel — at
z where most pixels are empty this is far below dense grids); encoding
is map-only; the images dedup is the renderer's narrow-key winner
election (blobs never shuffle).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..functions.hashing import content_hash64
from ..state.manifest import Manifest


def _dedupe_images(out_dir: str, manifest: Manifest) -> None:
    """MBTiles `images` table: content-hash keep-first dedup via the
    render sink's shared election (render.write_deduped_images — narrow
    pack → driver reduce → broadcast winner filter; blobs never
    shuffle; driver budget O(distinct hashes) with the hash-shuffle
    semi-join named there as the beyond-memory swap)."""
    from .render import write_deduped_images

    images_dir = os.path.join(out_dir, "images")
    if os.path.exists(images_dir):
        shutil.rmtree(images_dir)
    t0 = time.perf_counter()
    tiles_path = os.path.join(out_dir, "tiles")
    write_deduped_images(
        lambda columns: ray.data.read_parquet(tiles_path, columns=columns),
        images_dir,
    )
    rows = pads.dataset(images_dir, format="parquet").count_rows()
    manifest.record_complete("images", rows=rows, wall_s=time.perf_counter() - t0)


class _DensityTileEncoder:
    """Actor-pool stage: (zoom, x, y, pixels uint32) → tileset row.
    Encoder state (palette parse, PNG chunk scaffolding) built once per
    actor; zero-count pixels are the transparent nodata slot."""

    def __init__(self, tilesize: int, colormap: str | None):
        from ..png.color import parse_colormap
        from ..png.encoders import ColormapEncoder, GrayscaleEncoder

        self.ts = int(tilesize)
        if colormap:
            self.enc = ColormapEncoder(self.ts, self.ts, parse_colormap(colormap, nodata=0))
        else:
            self.enc = GrayscaleEncoder(self.ts, self.ts, nodata=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        zs = batch.column("zoom").to_numpy(zero_copy_only=False)
        out_png, out_hash, out_tms = [], [], []
        for i in range(len(batch)):
            grid = np.frombuffer(batch.column("pixels")[i].as_py(), dtype=np.uint32)
            levels = np.minimum(grid, 255).astype(np.uint8)  # saturating u8
            png = self.enc.encode(levels)
            out_png.append(png)
            out_hash.append(content_hash64(png))
            z = int(zs[i])
            out_tms.append((1 << z) - 1 - int(batch.column("y")[i].as_py()))
        return pa.table(
            {
                "zoom": pa.compute.cast(batch.column("zoom"), pa.uint8()),
                "x": pa.compute.cast(batch.column("x"), pa.uint32()),
                "y": pa.compute.cast(batch.column("y"), pa.uint32()),
                "tms_y": pa.array(out_tms, pa.uint32()),
                "tile_hash": pa.array(out_hash, pa.int64()),
                "tile_data": pa.array(out_png, pa.binary()),
                "part": pa.array(
                    [f"g{int(z):02d}" for z in zs], pa.string()
                ),
            }
        )


def render_density_tileset(
    pos: ray.data.Dataset,
    out_dir: str,
    zooms: list[int],
    *,
    tilesize: int = 256,
    colormap: str | None = None,
    concurrency=(1, 4),
) -> Manifest:
    """Render a heatmap tile pyramid from a point dataset into the
    standard tileset layout.  Counts saturate at 255 per pixel (the u8
    density level); count 0 = transparent nodata (slot-0 convention,
    ref src/png/color.rs:52-57).  Only tiles containing ≥1 point are
    written — the sparse-pyramid convention (a CDN 404 = empty tile),
    which is what makes a z15 world heatmap feasible.
    """
    from .spatial import point_density_blocks_multi

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    t0 = time.perf_counter()

    # one exchange + one encode/write job for the whole pyramid — the
    # per-zoom fixed Ray-job cost doesn't multiply with pyramid depth
    blocks = point_density_blocks_multi(pos, zooms=zooms, tilesize=tilesize)
    tiles = blocks.map_batches(
        _DensityTileEncoder,
        fn_constructor_kwargs=dict(tilesize=tilesize, colormap=colormap),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    tiles.write_parquet(
        os.path.join(out_dir, "tiles"),
        partition_cols=["part"],
        min_rows_per_file=32768,
    )

    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    wall = time.perf_counter() - t0
    manifest.set_meta(
        metadata={
            "name": "density",
            "type": "overlay",
            "format": "png",
            "version": "1.0.0",
            "minzoom": str(min(zooms)),
            "maxzoom": str(max(zooms)),
        },
        tilesize=tilesize,
        minzoom=min(zooms),
        maxzoom=max(zooms),
    )
    for z in zooms:
        part_dir = os.path.join(out_dir, "tiles", f"part=g{z:02d}")
        rows = (
            pads.dataset(part_dir, format="parquet").count_rows()
            if os.path.exists(part_dir)
            else 0
        )
        manifest.record_complete(f"tiles/g{z:02d}", rows=rows, wall_s=wall, zooms=[z])
    _dedupe_images(out_dir, manifest)
    return manifest
