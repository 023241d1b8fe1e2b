"""Overview roll-up: derive zoom z-1 tiles from the zoom-z tiles.

The reference gets reduced-resolution pyramids from GDAL overview IFDs
(read side: OVERVIEW_LEVEL, /root/reference/src/dataset.rs:25-35) and
otherwise re-reads the source raster at every zoom
(/root/reference/src/render.rs:103-122 enumerates every zoom against
the same VRT).  At the 100-TB design point the scale path is: render
the BASE zoom from the source once, then derive each coarser zoom from
the zoom above it — one ``groupby((x>>1, y>>1))`` per level over the
already-rendered tiles, never touching the source again.  Each level
is 1/4 the previous, so the whole overview stack costs ~1/3 of the
base render regardless of depth.

Decimation rule: parent pixel (i, j) takes child-mosaic pixel
(2i+1, 2j+1) — exactly the read kernel's NN rule
``floor((i + 0.5) * read / out)`` at read/out = 2
(raster/kernel.py ``nn_decimation_indices``).  When the base zoom is
at native source resolution the rolled-up levels are therefore
BIT-IDENTICAL to rendering each zoom from the source (pinned by tests
at full and partial raster coverage).  Away from native resolution the
roll-up is the same approximation GDAL overviews are — which is why
the reference grew ``--disable-overviews`` (src/main.rs:52-56); our
render path likewise only selects true overview IFDs, and this module
is the explicit, opt-in way to build them.

Children missing from a level (all-nodata, skipped at render — G1)
contribute nodata quadrants; an all-nodata parent is skipped, matching
what a direct render of the parent would do.

u8 grayscale and u8+colormap tilesets roll up (indexed tiles decode to
palette indices and invert through the colormap; values absent from
the colormap rendered transparent at the base zoom and stay
transparent — the same lossy-by-design semantics as the base render,
ref src/png/color.rs:99-106).  u32 tilesets (dynamic palette with RGB
fallback, G4) roll up in RGB space: children decode to RGB pixels
(per-tile palettes applied), the parent NN-decimates the RGB mosaic
and re-encodes as an RGB tile.  The value→color map
(``rgb8_from_u32``) is a pure per-pixel function, so rolled parents
are PIXEL-identical to a direct parent render; tile BYTES may differ
from a direct render when the direct encoder would have chosen the
indexed path (the u32→RGB truncation above 24 bits is not invertible,
so the dynamic palette's first-occurrence-of-value order cannot be
reconstructed from blobs — rolled parents always take the RGB
encoding).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..functions.hashing import content_hash64
from ..png.color import Colormap, parse_colormap
from ..png.encoders import ColormapEncoder, GrayscaleEncoder, RGBEncoder
from ..png.writer import decode_png
from ..stages.tile_render import TILE_SCHEMA
from ..state.manifest import Manifest


def _inverse_palette(cm: Colormap) -> np.ndarray:
    """Palette index → original pixel value (index 0 → nodata)."""
    inv = np.full(len(cm), cm.nodata, dtype=np.int64)
    for value, idx in cm._values.items():
        inv[idx] = value
    return inv


def rollup_level(
    tiles: ray.data.Dataset,
    *,
    tilesize: int,
    nodata: int,
    colormap: str | None = None,
) -> ray.data.Dataset:
    """One pyramid level down: tiles at zoom z → tiles at zoom z-1.

    ``tiles`` must carry (zoom, x, y, tile_data) rows of a SINGLE zoom
    level z ≥ 1.  Returns TILE_SCHEMA rows at z-1 (tms_y/tile_hash
    recomputed).  The only data motion is the groupby on the packed
    parent key — each PNG blob moves to its parent's group exactly
    once; parents decode at most 4 children, so group size is bounded
    regardless of corpus size.
    """
    ts = int(tilesize)
    inv = _inverse_palette(parse_colormap(colormap, nodata)) if colormap else None

    def to_parent_key(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy().astype(np.int64)
        y = batch.column("y").to_numpy().astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(((x >> 1) << 31) | (y >> 1), pa.int64()),
                "zoom": batch.column("zoom"),
                "x": batch.column("x"),
                "y": batch.column("y"),
                "tile_data": batch.column("tile_data"),
            }
        )

    def roll(group: pa.Table) -> pa.Table:
        zoom = int(group.column("zoom")[0].as_py())
        xs = group.column("x").to_numpy().astype(np.int64)
        ys = group.column("y").to_numpy().astype(np.int64)
        blobs = group.column("tile_data").to_pylist()

        infos = [decode_png(bytes(b)) for b in blobs]
        # u32 tilesets (RGB tiles, or per-tile dynamic palettes with no
        # global colormap) roll up in RGB space — see module docstring.
        rgb_mode = any(
            i["color_type"] == 2 or (i["color_type"] == 3 and inv is None)
            for i in infos
        )

        if rgb_mode:
            from ..png.color import rgb8_from_u32

            nr, ng, nb = rgb8_from_u32(np.uint32(nodata))
            nod_rgb = np.array([nr, ng, nb], dtype=np.uint8)
            mosaic3 = np.broadcast_to(nod_rgb, (2 * ts, 2 * ts, 3)).copy()
            for x, y, info in zip(xs, ys, infos):
                ct = info["color_type"]
                if ct == 2:
                    px = info["pixels"]
                elif ct == 3:  # per-tile dynamic palette → RGB
                    pal = np.frombuffer(info["palette"], np.uint8).reshape(-1, 3)
                    px = pal[info["pixels"]]
                else:  # grayscale child in a u32 set: value → its RGB
                    r, g, b_ = rgb8_from_u32(info["pixels"].astype(np.uint32))
                    px = np.stack([r, g, b_], axis=-1)
                qx, qy = int(x & 1), int(y & 1)
                mosaic3[qy * ts : (qy + 1) * ts, qx * ts : (qx + 1) * ts] = px
            out3 = mosaic3[1::2, 1::2]  # NN floor((i+0.5)*2) = 2i+1
            if np.all(out3 == nod_rgb):
                return TILE_SCHEMA.empty_table()
            png = RGBEncoder(ts, ts, nodata).encode_rgb(out3)
            pz, px_, py = zoom - 1, int(xs[0]) >> 1, int(ys[0]) >> 1
            return pa.table(
                {
                    "zoom": pa.array([pz], pa.uint8()),
                    "x": pa.array([px_], pa.uint32()),
                    "y": pa.array([py], pa.uint32()),
                    "tms_y": pa.array([(1 << pz) - 1 - py], pa.uint32()),
                    "tile_hash": pa.array([content_hash64(png)], pa.int64()),
                    "tile_data": pa.array([png], pa.binary()),
                },
                schema=TILE_SCHEMA,
            )

        mosaic = np.full((2 * ts, 2 * ts), nodata, dtype=np.uint8)
        for x, y, info in zip(xs, ys, infos):
            px = info["pixels"]
            if info["color_type"] == 3:  # indexed → invert to values
                px = inv[px].astype(np.uint8)
            qx, qy = int(x & 1), int(y & 1)
            mosaic[qy * ts : (qy + 1) * ts, qx * ts : (qx + 1) * ts] = px

        out = mosaic[1::2, 1::2]  # NN floor((i+0.5)*2) = 2i+1
        if np.all(out == np.uint8(nodata)):
            return TILE_SCHEMA.empty_table()

        if inv is not None:
            png = ColormapEncoder(ts, ts, parse_colormap(colormap, nodata)).encode(out)
        else:
            png = GrayscaleEncoder(ts, ts, nodata).encode(out)
        pz, px_, py = zoom - 1, int(xs[0]) >> 1, int(ys[0]) >> 1
        return pa.table(
            {
                "zoom": pa.array([pz], pa.uint8()),
                "x": pa.array([px_], pa.uint32()),
                "y": pa.array([py], pa.uint32()),
                "tms_y": pa.array([(1 << pz) - 1 - py], pa.uint32()),
                "tile_hash": pa.array([content_hash64(png)], pa.int64()),
                "tile_data": pa.array([png], pa.binary()),
            },
            schema=TILE_SCHEMA,
        )

    return (
        tiles.map_batches(to_parent_key, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(roll, batch_format="pyarrow")
    )


def rollup_overviews(
    out_dir: str,
    min_zoom: int,
    *,
    colormap: str | None = None,
    resume: bool = True,
) -> Manifest:
    """Extend a rendered tileset down to ``min_zoom`` in place.

    Reads the tileset's current minzoom level, derives each coarser
    level from the one above (``rollup_level``), writes it as its own
    ``tiles/part=o{z}`` partition (sorted by (zoom, x, y) — the S8
    index ordering each partition file keeps), appends the genuinely
    new content hashes to ``images/``, and updates manifest metadata.
    Each level is a manifest checkpoint: a killed run resumes at the
    first incomplete level.
    """
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    tilesize = int(manifest.get_meta("tilesize"))
    base_min = int(manifest.get_meta("minzoom"))
    if min_zoom == base_min:
        return manifest  # already extends this deep — resumed no-op
    if min_zoom > base_min:
        raise ValueError(f"min_zoom {min_zoom} must be below tileset minzoom {base_min}")
    if min_zoom < 0:
        raise ValueError("min_zoom must be >= 0")

    from ..raster.factory import raster_from_spec

    nodata = int(raster_from_spec(manifest.get_meta("raster_spec")).nodata)

    tiles_root = os.path.join(out_dir, "tiles")
    for z in range(base_min, min_zoom, -1):  # produce level z-1 from z
        part = f"tiles/o{z - 1:02d}"
        part_dir = os.path.join(tiles_root, f"part=o{z - 1:02d}")
        if resume and manifest.is_complete(part):
            continue
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        t0 = time.perf_counter()
        import pyarrow.compute as pc

        level = ray.data.read_parquet(
            tiles_root,
            columns=["zoom", "x", "y", "tile_data"],
            filter=(pc.field("zoom") == z),
        )
        rolled = rollup_level(
            level, tilesize=tilesize, nodata=nodata, colormap=colormap
        ).sort(["zoom", "x", "y"])
        rolled.write_parquet(part_dir, min_rows_per_file=32768)
        rows = pads.dataset(part_dir, format="parquet").count_rows()
        manifest.record_complete(
            part, rows=rows, wall_s=round(time.perf_counter() - t0, 3), zooms=[z - 1]
        )

    # Append the NEW content hashes to images/ (MBTiles `images` norm,
    # G5).  Same bounded-broadcast contract as the render pipeline's
    # election: O(distinct hashes) driver memory, blobs filtered
    # map-only — existing hashes are read blob-free (columnar prune).
    existing = (
        pads.dataset(os.path.join(out_dir, "images"), format="parquet")
        .to_table(columns=["tile_hash"])
        .column("tile_hash")
        .to_numpy()
    )
    import pyarrow.compute as pc_

    rolled_all = ray.data.read_parquet(
        tiles_root,
        columns=["zoom", "x", "y", "tile_hash", "tile_data"],
        filter=(pc_.field("zoom") < base_min),
    )
    import pandas as pd

    narrow = rolled_all.select_columns(["zoom", "x", "y", "tile_hash"]).to_pandas()
    if len(narrow):
        addr = (
            narrow["zoom"].to_numpy().astype(np.uint64) << np.uint64(58)
            | narrow["x"].to_numpy().astype(np.uint64) << np.uint64(29)
            | narrow["y"].to_numpy().astype(np.uint64)
        ).astype(np.int64)
        firsts = (
            pd.DataFrame({"tile_hash": narrow["tile_hash"], "addr": addr})
            .groupby("tile_hash", sort=False)["addr"]
            .min()
        )
        new_hashes = firsts[~firsts.index.isin(existing)]
        winner_addrs = ray.put(pa.array(np.sort(new_hashes.to_numpy())))

        def keep_new_winners(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            z = batch.column("zoom").to_numpy().astype(np.uint64)
            x = batch.column("x").to_numpy().astype(np.uint64)
            y = batch.column("y").to_numpy().astype(np.uint64)
            a = ((z << np.uint64(58)) | (x << np.uint64(29)) | y).astype(np.int64)
            mask = pc.is_in(pa.array(a), value_set=ray.get(winner_addrs))
            return batch.filter(mask).select(["tile_hash", "tile_data"])

        if len(new_hashes):
            rolled_all.map_batches(
                keep_new_winners, batch_format="pyarrow", batch_size=16384
            ).write_parquet(os.path.join(out_dir, "images"), min_rows_per_file=16384)

    md = dict(manifest.get_meta("metadata", {}))
    md["minzoom"] = str(min_zoom)
    manifest.set_meta(metadata=md, minzoom=min_zoom)
    return manifest
