"""The tile render stage: a stateful actor-pool map_batches callable.

Mirrors the reference's worker threads (worker_u8/worker_u32,
/root/reference/src/render.rs:158-293): each worker holds a warmed
raster handle + encoders, loops tiles, skips empty tiles, encodes PNG,
and content-hashes the blob. Here that state lives in ``__init__``
(once per actor) and ``__call__`` processes a pyarrow batch of tile
ids, returning (zoom, x, y, tms_y, tile_hash, tile_data) rows — empty
tiles produce NO row (the G1 all-nodata filter folded in, ref
src/dataset.rs:180-182 / src/render.rs:194).

The TMS y-flip (y' = 2^z - 1 - y, ref src/mbtiles.rs:111-113) and the
content hash (ref src/mbtiles.rs:104-107) are computed here so the
downstream sink is a pure column write.

Usage::

    ds.map_batches(TileRenderer, fn_constructor_kwargs=dict(
        raster_spec=raster.spec(), tilesize=512, colormap="1:#ff0000"),
        batch_format="pyarrow", batch_size=64,
        concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import content_hash64
from ..png.color import parse_colormap
from ..png.encoders import (
    ColormapEncoder,
    GrayscaleEncoder,
    RGBEncoder,
    build_dynamic_palette,
)
from ..raster.factory import raster_from_spec

TILE_SCHEMA = pa.schema(
    [
        ("zoom", pa.uint8()),
        ("x", pa.uint32()),
        ("y", pa.uint32()),
        ("tms_y", pa.uint32()),
        ("tile_hash", pa.int64()),
        ("tile_data", pa.binary()),
    ]
)


class TileRenderer:
    def __init__(
        self,
        raster_spec: dict,
        tilesize: int = 512,
        colormap: str | None = None,
        part_lut: list[str] | None = None,
    ):
        # part_lut: optional zoom→partition-label LUT; when given, each
        # output batch carries a "part" column computed IN the actor so
        # the render job is a single fused operator — a separate
        # add-the-label task stage would push every PNG blob through a
        # second object-store round trip (~1 GB per million tiles).
        self.part_lut = None if part_lut is None else np.asarray(part_lut, dtype=object)
        self.raster = raster_from_spec(raster_spec)
        self.tilesize = int(tilesize)
        self.dtype = self.raster.dtype
        nodata = self.raster.nodata

        if colormap is not None and self.dtype != "uint8":
            # ref src/render.rs:39-41
            raise ValueError("colormap can only be provided for uint8 data")
        if self.dtype not in ("uint8", "uint32"):
            # ref src/render.rs:43-48
            raise ValueError(f"data type is not supported: {self.dtype}")

        ts = self.tilesize
        if self.dtype == "uint8":
            if colormap is not None:
                self.encoder = ColormapEncoder(ts, ts, parse_colormap(colormap, nodata))
                self._encode = self.encoder.encode
            else:
                self.encoder = GrayscaleEncoder(ts, ts, nodata)
                self._encode = self.encoder.encode
        else:
            self.rgb_encoder = RGBEncoder(ts, ts, nodata)

            def encode_u32(buf: np.ndarray) -> bytes:
                cm = build_dynamic_palette(buf, nodata)
                if cm is not None:
                    return ColormapEncoder(ts, ts, cm).encode(buf)
                return self.rgb_encoder.encode_u32(buf)

            self._encode = encode_u32

    def __call__(self, batch: pa.Table) -> pa.Table:
        zooms = batch.column("zoom").to_numpy()
        xs = batch.column("x").to_numpy()
        ys = batch.column("y").to_numpy()

        out_z, out_x, out_y, out_tms, out_hash, out_png = [], [], [], [], [], []
        for z, x, y in zip(zooms.tolist(), xs.tolist(), ys.tolist()):
            buf = self.raster.read_tile(z, x, y, self.tilesize)
            if buf is None:
                continue  # empty tile → no row
            png = self._encode(buf)
            out_z.append(z)
            out_x.append(x)
            out_y.append(y)
            out_tms.append((1 << z) - 1 - y)
            out_hash.append(content_hash64(png))
            out_png.append(png)

        out = pa.table(
            {
                "zoom": pa.array(out_z, type=pa.uint8()),
                "x": pa.array(out_x, type=pa.uint32()),
                "y": pa.array(out_y, type=pa.uint32()),
                "tms_y": pa.array(out_tms, type=pa.uint32()),
                "tile_hash": pa.array(out_hash, type=pa.int64()),
                "tile_data": pa.array(out_png, type=pa.binary()),
            },
            schema=TILE_SCHEMA,
        )
        if self.part_lut is not None:
            z = np.asarray(out_z, dtype=np.int64)
            out = out.append_column("part", pa.array(self.part_lut[z], pa.string()))
        return out


def tms_flip_batch(batch: pa.Table) -> pa.Table:
    """Vectorized XYZ→TMS y flip for pipelines that carry raw (zoom, y).

    y' = 2^zoom - 1 - y (ref src/mbtiles.rs:111-113).
    """
    zoom = batch.column("zoom").to_numpy().astype(np.int64)
    y = batch.column("y").to_numpy().astype(np.int64)
    tms = ((np.int64(1) << zoom) - 1 - y).astype(np.uint32)
    if "tms_y" in batch.column_names:
        batch = batch.drop_columns(["tms_y"])
    return batch.append_column("tms_y", pa.array(tms, type=pa.uint32()))
