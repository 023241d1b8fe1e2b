"""Lazy tile-ID Dataset source.

The reference enumerates tiles zoom-by-zoom through a bounded channel
(/root/reference/src/render.rs:99-122, src/tileid.rs:138-145). Here the
enumeration is a ``ray.data.range(total)`` index space mapped to
``(zoom, x, y)`` in vectorized batches — no tile id ever materializes
on the driver, so a z0–z24 pyramid (10^12+ tiles) stays lazy and
streams with backpressure; blocks of ids are generated on workers.

Enumeration order matches the reference: zoom ascending, then x-major
within each zoom's TileRange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geo import Bounds
from ..geo.tileid import TileRange, tile_range


def _ranges_for(zooms: list[int], bounds: Bounds) -> list[TileRange]:
    return [tile_range(z, bounds) for z in zooms]


def pyramid_tile_count(minzoom: int, maxzoom: int, bounds: Bounds) -> int:
    """Total tiles covering ``bounds`` for zooms [minzoom, maxzoom]."""
    return sum(tr.count() for tr in _ranges_for(list(range(minzoom, maxzoom + 1)), bounds))


def tile_ids_dataset(
    zooms: list[int],
    bounds: Bounds,
    *,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Dataset of (zoom: uint8, x: uint32, y: uint32) covering ``bounds``.

    ``zooms`` is an explicit list so callers can group zoom levels into
    checkpointable jobs. The index→id map is pure arithmetic
    (TileRange.tile_at), vectorized per batch.
    """
    ranges = _ranges_for(zooms, bounds)
    counts = [tr.count() for tr in ranges]
    offsets = np.cumsum([0] + counts)  # offsets[i] = first global index of zoom i
    total = int(offsets[-1])

    # plain python lists close over the map fn (tiny; shipped once per task)
    zoom_arr = np.array(zooms, dtype=np.uint8)
    xmins = np.array([tr.xmin for tr in ranges], dtype=np.int64)
    ymins = np.array([tr.ymin for tr in ranges], dtype=np.int64)
    nys = np.array([tr.ymax - tr.ymin + 1 for tr in ranges], dtype=np.int64)

    def ids_from_index(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy()
        zi = np.searchsorted(offsets, idx, side="right") - 1
        local = idx - offsets[zi]
        x = xmins[zi] + local // nys[zi]
        y = ymins[zi] + local % nys[zi]
        return pa.table(
            {
                "zoom": pa.array(zoom_arr[zi], type=pa.uint8()),
                "x": pa.array(x.astype(np.uint32), type=pa.uint32()),
                "y": pa.array(y.astype(np.uint32), type=pa.uint32()),
            }
        )

    ds = ray.data.range(total, override_num_blocks=override_num_blocks)
    return ds.map_batches(ids_from_index, batch_format="pyarrow")
