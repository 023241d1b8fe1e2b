"""Tileset merge: set union with left-preference on tile-address conflicts.

Ray-Data translation of the reference's ``merge`` entry point
(/root/reference/src/mbtiles.rs:147-221): ``INSERT OR IGNORE`` of the
right tileset's map/images rows into a copy of the left is exactly

    union(left tagged rank 0, right tagged rank 1)
      → groupby(tile_key) keep the min-rank row        # left wins (O2)
      → rebuild images/ by content-hash keep-first     # hash-keyed union
      → metadata: minzoom = min, maxzoom = max         # (mbtiles.rs:181-207)

The shuffle key is the packed ``tile_key = zoom<<58 | x<<29 | y``
(single uint64 — same bijection as the cell index), so the keep-first
groupby moves each blob once.
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

from ..state.manifest import Manifest
from .render import _dedup_hash_in_batch, _keep_first_group


def _add_tile_key_and_rank(rank: int):
    def fn(batch: pa.Table) -> pa.Table:
        zoom = batch.column("zoom").to_numpy().astype(np.uint64)
        x = batch.column("x").to_numpy().astype(np.uint64)
        y = batch.column("y").to_numpy().astype(np.uint64)
        key = (zoom << np.uint64(58)) | (x << np.uint64(29)) | y
        batch = batch.append_column("tile_key", pa.array(key, type=pa.uint64()))
        return batch.append_column(
            "source_rank", pa.array(np.full(len(batch), rank, dtype=np.int8))
        )

    return fn


def _keep_min_rank(group: pa.Table) -> pa.Table:
    ranks = group.column("source_rank").to_numpy()
    return group.slice(int(np.argmin(ranks)), 1)


def merge_tilesets(left_dir: str, right_dir: str, out_dir: str) -> Manifest:
    """Merge two tileset dirs into ``out_dir`` (left wins on conflicts)."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    t0 = time.perf_counter()
    left = ray.data.read_parquet(os.path.join(left_dir, "tiles")).map_batches(
        _add_tile_key_and_rank(0), batch_format="pyarrow"
    )
    right = ray.data.read_parquet(os.path.join(right_dir, "tiles")).map_batches(
        _add_tile_key_and_rank(1), batch_format="pyarrow"
    )
    merged = (
        left.union(right)
        .groupby("tile_key")
        .map_groups(_keep_min_rank, batch_format="pyarrow")
        .drop_columns(["tile_key", "source_rank"])
        .sort(["zoom", "x", "y"])
    )
    tiles_dir = os.path.join(out_dir, "tiles", "merged")
    merged.write_parquet(tiles_dir)

    images = (
        ray.data.read_parquet(
            os.path.join(out_dir, "tiles"), columns=["tile_hash", "tile_data"]
        )
        .map_batches(_dedup_hash_in_batch, batch_format="pyarrow")
        .groupby("tile_hash")
        .map_groups(_keep_first_group, batch_format="pyarrow")
    )
    images.write_parquet(os.path.join(out_dir, "images"))
    wall = time.perf_counter() - t0

    lm = Manifest(os.path.join(left_dir, "manifest.json"))
    rm = Manifest(os.path.join(right_dir, "manifest.json"))
    lmd = dict(lm.get_meta("metadata", {}))
    rmd = dict(rm.get_meta("metadata", {}))
    merged_md = dict(lmd)  # left metadata wins, like the copied left db
    merged_md["minzoom"] = str(
        min(int(lmd.get("minzoom", 0)), int(rmd.get("minzoom", 0)))
    )
    merged_md["maxzoom"] = str(
        max(int(lmd.get("maxzoom", 0)), int(rmd.get("maxzoom", 0)))
    )

    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    manifest.set_meta(
        metadata=merged_md,
        tilesize=lm.get_meta("tilesize"),
        minzoom=int(merged_md["minzoom"]),
        maxzoom=int(merged_md["maxzoom"]),
    )
    rows = pads.dataset(tiles_dir, format="parquet").count_rows()
    manifest.record_complete(
        "tiles/merged", rows=rows, wall_s=wall, left=left_dir, right=right_dir
    )
    return manifest
