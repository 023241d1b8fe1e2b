"""Tileset merge: set union with left-preference on tile-address conflicts.

Ray-Data translation of the reference's ``merge`` entry point
(/root/reference/src/mbtiles.rs:147-221): ``INSERT OR IGNORE`` of the
right tileset's map/images rows into a copy of the left is exactly

    left rows all win                                  # the copied db
    right rows survive iff their (zoom,x,y) ∉ left     # map INSERT OR IGNORE
    images = left ∪ (right where hash ∉ left hashes)   # images INSERT OR IGNORE
    metadata: minzoom = min, maxzoom = max             # (mbtiles.rs:181-207)

Execution is fully MAP-ONLY — no shuffle touches a PNG blob:

- the left side streams straight through to ``tiles/part=left``;
- the left tile-address set (packed ``tile_key = zoom<<58|x<<29|y``,
  8 B/tile, read blob-free from the columnar layout) is broadcast once
  (``ray.put``) and the right side filters against it map-side into
  ``tiles/part=right`` — a broadcast anti-join, the same narrow-key
  winner-election shape as render's images dedup;
- images/ likewise: left images stream through, right images filter
  against the broadcast left-hash set.  Like the reference, images
  unreferenced after conflict resolution are retained
  (mbtiles.rs:174-177 inserts ALL right images, IGNORE on hash).

Broadcast assumption: left addresses / hashes are 8 B each — ~1 GB per
10⁸ tiles; beyond that swap the broadcast for a hash-shuffle anti-join
on tile_key (relational.shuffle_hash_join, join_type="left_anti").

No global sort: each side's partitions stay internally sorted (render
writes them sorted-by-construction); address ordering/uniqueness of
the merged set is enforced by the sink's unique index on export
(export_mbtiles, ref src/mbtiles.rs:155-158), not by physical row
order — same as the reference's sqlite file.
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

TILE_COLUMNS = ["zoom", "x", "y", "tms_y", "tile_hash", "tile_data"]


def _packed_keys(batch: pa.Table) -> np.ndarray:
    zoom = batch.column("zoom").to_numpy().astype(np.uint64)
    x = batch.column("x").to_numpy().astype(np.uint64)
    y = batch.column("y").to_numpy().astype(np.uint64)
    return ((zoom << np.uint64(58)) | (x << np.uint64(29)) | y).astype(np.int64)


def _collect_int_column(ds: ray.data.Dataset, fn) -> np.ndarray:
    """Stream narrow batches to the driver and concatenate fn(batch) → int64."""
    chunks = [fn(b) for b in ds.iter_batches(batch_format="pyarrow")]
    chunks = [c for c in chunks if len(c)]
    if not chunks:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(chunks))


def merge_tilesets(left_dir: str, right_dir: str, out_dir: str) -> Manifest:
    """Merge two tileset dirs into ``out_dir`` (left wins on conflicts)."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    t0 = time.perf_counter()

    # Narrow blob-free reads: left tile addresses + left image hashes.
    left_keys = _collect_int_column(
        ray.data.read_parquet(os.path.join(left_dir, "tiles"), columns=["zoom", "x", "y"]),
        _packed_keys,
    )
    left_hashes = _collect_int_column(
        ray.data.read_parquet(os.path.join(left_dir, "images"), columns=["tile_hash"]),
        lambda b: b.column("tile_hash").to_numpy(),
    )
    keys_ref = ray.put(pa.array(left_keys))
    hashes_ref = ray.put(pa.array(left_hashes))

    # tiles/part=left: pass-through stream (no shuffle, no blob movement)
    left_tiles = ray.data.read_parquet(
        os.path.join(left_dir, "tiles"), columns=TILE_COLUMNS
    )
    left_tiles.write_parquet(os.path.join(out_dir, "tiles", "part=left"))

    # tiles/part=right: broadcast anti-join on the packed address, map-only
    def right_survivors(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pa.array(_packed_keys(batch))
        mask = pc.invert(pc.is_in(keys, value_set=ray.get(keys_ref)))
        return batch.filter(mask)

    right_tiles = ray.data.read_parquet(
        os.path.join(right_dir, "tiles"), columns=TILE_COLUMNS
    ).map_batches(right_survivors, batch_format="pyarrow")
    right_tiles.write_parquet(os.path.join(out_dir, "tiles", "part=right"))

    # images/: left pass-through ∪ right where hash unseen on the left
    ray.data.read_parquet(os.path.join(left_dir, "images")).write_parquet(
        os.path.join(out_dir, "images", "part=left")
    )

    def right_new_images(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(
            pc.is_in(batch.column("tile_hash"), value_set=ray.get(hashes_ref))
        )
        return batch.filter(mask)

    ray.data.read_parquet(os.path.join(right_dir, "images")).map_batches(
        right_new_images, batch_format="pyarrow"
    ).write_parquet(os.path.join(out_dir, "images", "part=right"))
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
    rows = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet").count_rows()
    manifest.record_complete(
        "tiles/merged", rows=rows, wall_s=wall, left=left_dir, right=right_dir
    )
    manifest.record_complete(
        "images",
        rows=pads.dataset(os.path.join(out_dir, "images"), format="parquet").count_rows(),
        wall_s=wall,
    )
    return manifest


def diff_tilesets(old_dir: str, new_dir: str) -> ray.data.Dataset:
    """Tile-level diff of two tilesets: one row per (zoom, x, y) whose
    content differs, with ``change`` in {'added', 'removed', 'changed'}.

    The re-publish primitive the reference's ``merge`` subcommand
    implies but never exposes (/root/reference/src/mbtiles.rs:147-221
    resolves conflicts silently): given yesterday's pyramid and
    today's re-render, which tile addresses must be pushed to the CDN
    and which purged.

    Scale contract: PNG blobs never leave storage — both sides read
    the blob-free `map` projection (zoom, x, y, tile_hash; ~20 B/row)
    and the diff is relational.snapshot_diff, whose only exchange is
    one narrow groupby on the tile address.  Content equality is
    tile_hash equality — the same seahash-equivalent content key the
    sink dedups on (ref src/mbtiles.rs:104-107), so 'changed' means
    the encoded PNG bytes differ, not merely the source pixels.
    """
    from .relational import snapshot_diff
    from .render import tileset_map_dataset

    cols = ["zoom", "x", "y", "tile_hash"]
    old = tileset_map_dataset(old_dir).select_columns(cols)
    new = tileset_map_dataset(new_dir).select_columns(cols)
    return snapshot_diff(old, new, ["zoom", "x", "y"], ["tile_hash"])


def merge_many_tilesets(input_dirs: list[str], out_dir: str) -> Manifest:
    """N-way priority merge: ``input_dirs[0]`` wins every (zoom, x, y)
    conflict, then [1], and so on — the tile-patch-stacking workflow
    (base layer + regional updates + hotfix layer) as one job instead
    of N−1 pairwise merges with N−2 intermediate tilesets on disk.

    Same MAP-ONLY contract as ``merge_tilesets``: no PNG blob ever
    shuffles.  For each input i, the already-claimed address set
    (union of packed tile keys of inputs 0..i−1, 8 B/tile) and the
    already-stored image-hash set are broadcast via ``ray.put``; input
    i's streams filter against them into ``part=i``.  The cumulative
    sets grow to the union of all inputs — the same broadcast bound as
    the two-way merge (swap for a hash-shuffle anti-join on tile_key
    past ~10⁸ tiles).

    Metadata: input 0 wins (like the copied left db), zoom range =
    union over all inputs (ref src/mbtiles.rs:181-207 generalized).
    """
    if len(input_dirs) < 1:
        raise ValueError("merge_many_tilesets needs at least one input")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    t0 = time.perf_counter()
    claimed_keys = np.array([], dtype=np.int64)
    stored_hashes = np.array([], dtype=np.int64)

    for i, src in enumerate(input_dirs):
        keys_ref = ray.put(pa.array(claimed_keys))
        hashes_ref = ray.put(pa.array(stored_hashes))

        def tile_survivors(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keys = pa.array(_packed_keys(batch))
            mask = pc.invert(pc.is_in(keys, value_set=ray.get(keys_ref)))
            return batch.filter(mask)

        def new_images(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(
                pc.is_in(batch.column("tile_hash"), value_set=ray.get(hashes_ref))
            )
            return batch.filter(mask)

        tiles = ray.data.read_parquet(os.path.join(src, "tiles"), columns=TILE_COLUMNS)
        if i > 0:
            tiles = tiles.map_batches(tile_survivors, batch_format="pyarrow")
        tiles.write_parquet(os.path.join(out_dir, "tiles", f"part={i}"))

        images = ray.data.read_parquet(os.path.join(src, "images"))
        if i > 0:
            images = images.map_batches(new_images, batch_format="pyarrow")
        images.write_parquet(os.path.join(out_dir, "images", f"part={i}"))

        if i + 1 < len(input_dirs):  # last input needs no set update
            src_keys = _collect_int_column(
                ray.data.read_parquet(
                    os.path.join(src, "tiles"), columns=["zoom", "x", "y"]
                ),
                _packed_keys,
            )
            src_hashes = _collect_int_column(
                ray.data.read_parquet(
                    os.path.join(src, "images"), columns=["tile_hash"]
                ),
                lambda b: b.column("tile_hash").to_numpy(),
            )
            claimed_keys = np.union1d(claimed_keys, src_keys)
            stored_hashes = np.union1d(stored_hashes, src_hashes)

    wall = time.perf_counter() - t0
    manifests = [Manifest(os.path.join(d, "manifest.json")) for d in input_dirs]
    mds = [dict(m.get_meta("metadata", {})) for m in manifests]
    merged_md = dict(mds[0])
    merged_md["minzoom"] = str(min(int(m.get("minzoom", 0)) for m in mds))
    merged_md["maxzoom"] = str(max(int(m.get("maxzoom", 0)) for m in mds))

    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    manifest.set_meta(
        metadata=merged_md,
        tilesize=manifests[0].get_meta("tilesize"),
        minzoom=int(merged_md["minzoom"]),
        maxzoom=int(merged_md["maxzoom"]),
    )
    rows = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet").count_rows()
    manifest.record_complete(
        "tiles/merged", rows=rows, wall_s=wall, inputs=list(input_dirs)
    )
    manifest.record_complete(
        "images",
        rows=pads.dataset(os.path.join(out_dir, "images"), format="parquet").count_rows(),
        wall_s=wall,
    )
    return manifest
