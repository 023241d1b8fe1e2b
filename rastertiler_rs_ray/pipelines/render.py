"""The flagship pipeline: raster → XYZ tile pyramid → tileset.

Ray-Data translation of the reference's ``render`` entry point
(/root/reference/src/render.rs:20-156):

    pending zoom-groups (planned groups anti-joined against manifest):
      ONE job: tile_ids_dataset (lazy index→id map)
        → map_batches(TileRenderer, shared actor pool)  # read+encode+hash, G1 filter
        → write_parquet(tiles/, partition_cols=["part"])  # hive: part=g<min>-<max>
    then:
      images/ = dedup by tile_hash (keep first)    # MBTiles images norm (G5)

No global sort: enumeration is zoom-asc/x-major and order is preserved
end-to-end, so partitions come out sorted by (zoom, x, y) — the
unique-index ordering (S8) for free (asserted in tests).  Zoom groups
remain the checkpoint boundary: each is recorded in the manifest with
lineage + throughput, and a killed run resumes by re-rendering only
pending groups (the reference instead deletes its output db,
src/mbtiles.rs:53-55).

Output layout (MBTiles-equivalent, resumable, one dir per partition):

    out_dir/manifest.json
    out_dir/tiles/part=g{a}-{b}/*.parquet  (zoom,x,y,tms_y,tile_hash,tile_data)
    out_dir/images/*.parquet       (tile_hash,tile_data) deduped

The `map` table of MBTiles is the blob-free projection of tiles/
(parquet is columnar — reading (zoom,x,tms_y,tile_hash) never touches
the blobs); the `tiles` SQL view (map ⋈ images, src/mbtiles.rs:27-29)
is therefore the identity here. ``export_mbtiles`` materializes a real
sqlite MBTiles file for local consumers.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as papq
import ray
import ray.data

from ..geo import Bounds
from ..geo.mercator import mercator_to_geo
from ..geo.tileid import tile_range
from ..sources.tiles import tile_ids_dataset
from ..stages.tile_render import TileRenderer
from ..state.manifest import Manifest

MAP_COLUMNS = ["zoom", "x", "y", "tms_y", "tile_hash"]


def build_metadata(
    name: str,
    geo_bounds: Bounds,
    minzoom: int,
    maxzoom: int,
    description: str | None = None,
    attribution: str | None = None,
) -> dict[str, str]:
    """Tileset metadata k/v, formatting per ref src/render.rs:50-89."""
    md: dict[str, str] = {"name": name}
    if description is not None:
        md["description"] = description
    if attribution is not None:
        md["attribution"] = attribution
    md["minzoom"] = str(minzoom)
    md["maxzoom"] = str(maxzoom)
    md["bounds"] = (
        f"{geo_bounds.xmin:.5f},{geo_bounds.ymin:.5f},"
        f"{geo_bounds.xmax:.5f},{geo_bounds.ymax:.5f}"
    )
    md["center"] = (
        f"{(geo_bounds.xmax + geo_bounds.xmin) / 2:.5f},"
        f"{(geo_bounds.ymax + geo_bounds.ymin) / 2:.5f},{minzoom}"
    )
    md["type"] = "overlay"
    md["format"] = "png"
    md["version"] = "1.0.0"
    return md


def plan_zoom_groups(
    minzoom: int, maxzoom: int, bounds: Bounds, target_tiles_per_group: int = 4096
) -> list[list[int]]:
    """Chunk zooms into groups of ≥ target tiles (cheap zooms batched
    together so low-zoom groups don't underutilize the pool)."""
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_count = 0
    for z in range(minzoom, maxzoom + 1):
        cur.append(z)
        cur_count += tile_range(z, bounds).count()
        if cur_count >= target_tiles_per_group:
            groups.append(cur)
            cur, cur_count = [], 0
    if cur:
        groups.append(cur)
    return groups


def render_pyramid(
    raster,  # any raster/kernel.TileReadMixin source (synthetic, GeoTIFF, warp)
    out_dir: str,
    minzoom: int,
    maxzoom: int,
    *,
    tilesize: int = 512,
    colormap: str | None = None,
    name: str | None = None,
    description: str | None = None,
    attribution: str | None = None,
    batch_size: int | None = None,
    concurrency=None,
    resume: bool = True,
    target_tiles_per_group: int = 4096,
    plan_bounds: Bounds | None = None,
) -> Manifest:
    """Render the z∈[minzoom, maxzoom] pyramid of ``raster`` into ``out_dir``.

    Returns the manifest (with per-group lineage and throughput).
    ``concurrency`` sizes the TileRenderer actor pool; defaults to the
    cluster CPU count (Ray must already be initialized by the caller).

    ``plan_bounds`` restricts tile ENUMERATION to a mercator bbox (the
    incremental/dirty-region path: only the covering tiles render; the
    read kernel still sees the full raster, so edge tiles are not
    nodata-padded).  Default: the raster's own bounds (full pyramid).
    """
    if colormap is not None and raster.dtype != "uint8":
        raise ValueError("colormap can only be provided for uint8 data")
    if raster.dtype not in ("uint8", "uint32"):
        raise ValueError(f"data type is not supported: {raster.dtype}")

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)

    if not resume and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    mercator_bounds = plan_bounds if plan_bounds is not None else raster.bounds()
    gxmin, gymin = mercator_to_geo(mercator_bounds.xmin, mercator_bounds.ymin)
    gxmax, gymax = mercator_to_geo(mercator_bounds.xmax, mercator_bounds.ymax)
    geo_bounds = Bounds(float(gxmin), float(gymin), float(gxmax), float(gymax))

    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    metadata = build_metadata(
        name or os.path.basename(out_dir.rstrip("/")),
        geo_bounds,
        minzoom,
        maxzoom,
        description,
        attribution,
    )
    manifest.set_meta(
        metadata=metadata,
        tilesize=tilesize,
        raster_spec=raster.spec(),
        minzoom=minzoom,
        maxzoom=maxzoom,
    )

    groups = plan_zoom_groups(minzoom, maxzoom, mercator_bounds, target_tiles_per_group)

    # Resume = anti-join planned groups against the manifest; all pending
    # groups render in ONE job sharing one actor pool (per-group jobs paid
    # a pool spin-up each — ~5× the compute at small scale), written
    # hive-partitioned by group label so per-group lineage/resume
    # granularity is preserved.
    pending = [
        zs
        for zs in groups
        if not (resume and manifest.is_complete(f"tiles/g{zs[0]:02d}-{zs[-1]:02d}"))
    ]

    # The no-global-sort design (S8 ordering sorted-by-construction)
    # requires the executor to preserve block order through the actor
    # pool and the sink — that is NOT the default contract
    # (ExecutionOptions.preserve_order=False allows reordering under
    # load).  Pin it for the render job and restore after.
    data_ctx = ray.data.DataContext.get_current()
    prev_preserve_order = data_ctx.execution_options.preserve_order
    data_ctx.execution_options.preserve_order = True
    try:
        return _render_pyramid_jobs(
            raster=raster,
            out_dir=out_dir,
            manifest=manifest,
            mercator_bounds=mercator_bounds,
            groups=groups,
            pending=pending,
            tilesize=tilesize,
            colormap=colormap,
            batch_size=batch_size,
            concurrency=concurrency,
        )
    finally:
        data_ctx.execution_options.preserve_order = prev_preserve_order


def _render_pyramid_jobs(
    *,
    raster,
    out_dir: str,
    manifest: Manifest,
    mercator_bounds: Bounds,
    groups: list[list[int]],
    pending: list[list[int]],
    tilesize: int,
    colormap: str | None,
    batch_size: int | None,
    concurrency,
) -> Manifest:
    if pending:
        label_of_zoom: dict[int, str] = {}
        for zs in pending:
            label = f"g{zs[0]:02d}-{zs[-1]:02d}"
            for z in zs:
                label_of_zoom[z] = label
            # idempotent overwrite of a half-written partition
            part_dir = os.path.join(out_dir, "tiles", f"part={label}")
            if os.path.exists(part_dir):
                shutil.rmtree(part_dir)

        t0 = time.perf_counter()
        all_zooms = [z for zs in pending for z in zs]
        total_tiles = sum(tile_range(z, mercator_bounds).count() for z in all_zooms)
        # block count: enough blocks that the actor pool has no straggler
        # tail (≥8 per actor), capped so metadata stays driver-sized
        if isinstance(concurrency, tuple):
            max_actors = concurrency[1]
        else:
            max_actors = int(concurrency)
        # One actor task per block (batch_size=None → whole-block batches):
        # driver dispatch stays O(blocks), not O(tiles/32).  Blocks: ≥24
        # per actor — per-tile cost varies ~2x (nodata/constant blocks vs
        # noise), so at 8 blocks/actor the final wave's straggler skew
        # idled ~2% of a 32-CPU z15 run (task wall mean 10.8 s, max
        # 14.8 s measured); finer blocks shrink the tail while per-task
        # overhead stays ~ms.  Capped by per-block pixel-buffer memory
        # (tilesize² × dtype × tiles/block ≤ ~256 MiB).
        bytes_per_px = 4 if raster.dtype == "uint32" else 1
        max_tiles_per_block = max(256 * 1024 * 1024 // (tilesize * tilesize * bytes_per_px), 8)
        num_blocks = int(
            min(
                max(max_actors * 24, 32, total_tiles // max_tiles_per_block + 1),
                max(total_tiles, 1),
                100_000,
            )
        )
        ds = tile_ids_dataset(all_zooms, mercator_bounds, override_num_blocks=num_blocks)
        # zoom → group label as a numpy take (max zoom 24 → tiny LUT),
        # applied INSIDE the render actor so the whole tiles job is one
        # fused operator — a separate label stage would push every PNG
        # blob through a second object-store round trip.
        lut = [label_of_zoom.get(z, "") for z in range(max(label_of_zoom) + 1)]
        ds = ds.map_batches(
            TileRenderer,
            fn_constructor_kwargs=dict(
                raster_spec=raster.spec(), tilesize=tilesize, colormap=colormap,
                part_lut=lut,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

        # No global sort: tile ids are enumerated zoom-asc / x-major
        # (tile_ids_dataset), map_batches preserves block + intra-block
        # order, and nothing shuffles before the sink — the partition
        # files come out already sorted by (zoom, x, y), giving the
        # unique-index ordering (ref src/mbtiles.rs:38-42) for free.
        # Sortedness is asserted in tests.
        # Materialize once (object store; spills if huge) so the images
        # dedup below consumes the SAME blocks instead of re-reading the
        # blob parquet from disk (2× blob I/O saved).
        rendered = ds.materialize()
        t_render = time.perf_counter() - t0
        # min_rows_per_file bundles the (deliberately fine-grained) render
        # blocks into few write tasks/files — per-block write overhead at
        # 768 blocks cost ~2 s of a 32-CPU z15 run
        rendered.write_parquet(
            os.path.join(out_dir, "tiles"),
            partition_cols=["part"],
            min_rows_per_file=32768,
        )
        wall = time.perf_counter() - t0
        if os.environ.get("RASTERTILER_RENDER_STATS"):
            print(
                f"RENDER_PHASES materialize={t_render:.2f}s write={wall - t_render:.2f}s"
            )
            print(rendered.stats())

        for zs in pending:
            label = f"g{zs[0]:02d}-{zs[-1]:02d}"
            part_dir = os.path.join(out_dir, "tiles", f"part={label}")
            rows = pads.dataset(part_dir, format="parquet").count_rows()
            input_tiles = sum(tile_range(z, mercator_bounds).count() for z in zs)
            manifest.record_complete(
                f"tiles/{label}",
                rows=rows,
                wall_s=wall,  # shared job wall (single shared actor pool)
                zooms=zs,
                input_tiles=input_tiles,
                tiles_per_s=round(input_tiles / wall, 1) if wall > 0 else None,
            )

    # images/: content-hash dedup keep-first (MBTiles `images` table).
    # Blobs NEVER shuffle: only the narrow (tile_hash, packed tile addr)
    # pairs go through the groupby (16 B/row, column-pruned parquet read);
    # the elected winner addresses are broadcast once and the blob table
    # is filtered map-only.  The naive groupby over (hash, blob) moved
    # every PNG through a sort shuffle and ANTI-scaled with CPUs.
    # Broadcast assumption: distinct-hash count fits driver/worker memory
    # (int64 per winner — ~1 GB per 10^8 distinct tiles); beyond that,
    # swap the broadcast for a hash-shuffle semi-join on tile_hash.
    if not manifest.is_complete("images"):
        images_dir = os.path.join(out_dir, "images")
        if os.path.exists(images_dir):
            shutil.rmtree(images_dir)
        t0 = time.perf_counter()

        def tiles_source(columns):
            # Reuse the in-session materialized blocks (zero-copy prune)
            # ONLY when this session rendered every planned group.  On a
            # resumed run with completed partitions already on disk,
            # `rendered` holds just the re-rendered pending groups —
            # building images/ from it would drop any tile_hash that
            # appears only in a completed partition (its map rows would
            # then dangle in the exported `tiles` view).  Disk has the
            # union of both, freshly flushed by write_parquet above.
            if pending and len(pending) == len(groups):
                return rendered.select_columns(columns)
            return ray.data.read_parquet(os.path.join(out_dir, "tiles"), columns=columns)

        write_deduped_images(tiles_source, images_dir)
        wall = time.perf_counter() - t0
        if os.environ.get("RASTERTILER_RENDER_STATS"):
            print(f"RENDER_PHASES images={wall:.2f}s")
        rows = pads.dataset(images_dir, format="parquet").count_rows()
        manifest.record_complete("images", rows=rows, wall_s=wall)

    return manifest


def write_deduped_images(tiles_source, images_dir: str) -> None:
    """Content-dedup election + ``images/`` write shared by the render
    sink and the heatmap tileset (MBTiles ``images`` norm, G5).

    ``tiles_source(columns)`` must return a Dataset of tile rows pruned
    to ``columns``.  Two passes: (1) a blob-free narrow pass reduces
    each block to one (tile_hash, min packed-addr) partial, and the
    global min-per-hash folds DRIVER-side; (2) the winner-address set
    broadcasts once (``ray.put``) and blobs filter map-only — tile
    blobs never shuffle.

    Scale contract: driver memory is O(distinct content hashes), NOT
    O(tiles) — the documented budget (a 200 k-hash election reduces in
    ~20 ms; a distributed groupby's all-to-all fixed cost ~5 s dwarfs
    it at every realistic tileset size).  Beyond driver memory, swap
    BOTH the driver reduce and the broadcast for a hash-shuffle
    semi-join on tile_hash (relational.shuffle_hash_join of the narrow
    winner set against the blob rows).
    """

    def pack_addr(batch: pa.Table) -> pa.Table:
        z = batch.column("zoom").to_numpy().astype(np.uint64)
        x = batch.column("x").to_numpy().astype(np.uint64)
        y = batch.column("y").to_numpy().astype(np.uint64)
        addr = (z << np.uint64(58)) | (x << np.uint64(29)) | y
        t = pa.table(
            {
                "tile_hash": batch.column("tile_hash"),
                "addr": pa.array(addr.astype(np.int64)),
            }
        )
        # per-block partial: one (hash, min addr) per distinct hash
        return t.group_by("tile_hash").aggregate([("addr", "min")]).rename_columns(
            ["tile_hash", "addr"]
        )

    # batch_size coalesces the fine render blocks (Ray bundles input
    # blocks up to batch_size rows) so the narrow pass is a handful
    # of tasks, each emitting one partial row per distinct hash
    narrow = tiles_source(["zoom", "x", "y", "tile_hash"]).map_batches(
        pack_addr, batch_format="pyarrow", batch_size=1 << 20
    )
    parts = [
        b
        for b in narrow.iter_batches(batch_size=1 << 20, batch_format="pandas")
    ]
    if parts:
        allp = pd.concat(parts, ignore_index=True)
        winner_addrs = np.sort(
            allp.groupby("tile_hash", sort=False)["addr"].min().to_numpy()
        )
    else:
        winner_addrs = np.array([], dtype=np.int64)
    addr_ref = ray.put(pa.array(winner_addrs))

    def keep_winners(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        z = batch.column("zoom").to_numpy().astype(np.uint64)
        x = batch.column("x").to_numpy().astype(np.uint64)
        y = batch.column("y").to_numpy().astype(np.uint64)
        addr = ((z << np.uint64(58)) | (x << np.uint64(29)) | y).astype(np.int64)
        mask = pc.is_in(pa.array(addr), value_set=ray.get(addr_ref))
        return batch.filter(mask).select(["tile_hash", "tile_data"])

    images = tiles_source(["zoom", "x", "y", "tile_hash", "tile_data"]).map_batches(
        keep_winners, batch_format="pyarrow", batch_size=16384
    )
    images.write_parquet(images_dir, min_rows_per_file=16384)


def tileset_map_dataset(out_dir: str) -> ray.data.Dataset:
    """The MBTiles `map` table: blob-free projection of the tileset."""
    return ray.data.read_parquet(os.path.join(out_dir, "tiles"), columns=MAP_COLUMNS)


def tileset_counts(out_dir: str) -> dict:
    """Per-zoom row counts + distinct-hash (images) cardinality."""
    ds = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet")
    t = ds.to_table(columns=["zoom", "tile_hash"])
    zooms = t.column("zoom").to_numpy()
    uniq, counts = np.unique(zooms, return_counts=True)
    return {
        "per_zoom": {int(z): int(c) for z, c in zip(uniq, counts)},
        "total": len(zooms),
        "images": len(np.unique(t.column("tile_hash").to_numpy())),
    }


def export_mbtiles(out_dir: str, mbtiles_path: str) -> None:
    """Materialize a real MBTiles sqlite file from a tileset dir.

    Schema/DDL parity with ref src/mbtiles.rs:13-42 (metadata, map,
    images, `tiles` view, unique index on (zoom_level, tile_column,
    tile_row)); journal left in default (DELETE) mode like the
    reference's final flush (src/mbtiles.rs:125-144). Streaming insert
    — never materializes the tileset in memory.
    """
    import sqlite3

    if os.path.exists(mbtiles_path):
        os.remove(mbtiles_path)
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    conn = sqlite3.connect(mbtiles_path)
    conn.executescript(
        """
        CREATE TABLE metadata (name text NOT NULL PRIMARY KEY, value text);
        CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER,
                          tile_row INTEGER, tile_id INTEGER);
        CREATE TABLE images (tile_id INTEGER NOT NULL PRIMARY KEY, tile_data blob);
        CREATE VIEW tiles AS
            SELECT zoom_level, tile_column, tile_row, tile_data
            FROM map JOIN images ON images.tile_id = map.tile_id;
        """
    )
    conn.executemany(
        "INSERT INTO metadata (name, value) VALUES (?, ?)",
        list(manifest.get_meta("metadata", {}).items()),
    )
    scanner = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet").scanner(
        columns=["zoom", "x", "tms_y", "tile_hash"], batch_size=65536
    )
    for rb in scanner.to_batches():
        conn.executemany(
            "INSERT INTO map (zoom_level, tile_column, tile_row, tile_id) VALUES (?,?,?,?)",
            zip(
                rb.column("zoom").to_pylist(),
                rb.column("x").to_pylist(),
                rb.column("tms_y").to_pylist(),
                rb.column("tile_hash").to_pylist(),
            ),
        )
    img_scanner = pads.dataset(os.path.join(out_dir, "images"), format="parquet").scanner(
        batch_size=1024
    )
    for rb in img_scanner.to_batches():
        conn.executemany(
            "INSERT OR IGNORE INTO images (tile_id, tile_data) VALUES (?, ?)",
            zip(rb.column("tile_hash").to_pylist(), rb.column("tile_data").to_pylist()),
        )
    conn.execute(
        "CREATE UNIQUE INDEX map_index ON map (zoom_level, tile_column, tile_row)"
    )
    conn.commit()
    conn.close()


def read_mbtiles(mbtiles_path: str, *, batch_rows: int = 65536) -> ray.data.Dataset:
    """Read a real MBTiles sqlite file into a Dataset of
    ``(zoom, x, y, tms_y, tile_hash, tile_data)`` — the bridge for
    tilesets produced by the reference CLI (ref src/mbtiles.rs:13-30).

    ``y`` is flipped back from TMS to XYZ (``y = 2^z - 1 - tile_row``,
    inverse of ref src/mbtiles.rs:111-113); ``tile_id`` is carried as
    ``tile_hash`` (content-addressed within the file, whatever hash
    produced it).  A sqlite file is inherently single-node, so the
    driver streams row batches into object-store blocks; for repeated
    distributed work convert once with ``import_mbtiles``.
    """
    import sqlite3

    conn = sqlite3.connect(mbtiles_path)
    cur = conn.execute(
        "SELECT m.zoom_level, m.tile_column, m.tile_row, m.tile_id, i.tile_data "
        "FROM map m JOIN images i ON i.tile_id = m.tile_id "
        "ORDER BY m.zoom_level, m.tile_column, m.tile_row DESC"
    )
    refs = []
    while True:
        rows = cur.fetchmany(batch_rows)
        if not rows:
            break
        z = np.array([r[0] for r in rows], dtype=np.uint8)
        x = np.array([r[1] for r in rows], dtype=np.uint32)
        tms = np.array([r[2] for r in rows], dtype=np.uint32)
        y = ((np.uint32(1) << z.astype(np.uint32)) - np.uint32(1)) - tms
        t = pa.table(
            {
                "zoom": pa.array(z),
                "x": pa.array(x),
                "y": pa.array(y),
                "tms_y": pa.array(tms),
                "tile_hash": pa.array([r[3] for r in rows], pa.int64()),
                "tile_data": pa.array([r[4] for r in rows], pa.binary()),
            }
        )
        refs.append(ray.put(t))
    conn.close()
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "zoom": pa.array([], pa.uint8()),
                    "x": pa.array([], pa.uint32()),
                    "y": pa.array([], pa.uint32()),
                    "tms_y": pa.array([], pa.uint32()),
                    "tile_hash": pa.array([], pa.int64()),
                    "tile_data": pa.array([], pa.binary()),
                }
            )
        )
    return ray.data.from_arrow_refs(refs)


def import_mbtiles(mbtiles_path: str, out_dir: str) -> Manifest:
    """Convert an MBTiles file into the engine's partitioned tileset
    layout (tiles/ + images/ parquet + manifest), after which merge,
    export and analytics all run distributed.  The conversion is the
    one single-node pass; everything downstream scales."""
    import sqlite3

    # sqlite3.connect would silently create an empty db for a bad path
    if not os.path.isfile(mbtiles_path):
        raise ValueError(f"mbtiles file not found: {mbtiles_path}")

    os.makedirs(os.path.join(out_dir, "tiles", "part=imported"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))

    conn = sqlite3.connect(mbtiles_path)
    meta = dict(conn.execute("SELECT name, value FROM metadata").fetchall())
    conn.close()
    manifest.set_meta(metadata=meta)

    t0 = time.time()
    ds = read_mbtiles(mbtiles_path)
    n = 0
    for i, batch in enumerate(ds.iter_batches(batch_size=65536, batch_format="pyarrow")):
        pq_path = os.path.join(out_dir, "tiles", "part=imported", f"part-{i:05d}.parquet")
        papq.write_table(batch, pq_path)
        n += len(batch)
    manifest.record_complete(
        "tiles/imported", rows=n, wall_s=time.time() - t0, input_tiles=n,
        source=os.path.basename(mbtiles_path),
    )

    t0 = time.time()
    conn = sqlite3.connect(mbtiles_path)
    cur = conn.execute("SELECT tile_id, tile_data FROM images ORDER BY tile_id")
    rows = cur.fetchall()
    conn.close()
    img = pa.table(
        {
            "tile_hash": pa.array([r[0] for r in rows], pa.int64()),
            "tile_data": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    papq.write_table(img, os.path.join(out_dir, "images", "imported-0.parquet"))
    manifest.record_complete("images", rows=len(img), wall_s=time.time() - t0)
    return manifest


def tileset_missing_tiles(
    out_dir: str,
    zooms: list[int],
    bounds,
) -> ray.data.Dataset:
    """Completeness audit of a tileset against its expected cover: one
    row per discrepancy, ``status`` ∈ {'missing', 'orphan'} — missing =
    an address the ``zooms``×``bounds`` cover requires but the tileset
    lacks (a crashed partition, a skipped range), orphan = a stored
    tile outside the expected cover (stale zoom, wrong bounds).  The
    resume/ops primitive a 100-TB render needs before re-publishing.

    Fully distributed set difference in BOTH directions at once: the
    expected cover streams from pure index arithmetic
    (sources.tiles.tile_ids_dataset — never a driver-side list), the
    tileset side reads the blob-free `map` projection, and a marker
    union + ONE narrow groupby on (zoom, x, y) classifies — the same
    single-exchange shape as snapshot_diff, no broadcast of either
    side.
    """
    from ..sources.tiles import tile_ids_dataset

    expected = tile_ids_dataset(list(zooms), bounds)
    present = tileset_map_dataset(out_dir).select_columns(["zoom", "x", "y"])

    def tag(exp: int):
        def f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table(
                {
                    "zoom": pa.compute.cast(batch.column("zoom"), pa.int64()),
                    "x": pa.compute.cast(batch.column("x"), pa.int64()),
                    "y": pa.compute.cast(batch.column("y"), pa.int64()),
                    "exp": pa.array(np.full(n, exp, dtype=np.int64)),
                    "pres": pa.array(np.full(n, 1 - exp, dtype=np.int64)),
                }
            )

        return f

    tagged = expected.map_batches(tag(1), batch_format="pyarrow").union(
        present.map_batches(tag(0), batch_format="pyarrow")
    )
    agg = tagged.groupby(["zoom", "x", "y"]).sum(["exp", "pres"])

    def classify(batch: pa.Table) -> pa.Table:
        e = np.asarray(batch.column("sum(exp)"))
        p = np.asarray(batch.column("sum(pres)"))
        status = np.where(p == 0, "missing", np.where(e == 0, "orphan", ""))
        keep = status != ""
        m = pa.array(keep)
        return pa.table(
            {
                "zoom": batch.column("zoom").filter(m),
                "x": batch.column("x").filter(m),
                "y": batch.column("y").filter(m),
                "status": pa.array(status[keep].astype(object), pa.string()),
            }
        )

    return agg.map_batches(classify, batch_format="pyarrow")
