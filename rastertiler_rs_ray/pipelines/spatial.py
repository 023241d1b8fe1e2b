"""Spatial pipelines: tile assignment, raster↔vector join, point-in-polygon, kNN.

The graft capabilities from SURVEY.md §2.11 / §2.4 (J2–J4), built on the
reference's tile keying math (point_to_tile reuses the TileRange floor
assignment, /root/reference/src/tileid.rs:100-131):

- ``encode_cells``       docs → geo position + cell_id (actor pool)
- ``assign_tiles``       docs → one row per (doc, zoom) tile key, vectorized
- ``tile_assignment_counts``  partial-aggregated histogram (the salting planner)
- ``raster_vector_join`` Raptor-style co-partition join: docs shuffled on
                         (salted) tile key, per-group sampler reads the
                         tile window ONCE and samples every doc in the
                         group (M17 nearest-neighbour semantics)
- ``point_in_polygon``   broadcast small polygon side (ray.put once),
                         vectorized even-odd ray casting per batch — no shuffle
- ``knn_join``           broadcast small query side; per-batch partial
                         top-k (numpy) + driver heap-merge — no shuffle

Skew handling: ``assign_tiles(salt_threshold=...)`` consults the
planning histogram and salts hot tile keys into sub-groups
(key = tile_key * S + hash(doc) % S) before the groupby — dense zooms
over clustered docs are exactly the skew case called out in the north
rule. Sampling is per-doc, so salted sub-groups are semantically free.

All per-row span data passes through untouched (span-sequence
invariant).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..geo.cell import cell_from_mercator
from ..geo.mercator import geo_to_mercator
from ..geo.mercator import CE
from ..geo.tileid import point_to_tile, tile_mercator_bounds, tile_range
from ..raster.synthetic import SyntheticRaster
from ..stages.cell_encode import CellEncoder

DOC_COLS = ["doc_id", "lon", "lat", "mx", "my", "has_geo", "cell_id"]


def encode_cells(
    docs: ray.data.Dataset, level: int = 12, *, concurrency=(1, 4), batch_size: int = 4096
) -> ray.data.Dataset:
    """Attach lon/lat/mercator/cell_id columns (stateful actor pool)."""
    return docs.map_batches(
        CellEncoder,
        fn_constructor_kwargs=dict(level=level),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def assign_tiles(
    encoded: ray.data.Dataset,
    zooms: list[int],
    *,
    salt_map: dict[int, int] | None = None,
) -> ray.data.Dataset:
    """One output row per (geo-doc, zoom): (doc_id, zoom, x, y, tile_key[, salted_key]).

    ``salt_map`` (tile_key → S sub-groups) comes from
    ``tile_assignment_counts``; hot keys are split into S salted
    sub-keys = tile_key * 64 + hash(doc) % S.
    """
    # Broadcast the salt map as parallel sorted arrays so the hot-key
    # lookup stays vectorized (searchsorted), never a per-row dict.get.
    if salt_map:
        hot_keys = np.array(sorted(salt_map), dtype=np.uint64)
        hot_s = np.array([salt_map[int(k)] for k in hot_keys], dtype=np.uint64)
        salt_ref = ray.put((hot_keys, hot_s))
    else:
        salt_ref = ray.put(None)

    def explode(batch: pa.Table) -> pa.Table:
        salts = ray.get(salt_ref)
        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy()[mask]
        my = batch.column("my").to_numpy()[mask]
        doc_ids = batch.column("doc_id").to_pandas()[mask]
        # salt from stable doc identity (not batch position) so group
        # membership is deterministic across any partitioning
        doc_hash = pd.util.hash_array(doc_ids.to_numpy()).astype(np.uint64)
        outs = []
        for z in zooms:
            x, y = point_to_tile(z, mx, my)
            key = (
                (np.uint64(z) << np.uint64(58))
                | (x.astype(np.uint64) << np.uint64(29))
                | y.astype(np.uint64)
            )
            salted = key * np.uint64(64)
            if salts is not None:
                hot_keys, hot_s = salts
                idx = np.clip(
                    np.searchsorted(hot_keys, key), 0, len(hot_keys) - 1
                )
                s_arr = np.where(hot_keys[idx] == key, hot_s[idx], np.uint64(1))
                salted = salted + doc_hash % s_arr
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(doc_ids.to_numpy(), pa.string()),
                        "zoom": pa.array(np.full(len(mx), z, np.uint8)),
                        "x": pa.array(x, pa.uint32()),
                        "y": pa.array(y, pa.uint32()),
                        "tile_key": pa.array(key, pa.uint64()),
                        "salted_key": pa.array(salted, pa.uint64()),
                        "mx": pa.array(mx, pa.float64()),
                        "my": pa.array(my, pa.float64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return encoded.map_batches(explode, batch_format="pyarrow")


def tile_assignment_counts(assigned: ray.data.Dataset) -> ray.data.Dataset:
    """(zoom, x, y) → doc count, pre-aggregated map-side before the shuffle.

    This is the planning histogram (G3/G6 analog) used both as a
    queries() result and as the salting planner input.
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column("tile_key").to_numpy()
        uniq, counts = np.unique(keys, return_counts=True)
        zoom = (uniq >> np.uint64(58)).astype(np.uint8)
        x = ((uniq >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.uint32)
        y = (uniq & np.uint64((1 << 29) - 1)).astype(np.uint32)
        return pa.table(
            {
                "zoom": pa.array(zoom),
                "x": pa.array(x),
                "y": pa.array(y),
                "tile_key": pa.array(uniq, pa.uint64()),
                "n_docs": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        assigned.map_batches(partial, batch_format="pyarrow")
        .groupby(["zoom", "x", "y"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def plan_salt_map(
    counts: pd.DataFrame, target_group_size: int = 10_000
) -> dict[int, int]:
    """tile_key → number of salted sub-groups for hot keys."""
    out = {}
    for _, row in counts.iterrows():
        s = int(-(-int(row["n_docs"]) // target_group_size))
        if s > 1:
            key = (int(row["zoom"]) << 58) | (int(row["x"]) << 29) | int(row["y"])
            out[key] = min(s, 63)
    return out


def _make_raster_sampler(raster: SyntheticRaster, tilesize: int):
    """Per-group sampler closure: reads the group's tile window once,
    samples every doc in the group from the buffer (J2 warmed-window
    semantics; the raster handle is a tiny functional spec, serialized
    with the closure — map_groups does not take callable classes)."""

    def sample(group: pd.DataFrame) -> pd.DataFrame:
        z = int(group["zoom"].iloc[0])
        x = int(group["x"].iloc[0])
        y = int(group["y"].iloc[0])
        buf = raster.read_tile(z, x, y, tilesize)
        out = group[["doc_id", "zoom", "x", "y"]].copy()
        if buf is None:
            out["raster_value"] = pd.array([None] * len(group), dtype="Int64")
            return out
        xmin, ymin, xmax, ymax = (
            float(v[0])
            for v in tile_mercator_bounds(np.array([z]), np.array([x]), np.array([y]))
        )
        res = (xmax - xmin) / tilesize
        col = np.clip(
            np.floor((group["mx"].to_numpy() - xmin) / res).astype(np.int64),
            0,
            tilesize - 1,
        )
        row = np.clip(
            np.floor((ymax - group["my"].to_numpy()) / res).astype(np.int64),
            0,
            tilesize - 1,
        )
        vals = buf[row, col].astype(np.int64)
        out["raster_value"] = pd.array(vals, dtype="Int64")
        out.loc[vals == raster.nodata, "raster_value"] = None
        return out

    return sample


def raster_vector_join(
    encoded: ray.data.Dataset,
    raster: SyntheticRaster,
    zoom: int,
    *,
    tilesize: int = 256,
    salt_map: dict[int, int] | None = None,
) -> ray.data.Dataset:
    """Sample the raster value under each geo-doc at ``zoom``.

    Docs are shuffled on the (salted) tile key so each group's window
    is read once — the Raptor-style raster↔vector equi-join on the
    spatial key (J2). Returns (doc_id, zoom, x, y, raster_value) with
    null raster_value for docs over empty raster (nodata) or outside
    the raster extent.
    """
    assigned = assign_tiles(encoded, [zoom], salt_map=salt_map)
    return assigned.groupby("salted_key").map_groups(
        _make_raster_sampler(raster, tilesize), batch_format="pandas"
    )


class _PolygonTester:
    """Broadcast-polygon containment: vectorized even-odd ray casting.

    The polygon side is tiny (broadcast once via ray.put); each batch of
    docs is tested against every polygon's bbox first, then the exact
    crossing test — no shuffle (J3 with a broadcast build side).
    """

    def __init__(self, polygons_ref):
        polys = ray.get(polygons_ref) if not isinstance(polygons_ref, list) else polygons_ref
        self.polys = []
        for p in polys:
            lon = np.asarray(p["lon"], dtype=np.float64)
            lat = np.asarray(p["lat"], dtype=np.float64)
            self.polys.append(
                {
                    "poly_id": p["poly_id"],
                    "x1": lon,
                    "y1": lat,
                    "x2": np.roll(lon, -1),
                    "y2": np.roll(lat, -1),
                    "bbox": (lon.min(), lat.min(), lon.max(), lat.max()),
                }
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy()[mask]
        lat = batch.column("lat").to_numpy()[mask]
        doc_ids = batch.column("doc_id").to_pandas()[mask].to_numpy()

        out_docs: list = []
        out_polys: list = []
        for p in self.polys:
            bxmin, bymin, bxmax, bymax = p["bbox"]
            cand = (lon >= bxmin) & (lon <= bxmax) & (lat >= bymin) & (lat <= bymax)
            if not cand.any():
                continue
            px, py = lon[cand], lat[cand]
            inside = np.zeros(len(px), dtype=bool)
            x1, y1, x2, y2 = p["x1"], p["y1"], p["x2"], p["y2"]
            for e in range(len(x1)):
                crosses = (y1[e] > py) != (y2[e] > py)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (x2[e] - x1[e]) * (py - y1[e]) / (y2[e] - y1[e]) + x1[e]
                inside ^= crosses & (px < xint)
            hits = doc_ids[cand][inside]
            out_docs.extend(hits.tolist())
            out_polys.extend([p["poly_id"]] * len(hits))

        return pa.table(
            {
                "doc_id": pa.array(out_docs, pa.string()),
                "poly_id": pa.array(out_polys, pa.int64()),
            }
        )


def point_in_polygon(
    encoded: ray.data.Dataset, polygons: list[dict], *, concurrency=(1, 4)
) -> ray.data.Dataset:
    """(doc_id, poly_id) containment pairs. Polygon side broadcast."""
    ref = ray.put(polygons)
    return encoded.map_batches(
        _PolygonTester,
        fn_constructor_kwargs=dict(polygons_ref=ref),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class _KnnPartial:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.qx = q[:, 0][:, None]  # (Q, 1) mercator x
        self.qy = q[:, 1][:, None]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy()[mask]
        my = batch.column("my").to_numpy()[mask]
        doc_ids = batch.column("doc_id").to_pandas()[mask].to_numpy()
        if len(mx) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.string()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        d2 = (mx[None, :] - self.qx) ** 2 + (my[None, :] - self.qy) ** 2  # (Q, N)
        k = min(self.k, d2.shape[1])
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        qi = np.repeat(np.arange(d2.shape[0]), k)
        di = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(qi, pa.int64()),
                "doc_id": pa.array(doc_ids[di], pa.string()),
                "dist": pa.array(np.sqrt(d2[qi, di]), pa.float64()),
            }
        )


def knn_join(
    encoded: ray.data.Dataset,
    query_points: np.ndarray,
    k: int = 5,
    *,
    concurrency=(1, 4),
) -> pd.DataFrame:
    """Exact kNN of each query point over all geo-docs (Euclidean in
    Mercator meters). Map-side partial top-k per batch (no shuffle),
    then a distributed tree-merge: a second vectorized top-k stage
    coalesces the per-block partials (batch_size ≫ block size merges
    thousands of blocks per task), and the driver only vector-merges
    the few surviving blocks — never a per-row Python loop.  At 100-TB
    block counts (~10⁶ blocks) the driver sees ≤ Q×k rows per merge
    task, not Q×k×blocks.

    Returns a pandas DataFrame (query_id, rank, doc_id, dist) — small:
    Q × k rows.

    ``concurrency`` is retained for API compatibility but unused: the
    partial stage is a plain task function (see comment below), so Ray
    schedules it with ordinary task parallelism.
    """

    def vec_topk(df: pd.DataFrame) -> pd.DataFrame:
        # smallest-dist k per query, ties by doc_id asc (the SQL
        # row_number() ORDER BY dist, doc_id convention)
        if not len(df):  # zero-row blocks pass through
            return df
        df = df.sort_values(["query_id", "dist", "doc_id"], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k)

    # Plain-function stage, NOT an actor pool: the only "state" is a
    # zero-copy ray.get of the tiny broadcast query matrix (rebuilding
    # the (Q,1) views costs ~µs per batch), and a task stage fuses with
    # the upstream read AND the downstream tree-merge into one operator
    # chain — the actor pool's process spin-up (~0.5 s) dominated this
    # query's wall time for zero per-batch benefit.
    qref = ray.put(np.asarray(query_points, dtype=np.float64))

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _KnnPartial(qref, k)(batch)

    partials = encoded.map_batches(partial_topk, batch_format="pyarrow")
    merged = partials.map_batches(
        vec_topk, batch_format="pandas", batch_size=1 << 20
    )
    final = merged.to_pandas()  # ≤ Q×k rows per surviving merge block
    final = vec_topk(final).reset_index(drop=True)
    final["rank"] = final.groupby("query_id", sort=False).cumcount()
    final = final.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return final[["query_id", "rank", "doc_id", "dist"]]


def _tile_cover_refs(
    raster: SyntheticRaster, zoom: int, tilesize: int
):
    """Distributed pre-pass: read every tile window covering the raster
    at ``zoom`` exactly ONCE and leave the blocks IN the object store.

    Returns (materialized_ds, block_refs, xmin, ymin, nx, ny) — the
    driver never touches pixel data; samplers assemble their local
    (zero-copy read, one concat) view from the shared block refs.
    """
    from ..sources.tiles import tile_ids_dataset

    tr = tile_range(zoom, raster.bounds())
    nx, ny = tr.xmax - tr.xmin + 1, tr.ymax - tr.ymin + 1
    spec = raster.spec()
    ts = int(tilesize)

    def read(batch: pa.Table) -> pa.Table:
        r = SyntheticRaster.from_spec(spec)
        xs = batch.column("x").to_numpy()
        ys = batch.column("y").to_numpy()
        zs = batch.column("zoom").to_numpy()
        out_x, out_y, out_px = [], [], []
        for z, x, y in zip(zs.tolist(), xs.tolist(), ys.tolist()):
            buf = r.read_tile(z, x, y, ts)
            if buf is None:
                continue
            out_x.append(x)
            out_y.append(y)
            out_px.append(np.ascontiguousarray(buf).reshape(-1))
        dt = np.uint32 if spec.get("dtype") == "uint32" else np.uint8
        px = np.stack(out_px) if out_px else np.zeros((0, ts * ts), dt)
        return pa.table(
            {
                "x": pa.array(out_x, pa.uint32()),
                "y": pa.array(out_y, pa.uint32()),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(px.reshape(-1)), ts * ts
                ),
            }
        )

    mat = (
        tile_ids_dataset([zoom], raster.bounds(), override_num_blocks=32)
        .map_batches(read, batch_format="pyarrow")
        .materialize()
    )
    refs = mat.to_arrow_refs()
    return mat, refs, tr.xmin, tr.ymin, nx, ny


class _BroadcastRasterSampler:
    """Actor-pool sampler over shared tile-cover blocks.

    ``__init__`` keeps ZERO-COPY per-block views over the shared
    object-store buffers — no per-actor copy of the cover (a
    concatenated private copy multiplied the cover's footprint by the
    actor count and made the join memory-bandwidth-bound); the tile
    index maps (x, y) → (block, row).  Per-batch work is a vectorized
    gather, looped only over the ≤ num_blocks blocks a batch touches.
    """

    def __init__(self, refs, meta, zoom: int, tilesize: int, nodata: int, dtype: str):
        xmin, ymin, nx, ny = meta
        ts = int(tilesize)
        tables = ray.get(list(refs))
        self.blocks: list[np.ndarray] = []
        self.block_of = np.full((nx, ny), -1, dtype=np.int32)
        self.row_of = np.zeros((nx, ny), dtype=np.int32)
        for t in tables:
            nb = len(t)
            if not nb:
                continue
            xs = t.column("x").to_numpy().astype(np.int64)
            ys = t.column("y").to_numpy().astype(np.int64)
            # zero-copy: arrow fixed-size-list values buffer viewed 3-D
            view = np.asarray(
                t.column("pixels").combine_chunks().flatten()
            ).reshape(nb, ts, ts)
            b = len(self.blocks)
            self.blocks.append(view)
            self.block_of[xs - xmin, ys - ymin] = b
            self.row_of[xs - xmin, ys - ymin] = np.arange(nb, dtype=np.int32)
        self._keepalive = tables  # pin the shared buffers
        self.xmin, self.ymin, self.nx, self.ny = xmin, ymin, nx, ny
        self.zoom = int(zoom)
        self.tilesize = ts
        self.nodata = int(nodata)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy()[mask]
        my = batch.column("my").to_numpy()[mask]
        doc_ids = batch.column("doc_id").filter(pa.array(mask))
        z, ts = self.zoom, self.tilesize
        x, y = point_to_tile(z, mx, my)
        n = len(mx)

        # tile-local pixel coordinates (same floor math as the per-group
        # sampler / M17 window read)
        tile_m = CE / float(1 << z)
        xmin_m = x.astype(np.float64) * tile_m - CE / 2.0
        ymax_m = CE / 2.0 - y.astype(np.float64) * tile_m
        res = tile_m / ts
        col = np.clip(np.floor((mx - xmin_m) / res).astype(np.int64), 0, ts - 1)
        row = np.clip(np.floor((ymax_m - my) / res).astype(np.int64), 0, ts - 1)

        gx = x.astype(np.int64) - self.xmin
        gy = y.astype(np.int64) - self.ymin
        in_cover = (gx >= 0) & (gx < self.nx) & (gy >= 0) & (gy < self.ny)
        bi = np.full(n, -1, dtype=np.int64)
        ri = np.zeros(n, dtype=np.int64)
        bi[in_cover] = self.block_of[gx[in_cover], gy[in_cover]]
        ri[in_cover] = self.row_of[gx[in_cover], gy[in_cover]]
        # gather in the cover's NATIVE dtype (1 byte/doc for a u8 cover
        # instead of 8) with validity kept as a separate mask; the int64
        # promote happens once at the output boundary, not per block
        native = self.blocks[0].dtype if self.blocks else np.dtype(np.uint8)
        vals = np.zeros(n, dtype=native)
        hit = bi >= 0
        for b in np.unique(bi[hit]):
            m = bi == b
            vals[m] = self.blocks[b][ri[m], row[m], col[m]]
        invalid = ~hit | (vals == self.nodata)
        return pa.table(
            {
                "doc_id": doc_ids,
                "zoom": pa.array(np.full(n, z, dtype=np.uint8)),
                "x": pa.array(x.astype(np.uint32)),
                "y": pa.array(y.astype(np.uint32)),
                "raster_value": pa.array(
                    vals.astype(np.int64), pa.int64(), mask=invalid
                ),
            }
        )


def raster_vector_join_broadcast(
    encoded: ray.data.Dataset,
    raster: SyntheticRaster,
    zoom: int,
    *,
    tilesize: int = 256,
    concurrency=None,
    batch_size: int = 262144,
) -> ray.data.Dataset:
    """Shuffle-free raster↔vector join: every tile window covering the
    raster is read exactly ONCE (small distributed pre-pass), packed and
    ``ray.put`` ONCE; actors share the buffers zero-copy and sample each
    doc with a single vectorized gather.

    Same output as ``raster_vector_join`` (oracle-tested equal).  Pick
    this when the zoom-level tile cover of the raster fits worker memory
    (cover × tilesize² bytes — e.g. 3k tiles × 64 KiB = 200 MB); pick
    the shuffle variant for planet-scale covers at high zoom or when doc
    payloads must land next to per-tile consumers.

    ``concurrency`` defaults to a FIXED pool of ~1/4 of cluster CPUs:
    sampling is much cheaper than upstream doc generation/decoding, and
    a full-size pinned pool starves the upstream stage of slots (and
    the autoscaling pool lags).
    """
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, ncpu // 4)
    mat, refs, xmin, ymin, nx, ny = _tile_cover_refs(raster, zoom, tilesize)
    # prune to the columns the sampler reads (wide doc payloads like
    # spans never enter this stage).  NOTE: Ray may fuse this Project
    # into the actor operator — to guarantee the bytes never leave the
    # source, also pass columns=[...] at the read
    out = encoded.select_columns(["doc_id", "mx", "my", "has_geo"]).map_batches(
        _BroadcastRasterSampler,
        fn_constructor_kwargs=dict(
            refs=refs,
            meta=(xmin, ymin, nx, ny),
            zoom=zoom,
            tilesize=tilesize,
            nodata=raster.nodata,
            dtype=raster.dtype,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    out._tile_cover_keepalive = mat  # pin block refs until consumed
    return out


def _polygon_cell_cover(polygons: list[dict], level: int) -> dict[int, list[dict]]:
    """Assign each polygon to every cell its bbox covers at ``level``
    (M4 floor math over the bbox) — the J3 bbox prefilter index."""
    from ..geo.bounds import Bounds as _Bounds
    from ..geo.cell import cell_id as _cell_id

    cover: dict[int, list[dict]] = {}
    for p in polygons:
        lon = np.asarray(p["lon"], dtype=np.float64)
        lat = np.asarray(p["lat"], dtype=np.float64)
        mx, my = geo_to_mercator(lon, lat)
        tr = tile_range(level, _Bounds(float(mx.min()), float(my.min()),
                                       float(mx.max()), float(my.max())))
        for x in range(tr.xmin, tr.xmax + 1):
            for y in range(tr.ymin, tr.ymax + 1):
                cid = int(_cell_id(np.uint64(level), np.uint64(x), np.uint64(y)))
                cover.setdefault(cid, []).append(p)
    return cover


def point_in_polygon_cells(
    encoded: ray.data.Dataset,
    polygons: list[dict],
    *,
    level: int = 8,
) -> ray.data.Dataset:
    """Cell-co-partitioned point-in-polygon (J3's shuffle plan).

    Polygons are indexed by covering cell (bbox prefilter); docs compute
    their cell key, are FILTERED to covered cells (at scale: parquet
    partition pruning on cell_id), shuffled on cell, and each group runs
    the exact even-odd crossing test against only that cell's polygons.
    Output identical to the broadcast ``point_in_polygon`` (tested).

    Prefer the broadcast plan when the polygon set fits worker memory;
    this plan wins when polygons are too many to broadcast or doc
    payloads must stay co-partitioned with cells downstream.
    """
    cover = _polygon_cell_cover(polygons, level)
    cover_ref = ray.put(cover)
    covered_cells = pa.array(np.array(sorted(cover), dtype=np.int64))
    cells_ref = ray.put(covered_cells)

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(mask))
        cid = cell_from_mercator(
            level, t.column("mx").to_numpy(), t.column("my").to_numpy()
        ).astype(np.int64)
        t = t.append_column("__pcell", pa.array(cid))
        return t.filter(pc.is_in(t.column("__pcell"), value_set=ray.get(cells_ref)))

    def test_group(group: pd.DataFrame) -> pd.DataFrame:
        cid = int(group["__pcell"].iloc[0])
        polys = ray.get(cover_ref).get(cid, [])
        lon = group["lon"].to_numpy()
        lat = group["lat"].to_numpy()
        ids = group["doc_id"].to_numpy()
        out_d: list = []
        out_p: list = []
        for p in polys:
            px1 = np.asarray(p["lon"], dtype=np.float64)
            py1 = np.asarray(p["lat"], dtype=np.float64)
            px2, py2 = np.roll(px1, -1), np.roll(py1, -1)
            inside = np.zeros(len(lon), dtype=bool)
            for e in range(len(px1)):
                crosses = (py1[e] > lat) != (py2[e] > lat)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (px2[e] - px1[e]) * (lat - py1[e]) / (py2[e] - py1[e]) + px1[e]
                inside ^= crosses & (lon < xint)
            out_d.extend(ids[inside].tolist())
            out_p.extend([p["poly_id"]] * int(inside.sum()))
        return pd.DataFrame({"doc_id": pd.array(out_d, dtype="string").astype(object),
                             "poly_id": pd.array(out_p, dtype="int64")})

    return (
        encoded.map_batches(keyed, batch_format="pyarrow")
        .groupby("__pcell")
        .map_groups(test_group, batch_format="pandas")
    )


def _bucket_corpus_by_cell(
    encoded: ray.data.Dataset, level: int, scratch_dir: str, parent_level: int
) -> None:
    """One pass over the corpus: narrow (doc_id, mx, my, __cell) rows
    written to Parquet hive-partitioned by the PARENT cell at
    ``parent_level`` — the pruning unit later rounds read by."""

    def keyed(batch: pa.Table) -> pa.Table:
        mask = batch.column("has_geo").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(mask)).select(["doc_id", "mx", "my"])
        mx = t.column("mx").to_numpy()
        my = t.column("my").to_numpy()
        cid = cell_from_mercator(level, mx, my).astype(np.int64)
        x = (cid >> 29) & ((1 << 29) - 1)
        y = cid & ((1 << 29) - 1)
        px = x >> (level - parent_level)
        py = y >> (level - parent_level)
        parent = (px << parent_level) | py
        t = t.append_column("__cell", pa.array(cid))
        return t.append_column("__pcell", pa.array(parent.astype(np.int64)))

    encoded.map_batches(keyed, batch_format="pyarrow").write_parquet(
        scratch_dir, partition_cols=["__pcell"]
    )
    import json
    import os

    with open(os.path.join(scratch_dir, "_knn_bucket_meta.json"), "w") as f:
        json.dump({"level": int(level), "parent_level": int(parent_level)}, f)


def knn_cell_join(
    encoded: ray.data.Dataset,
    query_points: np.ndarray,
    k: int = 5,
    *,
    level: int = 6,
    max_rounds: int = 6,
    parent_level: int = 3,
    scratch_dir: str | None = None,
    stats: dict | None = None,
) -> pd.DataFrame:
    """kNN with cell-ring candidate gather + boundary-safe expansion (J4).

    The corpus is bucketed ONCE into a narrow Parquet layout
    hive-partitioned by the parent cell at ``parent_level`` (one
    corpus pass; at 100 TB this materialization is the spatial index
    and is reused across queries).  A reused ``scratch_dir`` is
    validated against its recorded (level, parent_level) — a mismatch
    raises rather than silently gathering nothing; pointing it at a
    DIFFERENT corpus than ``encoded`` remains the caller's contract.
    Round r then reads ONLY the
    partitions whose parent cell intersects some live query's
    Chebyshev-radius ring — partition pruning, not a corpus rescan.
    A query's answer is final when its k-th distance is smaller than
    the exact distance from the query point to the gathered region's
    boundary — otherwise its radius expands and only unfinished
    queries rescan.  A query still live after ``max_rounds`` keeps its
    best-so-far candidates (never silently empty).  Output matches the
    exact broadcast ``knn_join`` (tested).

    ``stats`` (optional dict) receives per-round telemetry:
    ``rounds`` = list of {partitions_read, partitions_total, rows_read}.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    parent_level = min(parent_level, level)
    q = np.asarray(query_points, dtype=np.float64)
    nq = len(q)
    s = CE / float(1 << level)  # cell size in mercator meters
    qx_cell, qy_cell = point_to_tile(level, q[:, 0], q[:, 1])
    qx_cell = qx_cell.astype(np.int64)
    qy_cell = qy_cell.astype(np.int64)
    nmax = (1 << level) - 1

    own_scratch = scratch_dir is None
    if own_scratch:
        scratch_dir = _tempfile.mkdtemp(prefix="knn_cells_", dir="/tmp")
    try:
        if not _os.path.isdir(scratch_dir) or not any(
            d.startswith("__pcell=") for d in _os.listdir(scratch_dir)
        ):
            _bucket_corpus_by_cell(encoded, level, scratch_dir, parent_level)
        else:
            # a pre-bucketed scratch keyed at a different level would
            # silently match nothing — refuse instead of returning
            # empty neighbors (corpus identity remains the caller's
            # responsibility, documented above)
            import json as _json

            meta_path = _os.path.join(scratch_dir, "_knn_bucket_meta.json")
            if not _os.path.isfile(meta_path):
                raise ValueError(
                    f"scratch_dir {scratch_dir!r} has __pcell= partitions but no "
                    "_knn_bucket_meta.json — not produced by knn_cell_join"
                )
            with open(meta_path) as f:
                meta = _json.load(f)
            if meta != {"level": int(level), "parent_level": int(parent_level)}:
                raise ValueError(
                    f"scratch_dir {scratch_dir!r} was bucketed with {meta}, "
                    f"but this call uses level={level} parent_level={parent_level}"
                )
        all_parts = sorted(
            d for d in _os.listdir(scratch_dir) if d.startswith("__pcell=")
        )

        radius = np.ones(nq, dtype=np.int64)
        done = np.zeros(nq, dtype=bool)
        results: dict[int, list] = {i: [] for i in range(nq)}
        if stats is not None:
            stats["rounds"] = []

        for _round in range(max_rounds):
            live = np.nonzero(~done)[0]
            if not len(live):
                break
            # candidate cell set (and parent partitions) for live queries
            cells: set[int] = set()
            parents: set[int] = set()
            for i in live:
                r = int(radius[i])
                x0, x1 = max(qx_cell[i] - r, 0), min(qx_cell[i] + r, nmax)
                y0, y1 = max(qy_cell[i] - r, 0), min(qy_cell[i] + r, nmax)
                for x in range(x0, x1 + 1):
                    for y in range(y0, y1 + 1):
                        cells.add((int(level) << 58) | (x << 29) | y)
                        parents.add(
                            ((x >> (level - parent_level)) << parent_level)
                            | (y >> (level - parent_level))
                        )
            part_dirs = [
                _os.path.join(scratch_dir, d)
                for d in all_parts
                if int(d.split("=", 1)[1]) in parents
            ]
            part_files = [
                _os.path.join(d, f)
                for d in part_dirs
                for f in sorted(_os.listdir(d))
                if f.endswith(".parquet")
            ]
            if stats is not None:
                import pyarrow.dataset as _pads

                rows_read = (
                    _pads.dataset(part_files, format="parquet").count_rows()
                    if part_files
                    else 0
                )
                stats["rounds"].append(
                    {
                        "partitions_read": len(part_dirs),
                        "partitions_total": len(all_parts),
                        "rows_read": rows_read,
                    }
                )
            cells_ref = ray.put(pa.array(np.array(sorted(cells), dtype=np.int64)))
            live_q = q[live]
            live_ref = ray.put((live_q, live))

            def gather(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                t = batch.filter(
                    pc.is_in(batch.column("__cell"), value_set=ray.get(cells_ref))
                )
                lq, lidx = ray.get(live_ref)
                mx = t.column("mx").to_numpy()
                my = t.column("my").to_numpy()
                ids = t.column("doc_id").to_pandas().to_numpy()
                if not len(mx):
                    return pa.table({"query_id": pa.array([], pa.int64()),
                                     "doc_id": pa.array([], pa.string()),
                                     "dist": pa.array([], pa.float64())})
                d2 = (mx[None, :] - lq[:, 0][:, None]) ** 2 + (my[None, :] - lq[:, 1][:, None]) ** 2
                kk = min(k, d2.shape[1])
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                qi = np.repeat(lidx, kk)
                di = part.ravel()
                rows = np.repeat(np.arange(len(lq)), kk)
                return pa.table({
                    "query_id": pa.array(qi, pa.int64()),
                    "doc_id": pa.array(ids[di], pa.string()),
                    "dist": pa.array(np.sqrt(d2[rows, di]), pa.float64()),
                })

            if part_files:
                round_ds = ray.data.read_parquet(
                    part_files, columns=["doc_id", "mx", "my", "__cell"]
                )
                partials = round_ds.map_batches(gather, batch_format="pyarrow").take_all()
            else:
                partials = []
            best: dict[int, dict] = {int(i): {} for i in live}
            for r_ in partials:
                d = best[int(r_["query_id"])]
                doc = r_["doc_id"]
                if doc not in d or r_["dist"] < d[doc]:
                    d[doc] = r_["dist"]
            for i in live:
                cand = sorted(((d, doc) for doc, d in best[int(i)].items()),
                              key=lambda t: (t[0], t[1]))[:k]
                # best-so-far recorded every round so max_rounds
                # exhaustion still returns candidates, never silence
                results[int(i)] = cand
                r = int(radius[i])
                # exact distance from the query point to the gathered-region
                # boundary; a side clipped at the grid edge has no docs
                # beyond it -> infinite margin on that side
                inf = float("inf")
                m_l = inf if qx_cell[i] - r <= 0 else q[i, 0] - ((qx_cell[i] - r) * s - CE / 2.0)
                m_r = inf if qx_cell[i] + r >= nmax else ((qx_cell[i] + r + 1) * s - CE / 2.0) - q[i, 0]
                m_t = inf if qy_cell[i] - r <= 0 else (CE / 2.0 - (qy_cell[i] - r) * s) - q[i, 1]
                m_b = inf if qy_cell[i] + r >= nmax else q[i, 1] - (CE / 2.0 - (qy_cell[i] + r + 1) * s)
                margin = min(m_l, m_r, m_t, m_b)
                if (len(cand) >= k and cand[k - 1][0] <= margin) or margin == inf:
                    # final: k-th neighbor closer than any unscanned doc
                    # can be, or the whole grid is scanned
                    done[i] = True
                else:
                    radius[i] = r * 2
    finally:
        if own_scratch:
            _shutil.rmtree(scratch_dir, ignore_errors=True)
    rows = []
    for i in sorted(results):
        for rank, (dist, doc) in enumerate(results[i]):
            rows.append((i, rank, doc, dist))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "dist"])


def zorder_sort(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    mx_col: str = "mx",
    my_col: str = "my",
    key_col: str = "zkey",
) -> ray.data.Dataset:
    """Sort a Mercator-position dataset along the Z-order (Morton)
    space-filling curve at ``zoom``: append the bit-interleaved tile-xy
    key, then one ``Dataset.sort`` range shuffle.

    This is the locality pass before a partitioned write: after it,
    consecutive output blocks hold spatially-adjacent points, so a
    hive-partitioned parquet layout keyed on zkey ranges gives readers
    real range pruning (a bbox query touches O(boundary) partitions,
    not all of them) and the tile renderer's per-tile gathers hit few
    blocks.  The sort is Ray Data's sample-partition-merge shuffle —
    the ONE intentionally-global exchange in the layout path; everything
    downstream preserves its order.
    """
    from ..geo.cell import morton_interleave
    from ..geo.tileid import point_to_tile

    def add_key(batch: pa.Table) -> pa.Table:
        x, y = point_to_tile(
            zoom,
            batch.column(mx_col).to_numpy(),
            batch.column(my_col).to_numpy(),
        )
        return batch.append_column(
            key_col, pa.array(morton_interleave(x, y).astype(np.int64))
        )

    return pos.map_batches(add_key, batch_format="pyarrow").sort(key_col)


def hilbert_sort(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    mx_col: str = "mx",
    my_col: str = "my",
    key_col: str = "hkey",
) -> ray.data.Dataset:
    """``zorder_sort``'s S2-style sibling: key by the HILBERT curve
    position of the zoom-level tile (x, y) instead of the Morton
    interleave, then one global range sort.

    Hilbert beats Morton for range pruning because consecutive curve
    positions are always grid-adjacent (no half-plane jumps at
    power-of-two boundaries), so a bbox query's key-range cover has
    fewer, longer runs — the reason S2 orders its cells this way.
    Same scale shape as ``zorder_sort``: map-only key attach + the one
    intentionally-global sample-partition-merge sort.
    """
    from ..geo.hilbert import hilbert_xy2d
    from ..geo.tileid import point_to_tile

    def add_key(batch: pa.Table) -> pa.Table:
        x, y = point_to_tile(
            zoom,
            batch.column(mx_col).to_numpy(),
            batch.column(my_col).to_numpy(),
        )
        return batch.append_column(
            key_col, pa.array(hilbert_xy2d(zoom, x, y).astype(np.int64))
        )

    return pos.map_batches(add_key, batch_format="pyarrow").sort(key_col)


def zonal_stats(
    zones: ray.data.Dataset,
    raster_spec: dict,
    *,
    chunk: int = 512,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Zonal statistics: count / sum / min / max / mean of raster pixel
    values per zone, pixels equal to the raster's nodata excluded — the
    classic raster↔vector aggregation (rasterstats' core op) the
    reference family sits next to.

    ``zones``: (zone_id, col0, row0, col1, row1) half-open rectangles
    in raster pixel space (clamped to the raster here; polygon zones
    compose by masking the rectangle with ``_PolygonTester``'s crossing
    test inside the sampler — the decomposition below is unchanged).

    Scale shape: each zone is exploded into ``chunk``-aligned
    sub-rectangles (vectorized ragged expansion — no per-zone Python),
    so one giant zone becomes many bounded read tasks instead of one
    OOM-sized window; a stateful sampler pool evaluates each window
    vectorized and emits one partial row per (zone, chunk); a final
    O(zones)-row ``grouped_aggregate`` merges partials.  The raster
    handle is constructed once per actor from its spec.
    """
    from ..raster.synthetic import SyntheticRaster
    from .relational import grouped_aggregate

    def explode(b: pa.Table) -> pa.Table:
        zid = b.column("zone_id").to_numpy(zero_copy_only=False).astype(np.int64)
        c0 = b.column("col0").to_numpy(zero_copy_only=False).astype(np.int64)
        r0 = b.column("row0").to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = b.column("col1").to_numpy(zero_copy_only=False).astype(np.int64)
        r1 = b.column("row1").to_numpy(zero_copy_only=False).astype(np.int64)
        c0 = np.clip(c0, 0, raster_spec["width"])
        c1 = np.clip(c1, 0, raster_spec["width"])
        r0 = np.clip(r0, 0, raster_spec["height"])
        r1 = np.clip(r1, 0, raster_spec["height"])
        keep = (c1 > c0) & (r1 > r0)
        zid, c0, c1, r0, r1 = zid[keep], c0[keep], c1[keep], r0[keep], r1[keep]
        bx0, bx1 = c0 // chunk, (c1 - 1) // chunk
        by0, by1 = r0 // chunk, (r1 - 1) // chunk
        nx, ny = bx1 - bx0 + 1, by1 - by0 + 1
        cnt = nx * ny
        total = int(cnt.sum())
        rep = np.repeat(np.arange(len(zid)), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        gx = off % np.repeat(nx, cnt)
        gy = off // np.repeat(nx, cnt)
        bcol = (bx0[rep] + gx) * chunk
        brow = (by0[rep] + gy) * chunk
        return pa.table(
            {
                "zone_id": pa.array(zid[rep]),
                "sc0": pa.array(np.maximum(bcol, c0[rep])),
                "sc1": pa.array(np.minimum(bcol + chunk, c1[rep])),
                "sr0": pa.array(np.maximum(brow, r0[rep])),
                "sr1": pa.array(np.minimum(brow + chunk, r1[rep])),
            }
        )

    class _ZonalSampler:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            zids, ns, ss, mns, mxs = [], [], [], [], []
            rows = zip(
                *(
                    b.column(c).to_numpy(zero_copy_only=False)
                    for c in ("zone_id", "sc0", "sc1", "sr0", "sr1")
                )
            )
            # coarse loop over chunk windows (as any windowed raster
            # read must be); all pixel work inside is vectorized
            for zid, c0, c1, r0, r1 in rows:
                cols = np.arange(c0, c1, dtype=np.int64)[None, :]
                rws = np.arange(r0, r1, dtype=np.int64)[:, None]
                v = self.r.values_at(cols, rws).astype(np.int64)
                valid = v != self.r.nodata
                n = int(valid.sum())
                if n == 0:
                    continue
                vv = v[valid]
                zids.append(zid)
                ns.append(n)
                ss.append(int(vv.sum()))
                mns.append(int(vv.min()))
                mxs.append(int(vv.max()))
            return pa.table(
                {
                    "zone_id": pa.array(zids, pa.int64()),
                    "n": pa.array(ns, pa.int64()),
                    "s": pa.array(ss, pa.int64()),
                    "vmin": pa.array(mns, pa.int64()),
                    "vmax": pa.array(mxs, pa.int64()),
                }
            )

    partials = zones.map_batches(explode, batch_format="pyarrow").map_batches(
        _ZonalSampler,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    agg = grouped_aggregate(
        partials,
        ["zone_id"],
        [
            ("n", "n", "sum"),
            ("sum_val", "s", "sum"),
            ("min_val", "vmin", "min"),
            ("max_val", "vmax", "max"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("sum_val").to_numpy(zero_copy_only=False).astype(np.float64)
        mean_e4 = np.floor(s / n * 1e4 + 0.5).astype(np.int64)
        return b.append_column("mean_e4", pa.array(mean_e4))

    return agg.map_batches(finalize, batch_format="pyarrow")


def _even_odd_mask(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Even-odd (ray-casting) containment of points in one polygon,
    vectorized over points; edge pairing is (i, j=i-1) and the crossing
    expression keeps EXACTLY this float form — the SQL oracle mirrors
    it term-for-term so boundary pixels agree bit-for-bit."""
    inside = np.zeros(px.shape, bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xcross)
        j = i
    return inside


def zonal_stats_polygon(
    polys: ray.data.Dataset,
    raster_spec: dict,
    *,
    chunk: int = 512,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Polygon-masked zonal statistics: like ``zonal_stats`` but each
    zone is a polygon (``zone_id, xs: list<double>, ys: list<double>``
    vertices in raster pixel space) and only pixels whose CENTERS
    (col+0.5, row+0.5) fall inside by the even-odd rule contribute.

    Same scale topology as the rectangle path: bbox → chunk-aligned
    sub-windows (vectorized ragged explode, vertex lists ride along via
    ``take``), stateful sampler pool masks each window, O(zones) merge.
    """
    from ..raster.synthetic import SyntheticRaster
    from .relational import grouped_aggregate

    width, height = raster_spec["width"], raster_spec["height"]

    def explode(b: pa.Table) -> pa.Table:
        xsarr = b.column("xs").combine_chunks()
        ysarr = b.column("ys").combine_chunks()
        xoffs = np.asarray(xsarr.offsets)
        yoffs = np.asarray(ysarr.offsets)
        xflat = np.asarray(xsarr.values, dtype=np.float64)
        yflat = np.asarray(ysarr.values, dtype=np.float64)
        xmin = np.minimum.reduceat(xflat, xoffs[:-1])
        xmax = np.maximum.reduceat(xflat, xoffs[:-1])
        ymin = np.minimum.reduceat(yflat, yoffs[:-1])
        ymax = np.maximum.reduceat(yflat, yoffs[:-1])
        c0 = np.clip(np.floor(xmin).astype(np.int64), 0, width)
        c1 = np.clip(np.ceil(xmax).astype(np.int64), 0, width)
        r0 = np.clip(np.floor(ymin).astype(np.int64), 0, height)
        r1 = np.clip(np.ceil(ymax).astype(np.int64), 0, height)
        keep = (c1 > c0) & (r1 > r0)
        b = b.filter(pa.array(keep))
        c0, c1, r0, r1 = c0[keep], c1[keep], r0[keep], r1[keep]
        bx0, bx1 = c0 // chunk, (c1 - 1) // chunk
        by0, by1 = r0 // chunk, (r1 - 1) // chunk
        nx, ny = bx1 - bx0 + 1, by1 - by0 + 1
        cnt = nx * ny
        total = int(cnt.sum())
        rep = np.repeat(np.arange(len(c0)), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        gx = off % np.repeat(nx, cnt)
        gy = off // np.repeat(nx, cnt)
        bcol = (bx0[rep] + gx) * chunk
        brow = (by0[rep] + gy) * chunk
        sub = b.take(pa.array(rep, pa.int64()))
        sub = sub.append_column("sc0", pa.array(np.maximum(bcol, c0[rep])))
        sub = sub.append_column("sc1", pa.array(np.minimum(bcol + chunk, c1[rep])))
        sub = sub.append_column("sr0", pa.array(np.maximum(brow, r0[rep])))
        sub = sub.append_column("sr1", pa.array(np.minimum(brow + chunk, r1[rep])))
        return sub

    class _PolyZonalSampler:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            zids, ns, ss, mns, mxs = [], [], [], [], []
            zid_col = b.column("zone_id").to_numpy(zero_copy_only=False)
            xs_col = b.column("xs").to_pylist()
            ys_col = b.column("ys").to_pylist()
            rects = [
                b.column(c).to_numpy(zero_copy_only=False)
                for c in ("sc0", "sc1", "sr0", "sr1")
            ]
            for k in range(len(b)):
                c0, c1, r0, r1 = (int(col[k]) for col in rects)
                cols = np.arange(c0, c1, dtype=np.int64)[None, :]
                rws = np.arange(r0, r1, dtype=np.int64)[:, None]
                cx = np.broadcast_to(cols + 0.5, (r1 - r0, c1 - c0))
                cy = np.broadcast_to(rws + 0.5, (r1 - r0, c1 - c0))
                m = _even_odd_mask(
                    cx, cy,
                    np.asarray(xs_col[k], np.float64),
                    np.asarray(ys_col[k], np.float64),
                )
                if not m.any():
                    continue
                v = self.r.values_at(cols, rws).astype(np.int64)
                valid = m & (v != self.r.nodata)
                n = int(valid.sum())
                if n == 0:
                    continue
                vv = v[valid]
                zids.append(zid_col[k])
                ns.append(n)
                ss.append(int(vv.sum()))
                mns.append(int(vv.min()))
                mxs.append(int(vv.max()))
            return pa.table(
                {
                    "zone_id": pa.array(zids, pa.int64()),
                    "n": pa.array(ns, pa.int64()),
                    "s": pa.array(ss, pa.int64()),
                    "vmin": pa.array(mns, pa.int64()),
                    "vmax": pa.array(mxs, pa.int64()),
                }
            )

    partials = polys.map_batches(explode, batch_format="pyarrow").map_batches(
        _PolyZonalSampler,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    agg = grouped_aggregate(
        partials,
        ["zone_id"],
        [
            ("n", "n", "sum"),
            ("sum_val", "s", "sum"),
            ("min_val", "vmin", "min"),
            ("max_val", "vmax", "max"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("sum_val").to_numpy(zero_copy_only=False).astype(np.float64)
        mean_e4 = np.floor(s / n * 1e4 + 0.5).astype(np.int64)
        return b.append_column("mean_e4", pa.array(mean_e4))

    return agg.map_batches(finalize, batch_format="pyarrow")


_BOX_OFF = np.int64(1 << 22)  # shifts grid indices positive before packing


def box_intersect_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    cell: float,
    left_cols: "Sequence[str]",
    right_cols: "Sequence[str]",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """2D box-intersection join (PBSM — Partition Based Spatial Merge):
    pairs of boxes whose closed extents overlap in both axes.

    Each side carries (xmin, ymin, xmax, ymax) plus its payload
    columns; boxes are replicated to every ``cell``-sized grid tile
    they overlap (vectorized ragged explode), the two sides hash-join
    on the tile key (ONE all-to-all), and the overlap predicate runs
    vectorized on the joined rows.  **Exactly-once without a distinct
    shuffle**: a pair is emitted only from the canonical tile — the one
    containing the intersection region's min corner — the standard
    PBSM duplicate-avoidance trick, so replication never needs a
    post-join dedup exchange.

    Skew note: a tile that a large fraction of boxes overlap becomes a
    hot join key — pick ``cell`` near the median box size, and salt the
    explode (split a hot tile's join work by hashing the left id) if a
    tile outgrows a task; same contract as ``interval_band_join``.
    """
    from .relational import shuffle_hash_join

    def make_explode(prefix: str, payload: "Sequence[str]"):
        def explode(b: pa.Table) -> pa.Table:
            x0 = b.column("xmin").to_numpy(zero_copy_only=False).astype(np.float64)
            y0 = b.column("ymin").to_numpy(zero_copy_only=False).astype(np.float64)
            x1 = b.column("xmax").to_numpy(zero_copy_only=False).astype(np.float64)
            y1 = b.column("ymax").to_numpy(zero_copy_only=False).astype(np.float64)
            cx0 = np.floor(x0 / cell).astype(np.int64)
            cx1 = np.floor(x1 / cell).astype(np.int64)
            cy0 = np.floor(y0 / cell).astype(np.int64)
            cy1 = np.floor(y1 / cell).astype(np.int64)
            nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
            cnt = nx * ny
            total = int(cnt.sum())
            rep = np.repeat(np.arange(len(x0)), cnt)
            off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            gx = off % np.repeat(nx, cnt)
            gy = off // np.repeat(nx, cnt)
            ckey = ((cx0[rep] + gx + _BOX_OFF) << np.int64(24)) + (cy0[rep] + gy + _BOX_OFF)
            out = {f"{prefix}{c}": b.column(c).take(pa.array(rep, pa.int64()))
                   for c in (*payload, "xmin", "ymin", "xmax", "ymax")}
            out["cell"] = pa.array(ckey)
            return pa.table(out)

        return explode

    le = left.map_batches(make_explode("l_", left_cols), batch_format="pyarrow")
    re_ = right.map_batches(make_explode("r_", right_cols), batch_format="pyarrow")
    j = shuffle_hash_join(le, re_, on="cell", num_partitions=num_partitions)

    def overlap(b: pa.Table) -> pa.Table:
        if "cell" not in b.column_names:  # schema-less empty block
            return b
        lx0 = b.column("l_xmin").to_numpy(zero_copy_only=False)
        ly0 = b.column("l_ymin").to_numpy(zero_copy_only=False)
        lx1 = b.column("l_xmax").to_numpy(zero_copy_only=False)
        ly1 = b.column("l_ymax").to_numpy(zero_copy_only=False)
        rx0 = b.column("r_xmin").to_numpy(zero_copy_only=False)
        ry0 = b.column("r_ymin").to_numpy(zero_copy_only=False)
        rx1 = b.column("r_xmax").to_numpy(zero_copy_only=False)
        ry1 = b.column("r_ymax").to_numpy(zero_copy_only=False)
        hit = (lx0 <= rx1) & (rx0 <= lx1) & (ly0 <= ry1) & (ry0 <= ly1)
        # canonical tile: the one holding the intersection's min corner
        ix = np.maximum(lx0, rx0)
        iy = np.maximum(ly0, ry0)
        ckey = (
            (np.floor(ix / cell).astype(np.int64) + _BOX_OFF) << np.int64(24)
        ) + (np.floor(iy / cell).astype(np.int64) + _BOX_OFF)
        hit &= ckey == b.column("cell").to_numpy(zero_copy_only=False)
        keep = [f"l_{c}" for c in left_cols] + [f"r_{c}" for c in right_cols]
        return b.filter(pa.array(hit)).select(keep)

    return j.map_batches(overlap, batch_format="pyarrow")


def radius_self_join(
    pos: ray.data.Dataset,
    *,
    radius_m: float,
    zoom: int,
    id_col: str = "doc_id",
    mx_col: str = "mx",
    my_col: str = "my",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distance-threshold self-join: every unordered pair of points
    within ``radius_m`` planar EPSG:3857 meters, emitted EXACTLY once
    as (a_doc_id < b_doc_id, floor(squared distance)).

    The classic grid-bucketed ε-join: points are assigned to Mercator
    tiles at ``zoom`` (cell side CE/2^zoom, which must be >= radius_m —
    asserted), each point is replicated to its 3x3 tile neighborhood,
    ONE hash exchange on the tile key co-locates candidates, and each
    group tests home points against all candidates vectorized.
    Exactly-once by construction: a pair is emitted only from the HOME
    tile of its lower-id endpoint (home vs replica is a flag, and the
    lower-id endpoint's home tile always holds the higher-id one as
    home-or-replica because the grid side bounds the distance).

    Scale shape: replication is a constant 9x on narrow (id, mx, my)
    rows — the payload never fans out; group size is the points per
    tile, so ``zoom`` doubles as the skew knob (halve the radius bound
    by going one zoom deeper and re-running on dense tiles — quadtree
    refinement — if a tile outgrows a task).
    """
    side = CE / float(1 << zoom)
    if side < radius_m:
        raise ValueError(
            f"cell side {side:.0f} m at zoom {zoom} < radius {radius_m:.0f} m: "
            "adjacent-cell candidates would miss pairs"
        )
    r2 = float(radius_m) * float(radius_m)
    nside = np.int64((1 << zoom) + 2)

    def replicate(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mx = b.column(mx_col).to_numpy(zero_copy_only=False)
        my = b.column(my_col).to_numpy(zero_copy_only=False)
        hx, hy = point_to_tile(zoom, mx, my)
        hx = hx.astype(np.int64)
        hy = hy.astype(np.int64)
        n = len(ids)
        dxs = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int64)
        dys = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.int64)
        tx = (hx[:, None] + dxs[None, :]).ravel()
        ty = (hy[:, None] + dys[None, :]).ravel()
        rep = np.repeat(np.arange(n), 9)
        is_home = np.tile((dxs == 0) & (dys == 0), n)
        tkey = (tx + 1) * nside + (ty + 1)
        return pa.table(
            {
                "tkey": pa.array(tkey, pa.int64()),
                "pid": pa.array(ids[rep], pa.int64()),
                "pmx": pa.array(mx[rep], pa.float64()),
                "pmy": pa.array(my[rep], pa.float64()),
                "home": pa.array(is_home),
            }
        )

    out_schema = pa.schema(
        [
            ("a_doc_id", pa.int64()),
            ("b_doc_id", pa.int64()),
            ("dist2_m2", pa.int64()),
        ]
    )

    def pairs(g: pa.Table) -> pa.Table:
        home = g.column("home").to_numpy(zero_copy_only=False)
        if not home.any():
            return out_schema.empty_table()
        ids = g.column("pid").to_numpy(zero_copy_only=False)
        mx = g.column("pmx").to_numpy(zero_copy_only=False)
        my = g.column("pmy").to_numpy(zero_copy_only=False)
        aid, amx, amy = ids[home], mx[home], my[home]
        # a (home, lower id) vs every candidate b in the neighborhood;
        # float tree (a - b) kept exactly as the SQL oracle writes it
        dx = amx[:, None] - mx[None, :]
        dy = amy[:, None] - my[None, :]
        d2 = dx * dx + dy * dy
        hit = (aid[:, None] < ids[None, :]) & (d2 <= r2)
        ai, bi = np.nonzero(hit)
        return pa.table(
            {
                "a_doc_id": pa.array(aid[ai], pa.int64()),
                "b_doc_id": pa.array(ids[bi], pa.int64()),
                "dist2_m2": pa.array(
                    np.floor(d2[ai, bi]).astype(np.int64), pa.int64()
                ),
            }
        )

    rep = pos.map_batches(replicate, batch_format="pyarrow")
    if num_partitions:
        rep = rep.repartition(num_partitions, keys=["tkey"])
    return rep.groupby("tkey").map_groups(pairs, batch_format="pyarrow")


def idw_interpolate(
    queries: ray.data.Dataset,
    samples: ray.data.Dataset,
    *,
    radius_m: float,
    zoom: int,
    qid_col: str = "qid",
    val_col: str = "val",
    quantum: float = 1e4,
) -> ray.data.Dataset:
    """Inverse-distance-weighted interpolation: for each query point,
    idw = Σ(vᵢ/d²ᵢ) / Σ(1/d²ᵢ) over the samples within ``radius_m``
    planar EPSG:3857 meters (0 < d² ≤ r²; exact-coincident samples are
    excluded by contract so the weight is always finite).  Queries with
    no sample in range emit nothing.

    Same grid-bucket topology as ``radius_self_join`` but bipartite:
    queries sit in their home Mercator tile at ``zoom`` (cell side must
    be >= radius), samples replicate to their 3x3 neighborhood, the two
    sides union into ONE hash exchange on the tile key, and each group
    evaluates its home queries against all candidate samples with one
    vectorized distance matrix.  A query's full candidate set is inside
    its home group by construction, so the weighted sums finalize in
    one pass — no second exchange.
    """
    side = CE / float(1 << zoom)
    if side < radius_m:
        raise ValueError(
            f"cell side {side:.0f} m at zoom {zoom} < radius {radius_m:.0f} m"
        )
    r2 = float(radius_m) * float(radius_m)
    nside = np.int64((1 << zoom) + 2)

    def q_side(b: pa.Table) -> pa.Table:
        ids = b.column(qid_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mx = b.column("mx").to_numpy(zero_copy_only=False)
        my = b.column("my").to_numpy(zero_copy_only=False)
        hx, hy = point_to_tile(zoom, mx, my)
        tkey = (hx.astype(np.int64) + 1) * nside + (hy.astype(np.int64) + 1)
        return pa.table(
            {
                "tkey": pa.array(tkey, pa.int64()),
                "pid": pa.array(ids, pa.int64()),
                "pmx": pa.array(mx, pa.float64()),
                "pmy": pa.array(my, pa.float64()),
                "pval": pa.array(np.zeros(len(ids)), pa.float64()),
                "is_query": pa.array(np.ones(len(ids), dtype=bool)),
            }
        )

    def s_side(b: pa.Table) -> pa.Table:
        mx = b.column("mx").to_numpy(zero_copy_only=False)
        my = b.column("my").to_numpy(zero_copy_only=False)
        val = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        hx, hy = point_to_tile(zoom, mx, my)
        hx = hx.astype(np.int64)
        hy = hy.astype(np.int64)
        n = len(mx)
        dxs = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int64)
        dys = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.int64)
        tx = (hx[:, None] + dxs[None, :]).ravel()
        ty = (hy[:, None] + dys[None, :]).ravel()
        rep = np.repeat(np.arange(n), 9)
        tkey = (tx + 1) * nside + (ty + 1)
        return pa.table(
            {
                "tkey": pa.array(tkey, pa.int64()),
                "pid": pa.array(np.full(9 * n, -1, np.int64), pa.int64()),
                "pmx": pa.array(mx[rep], pa.float64()),
                "pmy": pa.array(my[rep], pa.float64()),
                "pval": pa.array(val[rep], pa.float64()),
                "is_query": pa.array(np.zeros(9 * n, dtype=bool)),
            }
        )

    out_schema = pa.schema(
        [("qid", pa.int64()), ("n", pa.int64()), ("idw_e4", pa.int64())]
    )

    def interp(g: pa.Table) -> pa.Table:
        isq = g.column("is_query").to_numpy(zero_copy_only=False)
        if not isq.any() or isq.all():
            return out_schema.empty_table()
        mx = g.column("pmx").to_numpy(zero_copy_only=False)
        my = g.column("pmy").to_numpy(zero_copy_only=False)
        qid = g.column("pid").to_numpy(zero_copy_only=False)[isq]
        qmx, qmy = mx[isq], my[isq]
        smx, smy = mx[~isq], my[~isq]
        sval = g.column("pval").to_numpy(zero_copy_only=False)[~isq]
        dx = qmx[:, None] - smx[None, :]
        dy = qmy[:, None] - smy[None, :]
        d2 = dx * dx + dy * dy
        ok = (d2 > 0.0) & (d2 <= r2)
        n = ok.sum(axis=1).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            num = np.where(ok, sval[None, :] / d2, 0.0).sum(axis=1)
            den = np.where(ok, 1.0 / d2, 0.0).sum(axis=1)
        keep = n > 0
        idw = num[keep] / den[keep]
        return pa.table(
            {
                "qid": pa.array(qid[keep], pa.int64()),
                "n": pa.array(n[keep], pa.int64()),
                "idw_e4": pa.array(
                    np.floor(idw * quantum + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    both = queries.map_batches(q_side, batch_format="pyarrow").union(
        samples.map_batches(s_side, batch_format="pyarrow")
    )
    return both.groupby("tkey").map_groups(interp, batch_format="pyarrow")


def trajectory_session_paths(
    ds: ray.data.Dataset,
    part_keys: list[str],
    order_cols: list[str],
    ts_col: str,
    *,
    mx_col: str = "mx",
    my_col: str = "my",
    gap_seconds: float,
    quantum: float = 1e2,
) -> ray.data.Dataset:
    """Trajectory mining: gap-sessionize each key's ordered point
    stream and measure every session's path length (sum of consecutive
    planar EPSG:3857 hop distances) — sessionization and the hop
    geometry fused into ONE groupby exchange (the ``sessionize`` /
    ``lag_within_groups`` shape; same partitioning assumption: one
    key's history fits a worker heap, time-bucket upstream otherwise).

    Output per (part_keys..., session_id): n_hops and the path length
    quantized with floor(x·quantum + 0.5).  Single-point sessions emit
    n_hops = 0, path 0.
    """
    order_cols = list(order_cols)
    part_keys = list(part_keys)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort")
        ts = df[ts_col]
        gap = ts.diff().dt.total_seconds() if str(ts.dtype).startswith(
            "datetime"
        ) else ts.diff()
        new_sess = gap.isna() | (gap > gap_seconds)
        sess = new_sess.cumsum().astype(np.int64)
        dx = df[mx_col].diff().to_numpy()
        dy = df[my_col].diff().to_numpy()
        hop = np.sqrt(dx * dx + dy * dy)
        hop[new_sess.to_numpy()] = np.nan
        out = df[part_keys].iloc[:1].copy()
        g = pd.DataFrame(
            {"session_id": sess.to_numpy(), "hop": hop}
        ).groupby("session_id", sort=True)["hop"]
        agg = pd.DataFrame(
            {"n_hops": g.count().astype(np.int64), "path_sum": g.sum()}
        ).reset_index()
        for k in part_keys:
            agg[k] = out[k].iloc[0]
        agg["path_m_e2"] = np.floor(
            agg["path_sum"].fillna(0.0) * quantum + 0.5
        ).astype(np.int64)
        return agg[part_keys + ["session_id", "n_hops", "path_m_e2"]]

    return ds.groupby(part_keys).map_groups(f, batch_format="pandas")


def dbscan_grid(
    pos: ray.data.Dataset,
    *,
    eps_m: float,
    zoom: int,
    min_pts: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed DBSCAN over planar EPSG:3857 points, composed from
    the engine's own primitives: the grid-bucketed ε-join
    (``radius_self_join``) supplies the neighbor graph, degrees come
    from one narrow groupby, core-core edges feed the sharded
    union-find (``dedup.connected_components``), and border points
    attach to the minimum adjacent core label (the deterministic pin of
    DBSCAN's order-dependent border assignment).

    Definitions (mirrored by the SQL oracle): a point is CORE iff its
    ε-neighborhood, itself included, has >= ``min_pts`` members; a
    cluster is a connected component of core points under the ε
    relation, labeled by its smallest core id; a BORDER point is a
    non-core point ε-adjacent to >= 1 core (label = min adjacent
    core's label); everything else is NOISE (cluster = -1).

    Scale shape: every intermediate is a narrow id table — pairs,
    degrees, labels — shuffled at most once each; points/payloads never
    replicate beyond the ε-join's constant 9x.  No driver-side state at
    all (contrast ``compute_drop_ids``'s O(duplicates) pull): labels
    stay distributed end to end.
    """
    from .dedup import connected_components
    from .relational import grouped_aggregate

    raw = radius_self_join(
        pos,
        radius_m=eps_m,
        zoom=zoom,
        id_col=id_col,
        num_partitions=num_partitions,
    )

    def uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {"u": b.column("a_doc_id"), "v": b.column("b_doc_id")}
        )

    pairs = raw.map_batches(uv, batch_format="pyarrow").materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": pa.concat_arrays(
                    [
                        b.column("u").combine_chunks(),
                        b.column("v").combine_chunks(),
                    ]
                )
            }
        )

    deg = grouped_aggregate(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        ["pid"],
        [("deg", "pid", "count")],
    )

    # groupby-based inner attach (all-int64 narrow rows): robust to
    # arbitrarily sparse keys, unlike Ray 2.49's hash join which
    # crashes on empty partitions (see shuffle_hash_join's note)
    def _group_attach(left, key_col, carry_cols, right, right_key, val_col, out_col):
        def pack_l(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table(
                {
                    "__k": pc.cast(b.column(key_col), pa.int64()),
                    **{c: b.column(c) for c in carry_cols},
                    "__val": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "__r": pa.array(np.zeros(n, bool)),
                }
            )

        def pack_r(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table(
                {
                    "__k": pc.cast(b.column(right_key), pa.int64()),
                    **{
                        c: pa.array(np.full(n, -1, np.int64), pa.int64())
                        for c in carry_cols
                    },
                    "__val": pc.cast(b.column(val_col), pa.int64()),
                    "__r": pa.array(np.ones(n, bool)),
                }
            )

        both = left.map_batches(pack_l, batch_format="pyarrow").union(
            right.map_batches(pack_r, batch_format="pyarrow")
        )

        def g(t: pa.Table) -> pa.Table:
            isr = t.column("__r").to_numpy(zero_copy_only=False)
            out_cols = [key_col] + list(carry_cols) + [out_col]
            if not isr.any() or isr.all():  # inner semantics
                return pa.schema(
                    [(c, pa.int64()) for c in out_cols]
                ).empty_table()
            val = t.column("__val").to_numpy(zero_copy_only=False)[isr][0]
            lt = t.filter(pa.array(~isr))
            n = len(lt)
            return pa.table(
                {
                    key_col: lt.column("__k"),
                    **{c: lt.column(c) for c in carry_cols},
                    out_col: pa.array(np.full(n, val, np.int64), pa.int64()),
                }
            )

        return both.groupby("__k").map_groups(g, batch_format="pyarrow")

    with_u = _group_attach(pairs, "u", ["v"], deg, "pid", "deg", "deg_u")
    flagged = _group_attach(
        with_u, "v", ["u", "deg_u"], deg, "pid", "deg", "deg_v"
    ).materialize()

    def both_core(b: pa.Table) -> pa.Table:
        du = b.column("deg_u").to_numpy(zero_copy_only=False)
        dv = b.column("deg_v").to_numpy(zero_copy_only=False)
        return b.filter(pa.array((du + 1 >= min_pts) & (dv + 1 >= min_pts))).select(
            ["u", "v"]
        )

    cc_edges = flagged.map_batches(both_core, batch_format="pyarrow")
    comp = connected_components(cc_edges)

    # isolated cores (no core-core edge) label themselves: union a
    # self-map of every core, keep min label per node
    def self_map(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(d + 1 >= min_pts))
        return pa.table({"node": t.column("pid"), "component": t.column("pid")})

    core_labels = grouped_aggregate(
        comp.union(deg.map_batches(self_map, batch_format="pyarrow")),
        ["node"],
        [("component", "component", "min")],
    ).materialize()

    def border_pairs(b: pa.Table) -> pa.Table:
        uc = b.column("deg_u").to_numpy(zero_copy_only=False) + 1 >= min_pts
        vc = b.column("deg_v").to_numpy(zero_copy_only=False) + 1 >= min_pts
        u = b.column("u").combine_chunks()
        v = b.column("v").combine_chunks()
        t1 = pa.table({"nc": v, "c": u}).filter(pa.array(uc & ~vc))
        t2 = pa.table({"nc": u, "c": v}).filter(pa.array(vc & ~uc))
        return pa.concat_tables([t1, t2])

    border_labels = grouped_aggregate(
        _group_attach(
            flagged.map_batches(border_pairs, batch_format="pyarrow"),
            "c",
            ["nc"],
            core_labels,
            "node",
            "component",
            "component",
        ).select_columns(["nc", "component"]),
        ["nc"],
        [("component", "component", "min")],
    )

    # assemble: core beats border beats noise, one narrow groupby
    def tag(role, prio, node_col):
        def f(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table(
                {
                    id_col: b.column(node_col),
                    "cluster": (
                        b.column("component")
                        if "component" in b.column_names
                        else pa.array(np.full(n, -1, np.int64), pa.int64())
                    ),
                    "role": pa.array([role] * n, pa.string()),
                    "prio": pa.array(np.full(n, prio, np.int8), pa.int8()),
                }
            )

        return f

    cands = (
        core_labels.map_batches(tag("core", 0, "node"), batch_format="pyarrow")
        .union(
            border_labels.map_batches(tag("border", 1, "nc"), batch_format="pyarrow")
        )
        .union(
            pos.select_columns([id_col]).map_batches(
                tag("noise", 2, id_col), batch_format="pyarrow"
            )
        )
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        best = df.sort_values("prio", kind="mergesort").head(1)
        return best[[id_col, "cluster", "role"]]

    return cands.groupby(id_col).map_groups(pick, batch_format="pandas")


def rasterize_polygons(
    polys: ray.data.Dataset,
    *,
    zoom: int,
    tilesize: int = 32,
    id_col: str = "poly_id",
) -> ray.data.Dataset:
    """Vector→raster rasterization (the inverse of the engine's
    raster↔vector joins): burn Mercator polygons onto the XYZ tile grid
    at ``zoom``, emitting per tile the count of pixel CENTERS covered
    by >= 1 polygon — GDAL RasterizeLayer's coverage semantics on the
    tile pyramid, with the same even-odd center test (and float
    expression tree) as ``zonal_stats_polygon``.

    Topology = the PBSM shape: each polygon's mercator bbox explodes to
    its covering tiles (vectorized ragged expansion, the
    ``tile_range`` cover math), ONE hash exchange on the tile key
    co-locates polygons per tile, and the per-group kernel ORs each
    polygon's vectorized even-odd mask into one tilesize² bitmap.
    Output rows: (zoom, x, y, n_covered), only tiles with coverage.

    ``polys``: (id_col, xs: list<float64>, ys: list<float64>) with
    vertices in EPSG:3857.
    """
    from ..geo import CE, ORIGIN

    zf = float(1 << zoom)
    eps = 1e-11

    def explode(b: pa.Table) -> pa.Table:
        xs = b.column("xs")
        ys = b.column("ys")
        xo = xs.combine_chunks()
        yo = ys.combine_chunks()
        n = len(b)
        offs = xo.offsets.to_numpy()
        fx = np.asarray(xo.values, dtype=np.float64)
        fy = np.asarray(yo.values, dtype=np.float64)
        # per-poly bbox via reduceat on the list offsets
        starts = offs[:-1]
        bxmin = np.minimum.reduceat(fx, starts)
        bxmax = np.maximum.reduceat(fx, starts)
        bymin = np.minimum.reduceat(fy, starts)
        bymax = np.maximum.reduceat(fy, starts)
        # tile cover (geo/tileid.py tile_range float math, vectorized)
        txmin = np.clip(np.floor(((bxmin + ORIGIN) / CE) * zf), 0, zf - 1)
        tymin = np.clip(np.floor((1.0 - ((bymax + ORIGIN) / CE)) * zf), 0, zf - 1)
        txmax = np.clip(np.floor(((((bxmax + ORIGIN) / CE)) - eps) * zf), 0, zf - 1)
        tymax = np.clip(
            np.floor((1.0 - (((bymin + ORIGIN) / CE) + eps)) * zf), 0, zf - 1
        )
        nx = (txmax - txmin + 1).astype(np.int64)
        ny = (tymax - tymin + 1).astype(np.int64)
        cnt = nx * ny
        total = int(cnt.sum())
        rep = np.repeat(np.arange(n), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        gx = off % np.repeat(nx, cnt)
        gy = off // np.repeat(nx, cnt)
        tx = (txmin.astype(np.int64)[rep] + gx).astype(np.int64)
        ty = (tymin.astype(np.int64)[rep] + gy).astype(np.int64)
        return pa.table(
            {
                "tkey": pa.array(tx * np.int64(1 << zoom) + ty, pa.int64()),
                "tx": pa.array(tx, pa.int64()),
                "ty": pa.array(ty, pa.int64()),
                id_col: pc.take(b.column(id_col), pa.array(rep)),
                "xs": pc.take(xs, pa.array(rep)),
                "ys": pc.take(ys, pa.array(rep)),
            }
        )

    out_schema = pa.schema(
        [
            ("zoom", pa.int64()),
            ("x", pa.int64()),
            ("y", pa.int64()),
            ("n_covered", pa.int64()),
        ]
    )

    def burn(g: pa.Table) -> pa.Table:
        from ..geo.tileid import tile_mercator_bounds

        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        bxmin, bymin, bxmax, bymax = (
            float(v[0])
            for v in tile_mercator_bounds(
                np.array([zoom]), np.array([tx]), np.array([ty])
            )
        )
        span = bxmax - bxmin
        # pixel-center grid (same (i + 0.5) / ts parameterization the
        # SQL oracle mirrors)
        px = bxmin + (np.arange(tilesize, dtype=np.float64) + 0.5) * (
            span / tilesize
        )
        py = bymax - (np.arange(tilesize, dtype=np.float64) + 0.5) * (
            span / tilesize
        )
        pxg = np.broadcast_to(px[None, :], (tilesize, tilesize))
        pyg = np.broadcast_to(py[:, None], (tilesize, tilesize))
        mask = np.zeros((tilesize, tilesize), dtype=bool)
        xs_col = g.column("xs").combine_chunks()
        ys_col = g.column("ys").combine_chunks()
        for i in range(len(g)):  # coarse loop over polys in this tile
            xs = np.asarray(xs_col[i].values, dtype=np.float64)
            ys = np.asarray(ys_col[i].values, dtype=np.float64)
            mask |= _even_odd_mask(pxg, pyg, xs, ys)
        n = int(mask.sum())
        if n == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "zoom": pa.array([zoom], pa.int64()),
                "x": pa.array([tx], pa.int64()),
                "y": pa.array([ty], pa.int64()),
                "n_covered": pa.array([n], pa.int64()),
            }
        )

    return (
        polys.map_batches(explode, batch_format="pyarrow")
        .groupby("tkey")
        .map_groups(burn, batch_format="pyarrow")
    )


def simplify_polylines(
    ds: ray.data.Dataset,
    *,
    tolerance: float,
    id_col: str = "line_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> ray.data.Dataset:
    """Douglas-Peucker polyline simplification (the cartographic
    generalization pass before vector tiling): per line, keep the
    endpoints and recursively the point farthest from each kept chord
    while that distance exceeds ``tolerance``.  Map-only — each row
    simplifies independently, zero exchanges; the per-chord
    farthest-point search is one vectorized point-segment distance
    pass (perpendicular distance, endpoint distance for degenerate
    chords), the recursion an explicit stack.

    Output: (id_col, n_in, n_out, xs, ys) with the simplified chain in
    input order.
    """

    def seg_dist(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            return np.hypot(px - ax, py - ay)
        t = np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
        return np.hypot(px - (ax + t * dx), py - (ay + t * dy))

    def simplify(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        n = len(xs)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            idx = np.arange(a + 1, b)
            d = seg_dist(xs[idx], ys[idx], xs[a], ys[a], xs[b], ys[b])
            i = int(np.argmax(d))
            if d[i] > tolerance:
                m = a + 1 + i
                keep[m] = True
                stack.append((a, m))
                stack.append((m, b))
        return keep

    def f(b: pa.Table) -> pa.Table:
        ids, nin, nout, oxs, oys = [], [], [], [], []
        xs_arr = b.column(xs_col).combine_chunks()
        ys_arr = b.column(ys_col).combine_chunks()
        id_arr = b.column(id_col)
        for i in range(len(b)):  # coarse per-line loop; DP inside is numpy
            xs = np.asarray(xs_arr[i].values, dtype=np.float64)
            ys = np.asarray(ys_arr[i].values, dtype=np.float64)
            if len(xs) < 3:
                keep = np.ones(len(xs), dtype=bool)
            else:
                keep = simplify(xs, ys)
            ids.append(id_arr[i].as_py())
            nin.append(len(xs))
            nout.append(int(keep.sum()))
            oxs.append(xs[keep].tolist())
            oys.append(ys[keep].tolist())
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_in": pa.array(nin, pa.int64()),
                "n_out": pa.array(nout, pa.int64()),
                "xs": pa.array(oxs, pa.list_(pa.float64())),
                "ys": pa.array(oys, pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _clip_convex_halfplane(pts: np.ndarray, axis: int, bound: float, keep_le: bool) -> np.ndarray:
    """One Sutherland-Hodgman pass: clip a polygon (n,2) against
    axis <= bound (keep_le) or axis >= bound."""
    if len(pts) == 0:
        return pts
    out = []
    n = len(pts)
    for i in range(n):
        cur = pts[i]
        prv = pts[i - 1]
        cin = (cur[axis] <= bound) if keep_le else (cur[axis] >= bound)
        pin = (prv[axis] <= bound) if keep_le else (prv[axis] >= bound)
        if cin != pin:
            t = (bound - prv[axis]) / (cur[axis] - prv[axis])
            out.append(prv + t * (cur - prv))
        if cin:
            out.append(cur)
    return np.asarray(out) if out else np.empty((0, 2))


def clip_area_with_box(
    xs: np.ndarray, ys: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> float:
    """Area of polygon ∩ axis-aligned box via four Sutherland-Hodgman
    half-plane clips + shoelace.  Exact for convex polygons; standard
    cartographic overlay kernel."""
    pts = np.stack([np.asarray(xs, np.float64), np.asarray(ys, np.float64)], axis=1)
    pts = _clip_convex_halfplane(pts, 0, x1, True)
    pts = _clip_convex_halfplane(pts, 0, x0, False)
    pts = _clip_convex_halfplane(pts, 1, y1, True)
    pts = _clip_convex_halfplane(pts, 1, y0, False)
    if len(pts) < 3:
        return 0.0
    x = pts[:, 0]
    y = pts[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) * 0.5)


def polygon_box_clip_areas(
    polys: ray.data.Dataset,
    boxes: ray.data.Dataset,
    *,
    cell: float,
    poly_id: str = "poly_id",
    box_id: str = "box_id",
    quantum: float = 1e2,
) -> ray.data.Dataset:
    """Overlay analysis: for every (polygon, box) candidate pair from
    the PBSM grid join (polygon bboxes vs boxes, one exchange), the
    exact polygon∩box area via Sutherland-Hodgman clipping — emitted
    only when the clipped area is positive.

    ``polys``: (poly_id, xs, ys) convex rings; ``boxes``: (box_id,
    xmin, ymin, xmax, ymax).  Geometry rides the join as list columns;
    the clip kernel is per-pair (bounded by candidate count, not
    corpus size).
    """

    def pboxes(b: pa.Table) -> pa.Table:
        xs = b.column("xs").combine_chunks()
        ys = b.column("ys").combine_chunks()
        offs = xs.offsets.to_numpy()
        fx = np.asarray(xs.values, np.float64)
        fy = np.asarray(ys.values, np.float64)
        starts = offs[:-1]
        # ring serialized to one binary blob: Arrow's hash join rejects
        # list<double> payload columns (acero non-key field limit)
        geoms = [
            np.stack([fx[offs[i]:offs[i + 1]], fy[offs[i]:offs[i + 1]]]).tobytes()
            for i in range(len(b))
        ]
        return pa.table(
            {
                poly_id: b.column(poly_id),
                "xmin": pa.array(np.minimum.reduceat(fx, starts)),
                "ymin": pa.array(np.minimum.reduceat(fy, starts)),
                "xmax": pa.array(np.maximum.reduceat(fx, starts)),
                "ymax": pa.array(np.maximum.reduceat(fy, starts)),
                "geom": pa.array(geoms, pa.binary()),
            }
        )

    j = box_intersect_join(
        polys.map_batches(pboxes, batch_format="pyarrow"),
        boxes,
        cell=cell,
        left_cols=[poly_id, "geom"],
        right_cols=[box_id, "xmin", "ymin", "xmax", "ymax"],
    )

    out_schema = pa.schema(
        [(poly_id, pa.int64()), (box_id, pa.int64()), ("clip_area_e2", pa.int64())]
    )

    def clip(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        pids = b.column(f"l_{poly_id}").to_numpy(zero_copy_only=False)
        bids = b.column(f"r_{box_id}").to_numpy(zero_copy_only=False)
        geoms = b.column("l_geom").to_pylist()
        x0 = b.column("r_xmin").to_numpy(zero_copy_only=False)
        y0 = b.column("r_ymin").to_numpy(zero_copy_only=False)
        x1 = b.column("r_xmax").to_numpy(zero_copy_only=False)
        y1 = b.column("r_ymax").to_numpy(zero_copy_only=False)
        op, ob, oa = [], [], []
        for i in range(len(b)):  # per candidate pair; kernel is numpy
            ring = np.frombuffer(geoms[i], dtype=np.float64).reshape(2, -1)
            a = clip_area_with_box(
                ring[0], ring[1],
                float(x0[i]), float(y0[i]), float(x1[i]), float(y1[i]),
            )
            if a > 0.0:
                op.append(int(pids[i]))
                ob.append(int(bids[i]))
                oa.append(int(np.floor(a * quantum + 0.5)))
        return pa.table(
            {
                poly_id: pa.array(op, pa.int64()),
                box_id: pa.array(ob, pa.int64()),
                "clip_area_e2": pa.array(oa, pa.int64()),
            }
        )

    return j.map_batches(clip, batch_format="pyarrow")


_EARTH_R = 6371000.0


def haversine_self_join(
    pos: ray.data.Dataset,
    *,
    radius_m: float,
    lat_max: float = 60.0,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> ray.data.Dataset:
    """Spherical distance-threshold self-join: every unordered pair of
    points within ``radius_m`` GREAT-CIRCLE meters (haversine), exactly
    once — the true-Earth counterpart of the planar
    ``radius_self_join``.

    Grid guarantee: points are restricted to |lat| <= ``lat_max`` (the
    documented band contract; beyond it lon cells degenerate toward the
    poles) and bucketed on a lon/lat grid of side
    90·radius/(R·cos(lat_max)) degrees.  Since great-circle distance
    d >= (2/π)·R·Δφ and d >= (2/π)·R·cos(φmax)·Δλ, any pair within
    radius lands in the same or adjacent cells — same 3x3 replication
    and lower-id-home-cell exactly-once rule as the planar join.
    Output: (a_doc_id < b_doc_id, floor(haversine meters)).
    """
    import math

    cell = 90.0 * radius_m / (_EARTH_R * math.cos(math.radians(lat_max)))
    # longitude cells form a RING (the antimeridian is an ordinary cell
    # boundary — haversine is periodic in Δλ, so pairs straddling ±180°
    # must still land in adjacent cells); 360/n_lon >= cell keeps the
    # adjacency guarantee with the last cell never undersized
    n_lon = max(1, int(360.0 / cell))
    cell_lon = 360.0 / n_lon
    ncols = np.int64(n_lon + 3)

    def replicate(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy(zero_copy_only=False)
        keep = np.abs(lat) <= lat_max
        b = b.filter(pa.array(keep))
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lon = b.column(lon_col).to_numpy(zero_copy_only=False)
        lat = b.column(lat_col).to_numpy(zero_copy_only=False)
        hx = np.clip(
            np.floor((lon + 180.0) / cell_lon).astype(np.int64), 0, n_lon - 1
        )
        hy = np.floor((lat + 90.0) / cell).astype(np.int64)
        n = len(ids)
        dxs = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int64)
        dys = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.int64)
        tx = (hx[:, None] + dxs[None, :]).ravel() % n_lon  # ring wrap
        ty = (hy[:, None] + dys[None, :]).ravel()
        rep = np.repeat(np.arange(n), 9)
        is_home = np.tile((dxs == 0) & (dys == 0), n)
        return pa.table(
            {
                "gkey": pa.array((tx + 1) * ncols * 4 + (ty + 1), pa.int64()),
                "pid": pa.array(ids[rep], pa.int64()),
                "plon": pa.array(lon[rep], pa.float64()),
                "plat": pa.array(lat[rep], pa.float64()),
                "home": pa.array(is_home),
            }
        )

    out_schema = pa.schema(
        [("a_doc_id", pa.int64()), ("b_doc_id", pa.int64()), ("dist_m", pa.int64())]
    )

    def pairs(g: pa.Table) -> pa.Table:
        home = g.column("home").to_numpy(zero_copy_only=False)
        if not home.any():
            return out_schema.empty_table()
        ids = g.column("pid").to_numpy(zero_copy_only=False)
        lon = np.deg2rad(g.column("plon").to_numpy(zero_copy_only=False))
        lat = np.deg2rad(g.column("plat").to_numpy(zero_copy_only=False))
        aid, alon, alat = ids[home], lon[home], lat[home]
        # haversine, (other − home) differences — the SQL oracle keeps
        # the identical float tree
        sdlat = np.sin((lat[None, :] - alat[:, None]) / 2.0)
        sdlon = np.sin((lon[None, :] - alon[:, None]) / 2.0)
        a = sdlat * sdlat + np.cos(alat)[:, None] * np.cos(lat)[None, :] * (
            sdlon * sdlon
        )
        d = 2.0 * _EARTH_R * np.arcsin(np.sqrt(a))
        hit = (aid[:, None] < ids[None, :]) & (d <= radius_m)
        ai, bi = np.nonzero(hit)
        return pa.table(
            {
                "a_doc_id": pa.array(aid[ai], pa.int64()),
                "b_doc_id": pa.array(ids[bi], pa.int64()),
                "dist_m": pa.array(np.floor(d[ai, bi]).astype(np.int64), pa.int64()),
            }
        )

    return (
        pos.map_batches(replicate, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(pairs, batch_format="pyarrow")
    )


def segment_intersection_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    cell: float,
    left_id: str = "seg_id",
    right_id: str = "seg_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Line-segment intersection join: every (left, right) pair whose
    closed segments intersect — proper crossings AND collinear /
    endpoint touches — exactly once.

    Each side carries integer endpoint columns (x1, y1, x2, y2) plus an
    id; coordinates must stay below 2^31 so the orientation cross
    products stay exact in int64.  Plan: bounding boxes feed the PBSM
    ``box_intersect_join`` (one all-to-all on the grid key, canonical-
    cell exactly-once), then the exact predicate runs vectorized on the
    candidates — the classic filter-and-refine cascade; no second
    exchange.  Orientation tests compare SIGNS (never sign*sign
    products of raw crosses, which overflow int64 at 1e5-scale
    coordinates).  Output: (l_<id>, r_<id>).
    """

    def with_bbox(b: pa.Table) -> pa.Table:
        x1 = b.column("x1").to_numpy(zero_copy_only=False).astype(np.float64)
        y1 = b.column("y1").to_numpy(zero_copy_only=False).astype(np.float64)
        x2 = b.column("x2").to_numpy(zero_copy_only=False).astype(np.float64)
        y2 = b.column("y2").to_numpy(zero_copy_only=False).astype(np.float64)
        for name, arr in (
            ("xmin", np.minimum(x1, x2)),
            ("ymin", np.minimum(y1, y2)),
            ("xmax", np.maximum(x1, x2)),
            ("ymax", np.maximum(y1, y2)),
        ):
            b = b.append_column(name, pa.array(arr, pa.float64()))
        return b

    cols_l = [left_id, "x1", "y1", "x2", "y2"]
    cols_r = [right_id, "x1", "y1", "x2", "y2"]
    cand = box_intersect_join(
        left.map_batches(with_bbox, batch_format="pyarrow"),
        right.map_batches(with_bbox, batch_format="pyarrow"),
        cell=cell,
        left_cols=cols_l,
        right_cols=cols_r,
        num_partitions=num_partitions,
    )

    out_names = [f"l_{left_id}", f"r_{right_id}"]

    def exact(b: pa.Table) -> pa.Table:
        if "l_x1" not in b.column_names:  # schema-less empty block
            return pa.table({n: pa.array([], pa.int64()) for n in out_names})
        g = {c: b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
             for c in ("l_x1", "l_y1", "l_x2", "l_y2", "r_x1", "r_y1", "r_x2", "r_y2")}

        def orient(px, py, qx, qy, rx, ry):
            return np.sign((qx - px) * (ry - py) - (qy - py) * (rx - px))

        def onseg(px, py, qx, qy, rx, ry):
            return (
                (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
                & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
            )

        a = (g["l_x1"], g["l_y1"], g["l_x2"], g["l_y2"])
        c = (g["r_x1"], g["r_y1"], g["r_x2"], g["r_y2"])
        o1 = orient(a[0], a[1], a[2], a[3], c[0], c[1])
        o2 = orient(a[0], a[1], a[2], a[3], c[2], c[3])
        o3 = orient(c[0], c[1], c[2], c[3], a[0], a[1])
        o4 = orient(c[0], c[1], c[2], c[3], a[2], a[3])
        proper = (o1 * o2 < 0) & (o3 * o4 < 0)  # products of signs: safe
        touch = (
            ((o1 == 0) & onseg(a[0], a[1], a[2], a[3], c[0], c[1]))
            | ((o2 == 0) & onseg(a[0], a[1], a[2], a[3], c[2], c[3]))
            | ((o3 == 0) & onseg(c[0], c[1], c[2], c[3], a[0], a[1]))
            | ((o4 == 0) & onseg(c[0], c[1], c[2], c[3], a[2], a[3]))
        )
        return b.filter(pa.array(proper | touch)).select(
            [f"l_{left_id}", f"r_{right_id}"]
        )

    return cand.map_batches(exact, batch_format="pyarrow")


def adaptive_cell_partition(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    deep_zoom: int,
    max_per_cell: int,
    id_col: str = "doc_id",
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Skew-adaptive spatial partitioner: every point lands in its
    ``zoom``-level tile UNLESS that tile holds more than
    ``max_per_cell`` points — then its points are assigned at
    ``deep_zoom`` instead.  This is the repo's dense-zoom salting plan
    (SURVEY §4 skew row) promoted to a first-class operator: the
    output key set is what a downstream groupby / co-partitioned join
    should shuffle on, giving bounded per-key fan-in under arbitrary
    point skew while sparse regions keep fat, cheap cells.

    Topology: one narrow (cell, count) groupby — point ids/coords
    never enter it — then the hot-cell set (≤ N / max_per_cell keys,
    bounded by construction) broadcasts via ``ray.put`` and the final
    assignment is map-only.  Output: (id, cell_zoom, cx, cy).

    Both levels are computed independently from the coordinates with
    the same floor/clamp rule (geo/tileid.py point_to_tile), not by
    bit-shifting one from the other — keeps every engine that mirrors
    the formula (e.g. the SQL oracle) bit-consistent.
    """
    import pyarrow.compute as pc

    def coarse_key(b: pa.Table) -> pa.Table:
        x, y = point_to_tile(
            zoom,
            b.column(mx_col).to_numpy(zero_copy_only=False),
            b.column(my_col).to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"ckey": pa.array((x.astype(np.int64) << 32) | y.astype(np.int64))}
        )

    counts = (
        pos.map_batches(coarse_key, batch_format="pyarrow")
        .groupby("ckey")
        .count()
    )

    def only_hot(b: pa.Table) -> pa.Table:
        n = b.column("count()").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(n > max_per_cell)).select(["ckey"])

    hot = counts.map_batches(only_hot, batch_format="pyarrow").take_all()
    hot_ref = ray.put(pa.array(sorted(r["ckey"] for r in hot), pa.int64()))

    def assign(b: pa.Table) -> pa.Table:
        mx = b.column(mx_col).to_numpy(zero_copy_only=False)
        my = b.column(my_col).to_numpy(zero_copy_only=False)
        cx, cy = point_to_tile(zoom, mx, my)
        dx, dy = point_to_tile(deep_zoom, mx, my)
        ckey = (cx.astype(np.int64) << 32) | cy.astype(np.int64)
        is_hot = pc.is_in(pa.array(ckey), value_set=ray.get(hot_ref)).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                id_col: b.column(id_col),
                "cell_zoom": pa.array(
                    np.where(is_hot, deep_zoom, zoom).astype(np.int64)
                ),
                "cx": pa.array(np.where(is_hot, dx, cx).astype(np.int64)),
                "cy": pa.array(np.where(is_hot, dy, cy).astype(np.int64)),
            }
        )

    return pos.map_batches(assign, batch_format="pyarrow")


def snap_to_segments(
    points: ray.data.Dataset,
    segments: np.ndarray,
    *,
    id_col: str = "doc_id",
    x_col: str = "lon",
    y_col: str = "lat",
    quant: float = 1e4,
) -> ray.data.Dataset:
    """Map-matching primitive: snap every point to its nearest line
    segment (closest point on the segment, endpoints clamped) and
    report ``(id, seg_id, dist_e4)``.

    ``segments`` is an (S, 4) float array of (x1, y1, x2, y2) rows;
    ``seg_id`` is the row index.  The segment table is the SMALL side
    (a road/boundary network tile) so it is broadcast once via
    ``ray.put`` and each batch computes a vectorized B×S
    point-to-segment distance matrix — map-only, no shuffle.  For
    segment sets too big to broadcast, pre-bucket segments by cell
    (geo/cell.py) and co-partition, the same plan as
    ``point_in_polygon_cells``.

    Determinism contract: the winning segment is chosen by
    ``(floor(dist·quant + 0.5), seg_id)`` — the QUANTIZED distance —
    so exact geometric ties (e.g. a point whose nearest feature is a
    vertex shared by two segments) resolve identically in any engine
    that recomputes the same quantity (cf. the DuckDB oracle's
    ``row_number() OVER (ORDER BY dist_e4, seg_id)``).
    """
    segs = np.asarray(segments, dtype=np.float64)
    if segs.ndim != 2 or segs.shape[1] != 4:
        raise ValueError("segments must be (S, 4): x1, y1, x2, y2")
    seg_ref = ray.put(segs)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    id_col: ids,
                    "seg_id": pa.array([], pa.int64()),
                    "dist_e4": pa.array([], pa.int64()),
                }
            )
        s = ray.get(seg_ref)
        x1, y1, x2, y2 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        px = batch.column(x_col).to_numpy()[:, None]
        py = batch.column(y_col).to_numpy()[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            t = ((px - x1) * dx + (py - y1) * dy) / len2
        t = np.where(len2 > 0, np.clip(t, 0.0, 1.0), 0.0)
        cx = x1 + t * dx
        cy = y1 + t * dy
        dist = np.sqrt((px - cx) ** 2 + (py - cy) ** 2)
        de4 = np.floor(dist * quant + 0.5).astype(np.int64)
        # lexicographic (dist_e4, seg_id) argmin
        score = de4 * np.int64(len(s)) + np.arange(len(s), dtype=np.int64)
        j = np.argmin(score, axis=1)
        rows = np.arange(n)
        return pa.table(
            {
                id_col: ids,
                "seg_id": pa.array(j.astype(np.int64)),
                "dist_e4": pa.array(de4[rows, j]),
            }
        )

    return points.map_batches(f, batch_format="pyarrow")


def polygon_boundary_segments(polygons) -> np.ndarray:
    """Flatten generate_polygons-style rings into an (S, 4) segment
    array, seg_id = enumeration order (ring order, then edge order) —
    the same order an oracle embedding the edges as VALUES rows uses."""
    rows = []
    for p in polygons:
        lon, lat = p["lon"], p["lat"]
        m = len(lon)
        for e in range(m):
            k = (e + 1) % m
            rows.append((lon[e], lat[e], lon[k], lat[k]))
    return np.asarray(rows, dtype=np.float64)


def morton_cover_ranges(zoom: int, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Exact quadtree cover of the inclusive tile rectangle
    [x0..x1]×[y0..y1] at ``zoom`` as disjoint Morton-key ranges: an
    (R, 2) int64 array of half-open [start, end) intervals, sorted and
    coalesced.  R is O(perimeter · zoom), never O(area) — a 1000²-tile
    box covers with a few hundred ranges, not 10⁶ keys.

    Driver-side pure math (the BIGMIN-family trick in its simplest
    exact form): recursively split the zoom-level quad; a quad fully
    inside the box contributes its whole contiguous Morton interval,
    a disjoint quad contributes nothing, a straddling quad recurses.
    """
    from ..geo.cell import morton_interleave

    if x1 < x0 or y1 < y0:
        return np.empty((0, 2), dtype=np.int64)
    out: list[tuple[int, int]] = []

    def rec(level: int, qx: int, qy: int) -> None:
        # quad at `level` covers tiles [qx<<s, (qx+1)<<s) × same for y
        s = zoom - level
        tx0, ty0 = qx << s, qy << s
        tx1, ty1 = tx0 + (1 << s) - 1, ty0 + (1 << s) - 1
        if tx1 < x0 or tx0 > x1 or ty1 < y0 or ty0 > y1:
            return
        if x0 <= tx0 and tx1 <= x1 and y0 <= ty0 and ty1 <= y1:
            base = int(morton_interleave(np.array([tx0]), np.array([ty0]))[0])
            out.append((base, base + (1 << (2 * s))))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(level + 1, (qx << 1) | dx, (qy << 1) | dy)

    rec(0, 0, 0)
    out.sort()
    # coalesce adjacent intervals
    merged: list[list[int]] = []
    for s_, e_ in out:
        if merged and merged[-1][1] == s_:
            merged[-1][1] = e_
        else:
            merged.append([s_, e_])
    return np.asarray(merged, dtype=np.int64).reshape(-1, 2)


def hilbert_cover_ranges(zoom: int, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Exact quadtree cover of the inclusive tile rectangle as disjoint
    HILBERT-key ranges — ``morton_cover_ranges``' S2-style twin.

    Correct because every quadtree cell is one CONTIGUOUS run of the
    Hilbert curve (the curve finishes a quadrant before leaving it —
    property-tested in tests/test_spatial.py): a full quad (qx, qy) at
    ``level`` covers [h_level(qx,qy)·4^s, (h+1)·4^s) where h_level is
    the quad's position on the level-order curve and s = zoom − level.
    Hilbert covers coalesce into FEWER, longer ranges than Morton's for
    the same box (no half-plane jumps) — the S2 rationale, asserted in
    tests."""
    from ..geo.hilbert import hilbert_xy2d

    if x1 < x0 or y1 < y0:
        return np.empty((0, 2), dtype=np.int64)
    out: list[tuple[int, int]] = []

    def rec(level: int, qx: int, qy: int) -> None:
        s = zoom - level
        tx0, ty0 = qx << s, qy << s
        tx1, ty1 = tx0 + (1 << s) - 1, ty0 + (1 << s) - 1
        if tx1 < x0 or tx0 > x1 or ty1 < y0 or ty0 > y1:
            return
        if x0 <= tx0 and tx1 <= x1 and y0 <= ty0 and ty1 <= y1:
            h = (
                int(hilbert_xy2d(level, np.array([qx]), np.array([qy]))[0])
                if level > 0
                else 0
            )
            base = h * (1 << (2 * s))
            out.append((base, base + (1 << (2 * s))))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(level + 1, (qx << 1) | dx, (qy << 1) | dy)

    rec(0, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for s_, e_ in out:
        if merged and merged[-1][1] == s_:
            merged[-1][1] = e_
        else:
            merged.append([s_, e_])
    return np.asarray(merged, dtype=np.int64).reshape(-1, 2)


def hilbert_range_query(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """``zorder_range_query``'s Hilbert twin: select rows whose tile
    falls in the rectangle by membership in the exact Hilbert-range
    cover — the pruned read path of a ``hilbert_sort``-ed layout.
    Emits (…input columns…, hkey, tx, ty)."""
    from ..geo.hilbert import hilbert_xy2d
    from ..geo.tileid import point_to_tile

    ranges = hilbert_cover_ranges(zoom, x0, y0, x1, y1)
    starts_ref = ray.put((ranges[:, 0].copy(), ranges[:, 1].copy()))

    def f(batch: pa.Table) -> pa.Table:
        starts, ends = ray.get(starts_ref)
        tx, ty = point_to_tile(
            zoom, batch.column(mx_col).to_numpy(), batch.column(my_col).to_numpy()
        )
        h = hilbert_xy2d(zoom, tx, ty).astype(np.int64)
        if len(starts):
            i = np.searchsorted(starts, h, side="right") - 1
            ok = (i >= 0) & (h < ends[np.maximum(i, 0)])
        else:
            ok = np.zeros(len(h), dtype=bool)
        kept = batch.filter(pa.array(ok))
        return (
            kept.append_column("hkey", pa.array(h[ok]))
            .append_column("tx", pa.array(tx[ok].astype(np.int64)))
            .append_column("ty", pa.array(ty[ok].astype(np.int64)))
        )

    return pos.map_batches(f, batch_format="pyarrow")


def zorder_range_query(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Spatial-index range scan: select the rows whose ``zoom``-level
    tile falls in the inclusive rectangle [x0..x1]×[y0..y1], by Morton
    RANGE membership instead of per-row rectangle predicates — the read
    path that a zorder_sort-ed, zkey-range-partitioned layout serves
    with block pruning (only blocks whose zkey span intersects a cover
    range are even read; here the filter is the in-block equivalent).

    The quadtree cover is exact (no refine step needed: tile-aligned
    rectangles decompose exactly into quads); membership is two
    vectorized ``searchsorted`` probes per batch against the broadcast
    (R, 2) cover table.  Emits (…input columns…, zkey, tx, ty).
    """
    from ..geo.cell import morton_interleave
    from ..geo.tileid import point_to_tile

    ranges = morton_cover_ranges(zoom, x0, y0, x1, y1)
    starts_ref = ray.put((ranges[:, 0].copy(), ranges[:, 1].copy()))

    def f(batch: pa.Table) -> pa.Table:
        starts, ends = ray.get(starts_ref)
        tx, ty = point_to_tile(
            zoom, batch.column(mx_col).to_numpy(), batch.column(my_col).to_numpy()
        )
        z = morton_interleave(tx, ty).astype(np.int64)
        if len(starts):
            # zkey ∈ some [start, end): the candidate range is the last
            # one starting at or before zkey
            i = np.searchsorted(starts, z, side="right") - 1
            ok = (i >= 0) & (z < ends[np.maximum(i, 0)])
        else:
            ok = np.zeros(len(z), dtype=bool)
        m = pa.array(ok)
        kept = batch.filter(m)
        return (
            kept.append_column("zkey", pa.array(z[ok]))
            .append_column("tx", pa.array(tx[ok].astype(np.int64)))
            .append_column("ty", pa.array(ty[ok].astype(np.int64)))
        )

    return pos.map_batches(f, batch_format="pyarrow")


def _density_assign(
    batch: pa.Table, *, zoom: int, tilesize: int, mx_col: str, my_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per point: (tile_x, tile_y, in-tile pixel index) at ``zoom`` on a
    ``tilesize`` grid — the global-pixel floor math mirrored by the SQL
    oracles (same clamp convention as point_to_tile)."""
    from ..geo.mercator import ORIGIN

    n_px = (1 << zoom) * tilesize
    mx = batch.column(mx_col).to_numpy()
    my = batch.column(my_col).to_numpy()
    px = np.floor((mx + ORIGIN) / (2.0 * ORIGIN) * n_px)
    py = np.floor((1.0 - (my + ORIGIN) / (2.0 * ORIGIN)) * n_px)
    px = np.clip(px, 0, n_px - 1).astype(np.int64)
    py = np.clip(py, 0, n_px - 1).astype(np.int64)
    tx = px // tilesize
    ty = py // tilesize
    idx = (py % tilesize) * tilesize + (px % tilesize)
    return tx, ty, idx


def point_density_tiles(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    tilesize: int = 256,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Point-density rasterization summary (the heatmap primitive):
    per ``zoom``-level tile, ``total`` points, ``n_px`` distinct lit
    pixels, and ``px_checksum`` = Σ_points (pixel_index + 1) — a
    linear per-point closed form, so an external engine can verify the
    full pixel-assignment math without materializing grids.

    Two narrow exchanges: groupby (tile, pixel) counts (the density
    grid in sparse form — the honest representation at low zooms where
    most pixels are empty), then a per-tile rollup.  Points never
    carry payloads; grids never materialize dense here (see
    ``point_density_blocks`` for the renderer-facing dense form).
    """

    def assign(batch: pa.Table) -> pa.Table:
        tx, ty, idx = _density_assign(
            batch, zoom=zoom, tilesize=tilesize, mx_col=mx_col, my_col=my_col
        )
        return pa.table(
            {
                "x": pa.array(tx),
                "y": pa.array(ty),
                "pidx": pa.array(idx),
            }
        )

    sparse = (
        pos.map_batches(assign, batch_format="pyarrow")
        .groupby(["x", "y", "pidx"])
        .count()
    )

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("count()"), dtype=np.int64)
        pidx = np.asarray(batch.column("pidx"), dtype=np.int64)
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "total": pa.array(c),
                "n_px": pa.array(np.ones(len(batch), dtype=np.int64)),
                "px_checksum": pa.array(c * (pidx + 1)),
            }
        )

    agg = (
        sparse.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .sum(["total", "n_px", "px_checksum"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zoom": pa.array(np.full(len(batch), zoom, dtype=np.int64)),
                "x": batch.column("x"),
                "y": batch.column("y"),
                "total": batch.column("sum(total)"),
                "n_px": batch.column("sum(n_px)"),
                "px_checksum": batch.column("sum(px_checksum)"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def point_density_blocks(
    pos: ray.data.Dataset,
    *,
    zoom: int,
    tilesize: int = 256,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Dense per-tile density grids: (zoom, x, y, pixels: binary uint32
    tilesize² row-major counts) — the renderer-facing form (feed a
    colormap encoder for heatmap PNG tiles).  Same assignment math as
    ``point_density_tiles``; one groupby on the tile address, dense
    grid assembled per group with ``np.add.at``."""

    def assign(batch: pa.Table) -> pa.Table:
        tx, ty, idx = _density_assign(
            batch, zoom=zoom, tilesize=tilesize, mx_col=mx_col, my_col=my_col
        )
        return pa.table({"x": pa.array(tx), "y": pa.array(ty), "pidx": pa.array(idx)})

    def build(g: pa.Table) -> pa.Table:
        grid = np.zeros(tilesize * tilesize, dtype=np.uint32)
        np.add.at(grid, np.asarray(g.column("pidx"), dtype=np.int64), 1)
        return pa.table(
            {
                "zoom": pa.array([zoom], pa.int64()),
                "x": pa.array([g.column("x")[0].as_py()], pa.int64()),
                "y": pa.array([g.column("y")[0].as_py()], pa.int64()),
                "pixels": pa.array([grid.tobytes()], pa.binary()),
            }
        )

    return (
        pos.map_batches(assign, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(build, batch_format="pyarrow")
    )


def point_density_blocks_multi(
    pos: ray.data.Dataset,
    *,
    zooms: list[int],
    tilesize: int = 256,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """All-zooms variant of ``point_density_blocks``: assigns every
    point to its tile/pixel at EVERY requested zoom inside one
    map_batches (len(zooms)× narrow rows) and runs ONE
    groupby((zoom, x, y)) for the whole pyramid — one exchange instead
    of one per zoom, so the per-job fixed cost doesn't multiply with
    pyramid depth.  Output schema matches ``point_density_blocks``."""
    zs = [int(z) for z in zooms]

    def assign(batch: pa.Table) -> pa.Table:
        parts_z, parts_x, parts_y, parts_i = [], [], [], []
        for z in zs:
            tx, ty, idx = _density_assign(
                batch, zoom=z, tilesize=tilesize, mx_col=mx_col, my_col=my_col
            )
            parts_z.append(np.full(len(tx), z, dtype=np.int64))
            parts_x.append(tx)
            parts_y.append(ty)
            parts_i.append(idx)
        return pa.table(
            {
                "zoom": pa.array(np.concatenate(parts_z)),
                "x": pa.array(np.concatenate(parts_x)),
                "y": pa.array(np.concatenate(parts_y)),
                "pidx": pa.array(np.concatenate(parts_i)),
            }
        )

    def build(g: pa.Table) -> pa.Table:
        grid = np.zeros(tilesize * tilesize, dtype=np.uint32)
        np.add.at(grid, np.asarray(g.column("pidx"), dtype=np.int64), 1)
        return pa.table(
            {
                "zoom": pa.array([g.column("zoom")[0].as_py()], pa.int64()),
                "x": pa.array([g.column("x")[0].as_py()], pa.int64()),
                "y": pa.array([g.column("y")[0].as_py()], pa.int64()),
                "pixels": pa.array([grid.tobytes()], pa.binary()),
            }
        )

    return (
        pos.map_batches(assign, batch_format="pyarrow")
        .groupby(["zoom", "x", "y"])
        .map_groups(build, batch_format="pyarrow")
    )


# --------------------------------------------------------------------
# Hexagonal (H3-style) cell index operators — geo/hexcell.py kernels
# --------------------------------------------------------------------


def hex_density(
    pos: ray.data.Dataset,
    *,
    res: int,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Point density per hexagonal cell at ``res``: (hex_q, hex_r,
    hex_id, n_docs).  Map-side partial counts (np.unique per batch over
    the packed id) before the one narrow groupby — the hex analog of
    ``tile_assignment_counts``; point payloads never shuffle."""
    from ..geo.hexcell import hex_assign, hex_id, hex_unpack

    def partial(batch: pa.Table) -> pa.Table:
        q, r = hex_assign(
            batch.column(mx_col).to_numpy(), batch.column(my_col).to_numpy(), res
        )
        hid = hex_id(np.full(len(q), res, dtype=np.int64), q, r)
        uniq, counts = np.unique(hid, return_counts=True)
        _, uq, ur = hex_unpack(uniq)
        return pa.table(
            {
                "hex_q": pa.array(uq),
                "hex_r": pa.array(ur),
                "hex_id": pa.array(uniq),
                "n_docs": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        pos.map_batches(partial, batch_format="pyarrow")
        .groupby(["hex_q", "hex_r", "hex_id"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def hex_hotspot_neighbors(
    pos: ray.data.Dataset,
    *,
    res: int,
    min_docs: int,
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """For every hex cell with ≥ ``min_docs`` points, the total point
    count over its 6 adjacent cells — the k-ring proximity primitive
    the hex index supports instead of parent containment (hex grids do
    not nest; see geo/hexcell.py).

    Plan: density (one narrow groupby) → hot cells expand to 6 probe
    rows (map-only, exact neighbor arithmetic) → shuffle hash join with
    the density table on the packed neighbor id → groupby(hot cell)
    sum.  Probe volume is 6×|hot|; density rows are narrow — at corpus
    scale this is two narrow exchanges, never a point shuffle.
    """
    from ..geo.hexcell import NEIGHBOR_OFFSETS, hex_id
    from .relational import shuffle_hash_join

    dens = hex_density(pos, res=res, mx_col=mx_col, my_col=my_col).materialize()

    def probes(batch: pa.Table) -> pa.Table:
        mask = pa.compute.greater_equal(batch.column("n_docs"), pa.scalar(min_docs))
        t = batch.filter(mask)
        q = t.column("hex_q").to_numpy()
        r = t.column("hex_r").to_numpy()
        n = t.column("n_docs").to_numpy()
        nq = (q[:, None] + NEIGHBOR_OFFSETS[:, 0][None, :]).ravel()
        nr = (r[:, None] + NEIGHBOR_OFFSETS[:, 1][None, :]).ravel()
        k = len(q)
        return pa.table(
            {
                "hex_q": pa.array(np.repeat(q, 6)),
                "hex_r": pa.array(np.repeat(r, 6)),
                "n_docs": pa.array(np.repeat(n, 6)),
                "nbr_id": pa.array(hex_id(np.full(6 * k, res, dtype=np.int64), nq, nr)),
            }
        )

    probe_ds = dens.map_batches(probes, batch_format="pyarrow")
    dens_narrow = dens.select_columns(["hex_id", "n_docs"]).rename_columns(
        ["nbr_id", "nbr_docs"]
    )
    joined = shuffle_hash_join(
        probe_ds, dens_narrow, on="nbr_id", join_type="left_outer"
    )

    def partial_sum(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df["nbr_docs"] = df["nbr_docs"].fillna(0).astype(np.int64)
        g = (
            df.groupby(["hex_q", "hex_r", "n_docs"], sort=False)["nbr_docs"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial_sum, batch_format="pyarrow")
        .groupby(["hex_q", "hex_r", "n_docs"])
        .aggregate(Sum("nbr_docs", alias_name="neighbor_docs"))
    )
    return out


def geohash_density(
    pos: ray.data.Dataset,
    *,
    precision: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> ray.data.Dataset:
    """Point density per geohash cell: (geohash, n_docs).  Geohash
    prefixes nest, so coarser rollups are a prefix groupby of this
    output.  Map-side partial counts over the packed integer code (no
    string churn inside the exchange); strings materialize only on the
    aggregated cells."""
    from ..geo.geohash import BASE32, geohash_code

    p = int(precision)

    def partial(batch: pa.Table) -> pa.Table:
        code = geohash_code(
            batch.column(lon_col).to_numpy(), batch.column(lat_col).to_numpy(), p
        )
        uniq, counts = np.unique(code, return_counts=True)
        chars = np.empty((len(uniq), p), dtype=np.uint8)
        b32 = np.frombuffer(BASE32.encode(), dtype=np.uint8)
        for g in range(p):
            chars[:, g] = b32[(uniq >> np.int64(5 * (p - 1 - g))) & np.int64(31)]
        gh = chars.view(f"S{p}").ravel().astype(str)
        return pa.table(
            {"geohash": pa.array(gh), "n_docs": pa.array(counts.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        pos.map_batches(partial, batch_format="pyarrow")
        .groupby("geohash")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


# --------------------------------------------------------------------
# Distributed per-group convex hull (two-level partial hulls)
# --------------------------------------------------------------------


def _hull_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain: indices (into the input order) of the
    convex-hull vertices.  Strict turns — collinear interior-edge
    points are dropped (ties cannot occur on the random-double inputs
    this serves; the SQL halfplane oracle agrees whenever no three
    points are exactly collinear).  n ≤ 2 returns all points."""
    n = len(x)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]

    def chain(rng):
        out: list[int] = []
        for i in rng:
            while len(out) >= 2:
                ax, ay = xs[out[-2]], ys[out[-2]]
                bx, by = xs[out[-1]], ys[out[-1]]
                if (bx - ax) * (ys[i] - ay) - (by - ay) * (xs[i] - ax) <= 0.0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out[:-1]  # endpoint repeats in the other chain

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    return order[np.array(lower + upper, dtype=np.int64)]


def grouped_convex_hull(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Convex-hull VERTEX SET per group: rows ``(group, id)``.

    Two-level plan — the hull operator's distributive law
    (hull(A ∪ B) = hull(hull(A) ∪ hull(B))) makes partial hulls a
    combiner: each batch keeps only its per-group partial-hull points
    (map-side, drops interior points before any exchange), then one
    groupby merges the survivors and takes the final hull.  Per-group
    state after the combine is O(hull size) = O(√n expected for random
    points), so the final map_groups task stays bounded even when the
    group itself would not fit in one task."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, id_col, x_col, y_col]).to_pandas()
        keep = []
        for _, g in df.groupby(group_col, sort=False):
            idx = _hull_indices(g[x_col].to_numpy(), g[y_col].to_numpy())
            keep.append(g.iloc[idx])
        out = pd.concat(keep, ignore_index=True) if keep else df.iloc[:0]
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g: pa.Table) -> pa.Table:
        x = g.column(x_col).to_numpy()
        y = g.column(y_col).to_numpy()
        idx = _hull_indices(x, y)
        return pa.table(
            {
                group_col: pa.compute.take(g.column(group_col), pa.array(idx)),
                id_col: pa.compute.take(g.column(id_col), pa.array(idx)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def hex_dwell_runs(
    ev: ray.data.Dataset,
    *,
    res: int,
    min_events: int = 2,
    min_seconds: float = 0.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Dwell (stay-point) extraction on the hex grid: per user, maximal
    runs of CONSECUTIVE events (time order, ``order_col`` tie-break)
    that fall in the same hex cell at ``res``; runs shorter than
    ``min_events`` events or ``min_seconds`` of elapsed time are
    dropped.  Output: (user, hex_q, hex_r, enter_ts, exit_ts,
    n_events).

    One groupby(user) exchange; run detection is vectorized
    gaps-and-islands inside the group (diff on the cell sequence →
    np.cumsum run ids → reduceat aggregates).  The SQL mirror is the
    classic lag()+sum() islands query.
    """
    from ..geo.hexcell import hex_assign

    def assign(batch: pa.Table) -> pa.Table:
        q, r = hex_assign(
            batch.column(mx_col).to_numpy(), batch.column(my_col).to_numpy(), res
        )
        return pa.table(
            {
                user_col: batch.column(user_col),
                ts_col: batch.column(ts_col),
                order_col: batch.column(order_col),
                "hex_q": pa.array(q),
                "hex_r": pa.array(r),
            }
        )

    def runs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([ts_col, order_col], kind="mergesort")
        q = df["hex_q"].to_numpy()
        r = df["hex_r"].to_numpy()
        ts = df[ts_col].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (q[1:] != q[:-1]) | (r[1:] != r[:-1])
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(df)] - 1
        n = ends - starts + 1
        enter = ts[starts]
        exit_ = ts[ends]
        dur_s = (exit_ - enter) / np.timedelta64(1, "s")
        keep = (n >= min_events) & (dur_s >= min_seconds)
        return pa.table(
            {
                user_col: pa.array(df[user_col].to_numpy()[starts][keep]),
                "hex_q": pa.array(q[starts][keep]),
                "hex_r": pa.array(r[starts][keep]),
                "enter_ts": pa.array(enter[keep]),
                "exit_ts": pa.array(exit_[keep]),
                "n_events": pa.array(n[keep].astype(np.int64)),
            }
        )

    return (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(runs, batch_format="pyarrow")
    )


# --------------------------------------------------------------------
# Grouped rectangle union area (strip-partitioned, exact on integers)
# --------------------------------------------------------------------


def _union_area_block(x0, y0, x1, y1) -> int:
    """Exact union area of integer rectangles (half-open [x0,x1)×[y0,y1))
    by coordinate compression + a 2-D difference array: mark each rect's
    four corners ±1 in compressed space, 2-D prefix-sum, a cell is
    covered iff its count > 0.  Fully vectorized; O(n²) compressed cells
    for n rects — the per-task budget the strip clipping bounds."""
    xs = np.unique(np.concatenate([x0, x1]))
    ys = np.unique(np.concatenate([y0, y1]))
    ix0 = np.searchsorted(xs, x0)
    ix1 = np.searchsorted(xs, x1)
    iy0 = np.searchsorted(ys, y0)
    iy1 = np.searchsorted(ys, y1)
    d = np.zeros((len(xs), len(ys)), dtype=np.int64)
    np.add.at(d, (ix0, iy0), 1)
    np.add.at(d, (ix1, iy0), -1)
    np.add.at(d, (ix0, iy1), -1)
    np.add.at(d, (ix1, iy1), 1)
    cover = d.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
    dx = np.diff(xs)
    dy = np.diff(ys)
    return int((cover * np.outer(dx, dy)).sum())


def grouped_union_area(
    rects: ray.data.Dataset,
    *,
    group_col: str,
    strip_width: int = 1 << 14,
    x0_col: str = "x0",
    y0_col: str = "y0",
    x1_col: str = "x1",
    y1_col: str = "y1",
) -> ray.data.Dataset:
    """Exact area of the union of integer rectangles per group:
    ``(group, union_area)``.

    Strip-partitioned plan: rectangles clip to fixed vertical strips of
    ``strip_width`` (map-only explode — areas partition exactly along
    strip boundaries, so per-strip union areas SUM to the group total),
    one groupby((group, strip)) computes each strip's exact union by
    compressed 2-D difference counting, then a narrow groupby(group)
    sums.  Per-task work is bounded by rects-per-strip, not group size —
    a continent-wide group still decomposes; hot strips are the skew
    knob (halve strip_width, same law).  Rect coords are half-open
    integer intervals; degenerate (empty) rects contribute 0.
    """

    def explode(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        x0 = batch.column(x0_col).to_numpy().astype(np.int64)
        y0 = batch.column(y0_col).to_numpy().astype(np.int64)
        x1 = batch.column(x1_col).to_numpy().astype(np.int64)
        y1 = batch.column(y1_col).to_numpy().astype(np.int64)
        ok = (x1 > x0) & (y1 > y0)
        g, x0, y0, x1, y1 = g[ok], x0[ok], y0[ok], x1[ok], y1[ok]
        s0 = np.floor_divide(x0, strip_width)
        s1 = np.floor_divide(x1 - 1, strip_width)  # inclusive last strip
        reps = (s1 - s0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(g)), reps)
        # strip index per exploded row
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        strip = s0[idx] + (np.arange(len(idx)) - offs[idx])
        cx0 = np.maximum(x0[idx], strip * strip_width)
        cx1 = np.minimum(x1[idx], (strip + 1) * strip_width)
        return pa.table(
            {
                group_col: pa.array(g[idx]),
                "strip": pa.array(strip),
                "x0": pa.array(cx0),
                "y0": pa.array(y0[idx]),
                "x1": pa.array(cx1),
                "y1": pa.array(y1[idx]),
            }
        )

    def strip_area(t: pa.Table) -> pa.Table:
        area = _union_area_block(
            t.column("x0").to_numpy(),
            t.column("y0").to_numpy(),
            t.column("x1").to_numpy(),
            t.column("y1").to_numpy(),
        )
        return pa.table(
            {
                group_col: pa.array([t.column(group_col)[0].as_py()]),
                "union_area": pa.array([area], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        rects.map_batches(explode, batch_format="pyarrow")
        .groupby([group_col, "strip"])
        .map_groups(strip_area, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("union_area", alias_name="union_area"))
    )


def trajectory_legs(
    ev: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> ray.data.Dataset:
    """Per-user trajectory legs: for every CONSECUTIVE event pair
    (time order, ``order_col`` tie-break) the true spherical distance
    (haversine, R=6371000, floored integer metres) and initial
    great-circle bearing (degrees in [0, 360), e4-quantized).  One
    groupby(user) exchange; leg math is vectorized in-group (shifted
    arrays, no row loop).  Leg identity = the DESTINATION event."""

    def legs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([ts_col, order_col], kind="mergesort")
        if len(df) < 2:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    order_col: pa.array([], pa.int64()),
                    "dist_m": pa.array([], pa.int64()),
                    "bearing_e4": pa.array([], pa.int64()),
                }
            )
        rlon = np.radians(df[lon_col].to_numpy())
        rlat = np.radians(df[lat_col].to_numpy())
        r1lon, r2lon = rlon[:-1], rlon[1:]
        r1lat, r2lat = rlat[:-1], rlat[1:]
        dlat2 = (r2lat - r1lat) / 2.0
        dlon2 = (r2lon - r1lon) / 2.0
        hav = (
            np.sin(dlat2) * np.sin(dlat2)
            + np.cos(r1lat) * np.cos(r2lat) * (np.sin(dlon2) * np.sin(dlon2))
        )
        dist = 2.0 * 6371000.0 * np.arcsin(np.sqrt(hav))
        dlon = r2lon - r1lon
        yb = np.sin(dlon) * np.cos(r2lat)
        xb = np.cos(r1lat) * np.sin(r2lat) - np.sin(r1lat) * np.cos(r2lat) * np.cos(dlon)
        theta = np.degrees(np.arctan2(yb, xb))
        bearing = np.mod(theta + 360.0, 360.0)
        return pa.table(
            {
                user_col: pa.array(df[user_col].to_numpy()[1:]),
                order_col: pa.array(df[order_col].to_numpy()[1:]),
                "dist_m": pa.array(np.floor(dist).astype(np.int64)),
                "bearing_e4": pa.array(
                    np.floor(bearing * 1e4 + 0.5).astype(np.int64)
                ),
            }
        )

    return ev.groupby(user_col).map_groups(legs, batch_format="pyarrow")


def hex_od_matrix(
    ev: ray.data.Dataset,
    *,
    res: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    mx_col: str = "mx",
    my_col: str = "my",
) -> ray.data.Dataset:
    """Origin→destination flow matrix on the hex grid: per user,
    consecutive-event cell transitions (time order, ``order_col``
    tie-break), same-cell hops excluded (those are dwells), counted per
    (from, to) cell pair — the classic mobility-analytics aggregate.

    Two narrow exchanges: groupby(user) for the in-group lag, then a
    map-side-combined groupby((from,to)) count; positions never
    shuffle twice."""
    from ..geo.hexcell import hex_assign

    def assign(batch: pa.Table) -> pa.Table:
        q, r = hex_assign(
            batch.column(mx_col).to_numpy(), batch.column(my_col).to_numpy(), res
        )
        return pa.table(
            {
                user_col: batch.column(user_col),
                ts_col: batch.column(ts_col),
                order_col: batch.column(order_col),
                "hq": pa.array(q),
                "hr": pa.array(r),
            }
        )

    def hops(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([ts_col, order_col], kind="mergesort")
        q = df["hq"].to_numpy()
        r = df["hr"].to_numpy()
        move = (q[1:] != q[:-1]) | (r[1:] != r[:-1])
        return pa.table(
            {
                "from_q": pa.array(q[:-1][move]),
                "from_r": pa.array(r[:-1][move]),
                "to_q": pa.array(q[1:][move]),
                "to_r": pa.array(r[1:][move]),
            }
        )

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        gcounts = (
            df.groupby(["from_q", "from_r", "to_q", "to_r"], sort=False)
            .size()
            .rename("n_trips")
            .reset_index()
        )
        return pa.Table.from_pandas(gcounts, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(hops, batch_format="pyarrow")
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["from_q", "from_r", "to_q", "to_r"])
        .aggregate(Sum("n_trips", alias_name="n_trips"))
    )
