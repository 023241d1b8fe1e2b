"""Mapbox Vector Tile (MVT) pyramid: point dataset → protobuf vector
tiles in the standard tileset layout.

The vector analogue of the raster renderer: instead of burning points
into PNG density grids (heatmap.py), each tile carries its features as
an MVT v2.1 protobuf blob (public spec,
github.com/mapbox/vector-tile-spec/tree/master/2.1) — one layer
("points", extent 4096 by default), one POINT feature per input row,
the row id preserved as the MVT feature id.  Tiles land in the same
layout the raster pipelines write (tiles/part=g{zz} parquet with
(zoom, x, y, tms_y, tile_hash, tile_data), images/ content-dedup,
manifest), so merge / diff / audit / export_mbtiles work on a vector
tileset unchanged (MBTiles stores MVT blobs exactly this way, format
"pbf").

Determinism contract: features are sorted by id within each tile and
the encoder is pure integer math, so tile bytes are reproducible
across runs and partitionings — the same golden-hash testability the
PNG renderer has (ref src/tiles.rs hash-dedup convention).

Scale contract: one narrow groupby exchange per zoom on the tile
address — rows carry (x, y, id, local-coord) only, never payloads;
encoding is map-only over groups; the images election is the
renderer's narrow-key winner pattern.  Local coordinates derive from
the SAME global-pixel floor math as the density rasterizer
(spatial._density_assign with tilesize→extent), so SQL oracles mirror
them exactly.
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
from ..state.manifest import Manifest

# --- protobuf primitives (vectorized) -------------------------------


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128 varint encoding of an array of non-negative ints, all
    values concatenated — vectorized: one numpy pass per byte position
    (≤10), no per-value Python loop."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + floor(bits/7)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    for k in range(int(nb.max())):
        sel = nb > k
        chunk = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[sel] - 1 > k).astype(np.uint8) << np.uint8(7)
        out[starts[sel] + k] = chunk | cont
    return out.tobytes()


def zigzag(vals: np.ndarray) -> np.ndarray:
    """Protobuf zigzag: signed → unsigned interleave (0,-1,1,-2 → 0,1,2,3)."""
    v = np.asarray(vals, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _field(tag: int, wire: int) -> bytes:
    return varint_encode(np.array([(tag << 3) | wire]))


def _len_delimited(tag: int, payload: bytes) -> bytes:
    return _field(tag, 2) + varint_encode(np.array([len(payload)])) + payload


# --- MVT tile assembly ----------------------------------------------

MVT_POINT = 1
MVT_EXTENT = 4096


def encode_point_layer(
    ids: np.ndarray, px: np.ndarray, py: np.ndarray, *, name: str = "points",
    extent: int = MVT_EXTENT,
) -> bytes:
    """One MVT layer of POINT features.  ``ids/px/py`` are parallel
    arrays (already sorted by id for deterministic bytes); coords are
    tile-local in [0, extent).  Feature framing is built with
    vectorized varints: all per-feature segments are computed as
    arrays, then concatenated once."""
    n = len(ids)
    ids = np.asarray(ids, dtype=np.uint64)
    # geometry: MoveTo count=1 (command 9), zigzag(px), zigzag(py)
    zx, zy = zigzag(px), zigzag(py)
    feats = []
    # per-feature bytes: small, but assembled from vectorized varint
    # streams sliced per feature (avoids a Python int-by-int encoder).
    id_b = varint_encode(ids)
    zx_b, zy_b = varint_encode(zx), varint_encode(zy)
    id_off = _varint_offsets(ids)
    zx_off, zy_off = _varint_offsets(zx), _varint_offsets(zy)
    for i in range(n):
        geom = b"\x09" + zx_b[zx_off[i]:zx_off[i + 1]] + zy_b[zy_off[i]:zy_off[i + 1]]
        body = (
            b"\x08" + id_b[id_off[i]:id_off[i + 1]]  # field 1: id
            + b"\x18\x01"  # field 3: type = POINT
            + _len_delimited(4, geom)  # field 4: packed geometry
        )
        feats.append(_len_delimited(2, body))
    layer = (
        b"\x78\x02"  # field 15: version = 2
        + _len_delimited(1, name.encode())
        + b"".join(feats)
        + _field(5, 0) + varint_encode(np.array([extent]))
    )
    return _len_delimited(3, layer)


def _varint_offsets(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return np.concatenate(([0], np.cumsum(nb)))


def decode_point_layer(tile: bytes) -> dict:
    """Minimal MVT decoder (test/verification side): parses one
    point layer back to {name, extent, version, ids, px, py}."""
    def rd_varint(buf, i):
        shift = val = 0
        while True:
            b = buf[i]
            val |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return val, i
            shift += 7

    def fields(buf):
        i = 0
        while i < len(buf):
            key, i = rd_varint(buf, i)
            tag, wire = key >> 3, key & 7
            if wire == 0:
                val, i = rd_varint(buf, i)
            elif wire == 2:
                ln, i = rd_varint(buf, i)
                val = buf[i:i + ln]
                i += ln
            else:  # pragma: no cover - not produced by the encoder
                raise ValueError(f"wire {wire}")
            yield tag, val

    out = {"ids": [], "px": [], "py": [], "extent": MVT_EXTENT, "version": None,
           "name": None}
    for tag, val in fields(tile):
        if tag != 3:
            continue
        for ltag, lval in fields(val):
            if ltag == 15:
                out["version"] = lval
            elif ltag == 1:
                out["name"] = lval.decode()
            elif ltag == 5:
                out["extent"] = lval
            elif ltag == 2:
                fid = gx = gy = None
                for ftag, fval in fields(lval):
                    if ftag == 1:
                        fid = fval
                    elif ftag == 4:
                        i = 0
                        cmd, i = rd_varint(fval, i)
                        assert cmd == 9, "single MoveTo expected"
                        zx, i = rd_varint(fval, i)
                        zy, i = rd_varint(fval, i)
                        gx = (zx >> 1) ^ -(zx & 1)
                        gy = (zy >> 1) ^ -(zy & 1)
                out["ids"].append(fid)
                out["px"].append(gx)
                out["py"].append(gy)
    return out


# --- tile assignment + pipeline -------------------------------------


def mvt_assign(
    batch: pa.Table, *, zoom: int, extent: int = MVT_EXTENT,
    mx_col: str = "mx", my_col: str = "my", id_col: str = "doc_id",
) -> pa.Table:
    """Per point: (x, y, fid, lx, ly) — tile address + extent-local
    coords at ``zoom``; the density rasterizer's global-pixel floor
    math with tilesize→extent (spatial._density_assign), so the SQL
    mirror is the same expression tree."""
    from ..geo.mercator import ORIGIN

    n_px = (1 << zoom) * extent
    mx = batch.column(mx_col).to_numpy()
    my = batch.column(my_col).to_numpy()
    gx = np.clip(np.floor((mx + ORIGIN) / (2.0 * ORIGIN) * n_px), 0, n_px - 1).astype(np.int64)
    gy = np.clip(
        np.floor((1.0 - (my + ORIGIN) / (2.0 * ORIGIN)) * n_px), 0, n_px - 1
    ).astype(np.int64)
    return pa.table(
        {
            "x": pa.array(gx // extent),
            "y": pa.array(gy // extent),
            "fid": batch.column(id_col),
            "lx": pa.array(gx % extent),
            "ly": pa.array(gy % extent),
        }
    )


def _encode_group(zoom: int, extent: int, layer_name: str):
    def build(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("fid"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        blob = encode_point_layer(
            ids[order],
            np.asarray(g.column("lx"), dtype=np.int64)[order],
            np.asarray(g.column("ly"), dtype=np.int64)[order],
            name=layer_name,
            extent=extent,
        )
        x = int(g.column("x")[0].as_py())
        y = int(g.column("y")[0].as_py())
        return pa.table(
            {
                "zoom": pa.array([zoom], pa.uint8()),
                "x": pa.array([x], pa.uint32()),
                "y": pa.array([y], pa.uint32()),
                "tms_y": pa.array([(1 << zoom) - 1 - y], pa.uint32()),
                "tile_hash": pa.array([content_hash64(blob)], pa.int64()),
                "tile_data": pa.array([blob], pa.binary()),
                "part": pa.array([f"g{zoom:02d}"], pa.string()),
            }
        )

    return build


def render_vector_tileset(
    pos: ray.data.Dataset,
    out_dir: str,
    zooms: list[int],
    *,
    extent: int = MVT_EXTENT,
    layer_name: str = "points",
    id_col: str = "doc_id",
) -> Manifest:
    """Render an MVT point pyramid into the standard tileset layout.
    Sparse-pyramid convention: only tiles containing ≥1 feature are
    written.  Narrow rows only cross the per-zoom groupby (ids +
    local coords, no payloads); blobs are born inside map_groups and
    go straight to partitioned parquet."""
    from .heatmap import _dedupe_images

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    t0 = time.perf_counter()

    pos = pos.materialize()  # consumed once per zoom
    for z in zooms:
        tiles = (
            pos.map_batches(
                lambda b, z=z: mvt_assign(b, zoom=z, extent=extent, id_col=id_col),
                batch_format="pyarrow",
            )
            .groupby(["x", "y"])
            .map_groups(_encode_group(z, extent, layer_name), batch_format="pyarrow")
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
            "name": layer_name,
            "type": "overlay",
            "format": "pbf",
            "version": "1.0.0",
            "minzoom": str(min(zooms)),
            "maxzoom": str(max(zooms)),
        },
        tilesize=extent,
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
