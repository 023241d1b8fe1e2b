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
    extent: int = MVT_EXTENT, attrs: "dict[str, np.ndarray] | None" = None,
) -> bytes:
    """One MVT layer of POINT features.  ``ids/px/py`` are parallel
    arrays (already sorted by id for deterministic bytes); coords are
    tile-local in [0, extent).  Feature framing is built with
    vectorized varints: all per-feature segments are computed as
    arrays, then concatenated once.

    ``attrs`` adds per-feature attributes the MVT way: layer-level
    ``keys`` (field 3) and deduplicated ``values`` (field 4, int64
    values; first-occurrence order for deterministic bytes), each
    feature carrying packed (key-index, value-index) tag pairs
    (feature field 2)."""
    n = len(ids)
    ids = np.asarray(ids, dtype=np.uint64)
    # geometry: MoveTo count=1 (command 9), zigzag(px), zigzag(py)
    zx, zy = zigzag(px), zigzag(py)
    # attribute tables: values deduped per key, first-occurrence order
    key_blocks = b""
    val_blocks = b""
    tag_arr = None
    if attrs:
        names = list(attrs.keys())
        tag_cols = []
        n_vals = 0
        for ki, aname in enumerate(names):
            key_blocks += _len_delimited(3, aname.encode())
            raw = np.asarray(attrs[aname])
            is_str = raw.dtype.kind in ("U", "S", "O")
            vals = raw if is_str else raw.astype(np.int64)
            # first-occurrence order of unique values
            first_idx = np.sort(np.unique(vals, return_index=True)[1])
            uniq_first = vals[first_idx]
            remap = {v: j for j, v in enumerate(uniq_first.tolist())}
            inv_first = np.array(
                [remap[v] for v in vals.tolist()], dtype=np.uint64
            )
            for v in uniq_first.tolist():
                # Value message: string_value (field 1) for strings,
                # int_value (field 4, varint) for v >= 0, sint_value
                # (field 6, zigzag) otherwise
                if is_str:
                    val_blocks += _len_delimited(
                        4, _len_delimited(1, str(v).encode())
                    )
                elif v >= 0:
                    val_blocks += _len_delimited(
                        4, b"\x20" + varint_encode(np.array([v], dtype=np.uint64))
                    )
                else:
                    val_blocks += _len_delimited(
                        4, b"\x30" + varint_encode(zigzag(np.array([v])))
                    )
            tag_cols.append((ki, inv_first + n_vals))
            n_vals += len(uniq_first)
        tag_arr = np.empty((n, 2 * len(names)), dtype=np.uint64)
        for j, (ki, vidx) in enumerate(tag_cols):
            tag_arr[:, 2 * j] = ki
            tag_arr[:, 2 * j + 1] = vidx
    feats = []
    # per-feature bytes: small, but assembled from vectorized varint
    # streams sliced per feature (avoids a Python int-by-int encoder).
    id_b = varint_encode(ids)
    zx_b, zy_b = varint_encode(zx), varint_encode(zy)
    id_off = _varint_offsets(ids)
    zx_off, zy_off = _varint_offsets(zx), _varint_offsets(zy)
    for i in range(n):
        geom = b"\x09" + zx_b[zx_off[i]:zx_off[i + 1]] + zy_b[zy_off[i]:zy_off[i + 1]]
        tags = b""
        if tag_arr is not None:
            tags = _len_delimited(2, varint_encode(tag_arr[i]))
        body = (
            b"\x08" + id_b[id_off[i]:id_off[i + 1]]  # field 1: id
            + tags  # field 2: packed tag pairs
            + b"\x18\x01"  # field 3: type = POINT
            + _len_delimited(4, geom)  # field 4: packed geometry
        )
        feats.append(_len_delimited(2, body))
    layer = (
        b"\x78\x02"  # field 15: version = 2
        + _len_delimited(1, name.encode())
        + b"".join(feats)
        + key_blocks
        + val_blocks
        + _field(5, 0) + varint_encode(np.array([extent]))
    )
    return _len_delimited(3, layer)


MVT_LINESTRING = 2


def encode_line_layer(
    ids: np.ndarray,
    starts: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    *,
    name: str = "lines",
    extent: int = MVT_EXTENT,
) -> bytes:
    """One MVT layer of LINESTRING features.  ``px/py`` hold the
    concatenated vertex lists of all features; ``starts`` are the
    offsets (len = n_features + 1); ``ids`` one per feature (sorted for
    deterministic bytes).  Geometry per feature: MoveTo(1) to the first
    vertex then LineTo(k-1) with zigzag deltas — the spec's cursor
    encoding.  Coordinates may lie outside [0, extent) (buffer
    convention for features near tile edges)."""
    ids = np.asarray(ids, dtype=np.uint64)
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    n = len(ids)
    kk = starts[1:] - starts[:-1]
    if n and int(kk.min()) < 2:
        # MVT v2.1: a LINESTRING needs MoveTo + ≥1 LineTo; a bare MoveTo
        # is invalid geometry — reject rather than emit silently.
        raise ValueError(
            f"linestring feature with {int(kk.min())} vertex/vertices "
            "(every feature needs >= 2)"
        )
    has_line = kk > 1
    # Every byte of an MVT feature frame is itself a varint (the field
    # keys 0x12/0x08/0x18/0x22 are single-byte varints, the lengths and
    # the packed geometry are varints), so the WHOLE feature sequence
    # is one uint64 value stream per layer:
    #   [0x12, bodylen, 0x08, id, 0x18, 2, 0x22, geomlen,
    #    MoveTo(9), zx0, zy0, (LineTo, zx1, zy1, ...)?]  per feature
    # — assembled by vectorized scatter and varint-encoded in ONE pass:
    # zero per-feature Python.
    geom_vals = 3 + np.where(has_line, 1 + 2 * (kk - 1), 0)
    # geometry byte lengths: nbytes of each geometry value, cumsummed
    gv_starts = np.concatenate(([0], np.cumsum(geom_vals)))
    gstream = np.empty(gv_starts[-1], dtype=np.uint64)
    s0 = gv_starts[:-1]
    gstream[s0] = 9
    gstream[s0[has_line] + 3] = (2 | ((kk[has_line] - 1) << 3)).astype(np.uint64)
    d_px = np.diff(px, prepend=0)
    d_py = np.diff(py, prepend=0)
    d_px[starts[:-1]] = px[starts[:-1]]
    d_py[starts[:-1]] = py[starts[:-1]]
    feat_of = np.repeat(np.arange(n), kk)
    j = np.arange(len(px)) - starts[feat_of]
    tgt = np.where(j == 0, s0[feat_of] + 1, s0[feat_of] + 4 + 2 * (j - 1))
    gstream[tgt] = zigzag(d_px)
    gstream[tgt + 1] = zigzag(d_py)
    g_byte_off = _varint_offsets(gstream)
    geom_bytes = (g_byte_off[gv_starts[1:]] - g_byte_off[gv_starts[:-1]]).astype(np.uint64)

    def _nbytes(v: np.ndarray) -> np.ndarray:
        o = _varint_offsets(v)
        return (o[1:] - o[:-1]).astype(np.uint64)

    glen_nb = _nbytes(geom_bytes)
    body_len = 4 + _nbytes(ids) + glen_nb + geom_bytes  # 0x08,0x18,2,0x22
    vals2 = 8 + geom_vals
    f2 = np.concatenate(([0], np.cumsum(vals2)))
    stream2 = np.empty(f2[-1], dtype=np.uint64)
    h = f2[:-1]
    stream2[h] = 0x12
    stream2[h + 1] = body_len
    stream2[h + 2] = 0x08
    stream2[h + 3] = ids
    stream2[h + 4] = 0x18
    stream2[h + 5] = MVT_LINESTRING
    stream2[h + 6] = 0x22
    stream2[h + 7] = geom_bytes
    # geometry values relocate to h + 8 (+ their intra-feature offset)
    shift = (h + 8) - s0
    stream2[tgt + shift[feat_of]] = zigzag(d_px)
    stream2[tgt + 1 + shift[feat_of]] = zigzag(d_py)
    stream2[s0 + shift] = 9
    stream2[(s0 + 3 + shift)[has_line]] = (
        2 | ((kk[has_line] - 1) << 3)
    ).astype(np.uint64)
    feats_b = varint_encode(stream2)
    layer = (
        b"\x78\x02"
        + _len_delimited(1, name.encode())
        + feats_b
        + _field(5, 0) + varint_encode(np.array([extent]))
    )
    return _len_delimited(3, layer)


def decode_line_layer(tile: bytes) -> dict:
    """Minimal decoder for a LINESTRING layer: {name, extent, version,
    ids, lines:[[(x,y),...], ...]}."""
    def rd_varint(buf, i):
        shift = val = 0
        while True:
            b = buf[i]
            val |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return val, i
            shift += 7

    def unzig(v):
        return (v >> 1) ^ -(v & 1)

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
            else:  # pragma: no cover
                raise ValueError(f"wire {wire}")
            yield tag, val

    out = {"ids": [], "lines": [], "extent": MVT_EXTENT, "version": None, "name": None}
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
                fid, line = None, []
                for ftag, fval in fields(lval):
                    if ftag == 1:
                        fid = fval
                    elif ftag == 4:
                        i = cx = cy = 0
                        while i < len(fval):
                            cmd, i = rd_varint(fval, i)
                            cid, cnt = cmd & 7, cmd >> 3
                            for _ in range(cnt):
                                zx, i = rd_varint(fval, i)
                                zy, i = rd_varint(fval, i)
                                cx += unzig(zx)
                                cy += unzig(zy)
                                assert cid in (1, 2)
                                line.append((cx, cy))
                out["ids"].append(fid)
                out["lines"].append(line)
    return out


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
           "name": None, "keys": [], "values": [], "tags": []}
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
            elif ltag == 3:
                out["keys"].append(lval.decode())
            elif ltag == 4:
                for vtag, vval in fields(lval):
                    if vtag == 1:  # string_value
                        out["values"].append(vval.decode())
                    elif vtag == 4:  # int_value
                        out["values"].append(vval)
                    elif vtag == 6:  # sint_value (zigzag)
                        out["values"].append((vval >> 1) ^ -(vval & 1))
            elif ltag == 2:
                fid = gx = gy = None
                ftags: list[int] = []
                for ftag, fval in fields(lval):
                    if ftag == 1:
                        fid = fval
                    elif ftag == 2:  # packed tag pairs
                        i = 0
                        while i < len(fval):
                            t, i = rd_varint(fval, i)
                            ftags.append(t)
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
                out["tags"].append(ftags)
    # resolve tag pairs → per-feature attr dicts
    out["attrs"] = [
        {out["keys"][ft[j]]: out["values"][ft[j + 1]] for j in range(0, len(ft), 2)}
        for ft in out["tags"]
    ]
    return out


# --- tile assignment + pipeline -------------------------------------


def mvt_assign(
    batch: pa.Table, *, zoom: int, extent: int = MVT_EXTENT,
    mx_col: str = "mx", my_col: str = "my", id_col: str = "doc_id",
    attr_cols: "Sequence[str] | None" = None,
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
    out = {
        "x": pa.array(gx // extent),
        "y": pa.array(gy // extent),
        "fid": batch.column(id_col),
        "lx": pa.array(gx % extent),
        "ly": pa.array(gy % extent),
    }
    for c in attr_cols or ():
        out[c] = batch.column(c)
    return pa.table(out)


def _encode_group(zoom: int, extent: int, layer_name: str,
                  attr_cols: "Sequence[str] | None" = None):
    def build(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("fid"), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        def _col(c):
            arr = g.column(c).to_numpy(zero_copy_only=False)
            return (arr if arr.dtype.kind in ("U", "S", "O")
                    else arr.astype(np.int64))[order]

        attrs = {c: _col(c) for c in attr_cols or ()} or None
        blob = encode_point_layer(
            ids[order],
            np.asarray(g.column("lx"), dtype=np.int64)[order],
            np.asarray(g.column("ly"), dtype=np.int64)[order],
            name=layer_name,
            extent=extent,
            attrs=attrs,
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
    attr_cols: "Sequence[str] | None" = None,
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
                lambda b, z=z: mvt_assign(b, zoom=z, extent=extent, id_col=id_col,
                                          attr_cols=attr_cols),
                batch_format="pyarrow",
            )
            .groupby(["x", "y"])
            .map_groups(_encode_group(z, extent, layer_name, attr_cols),
                        batch_format="pyarrow")
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


def render_contour_mvt(
    segments: ray.data.Dataset,
    raster_transform,
    out_dir: str,
    *,
    zoom: int,
    extent: int = MVT_EXTENT,
    layer_name: str = "contours",
) -> Manifest:
    """Render marching-squares contour segments (contour.py output:
    e4-quantized global-PIXEL endpoints) as an MVT LINESTRING pyramid
    level in the standard tileset layout.

    Tile assignment is by segment MIDPOINT (computed in e4 integer
    space — no /2 — so the SQL mirror shares the exact float tree);
    endpoints keep their true positions in extent-local coordinates,
    which may fall slightly outside [0, extent) at tile edges — the MVT
    buffer convention, decoders clip.  Feature id packs (cell col, row,
    seg) so bytes are deterministic.  One narrow groupby exchange on
    the tile address; blobs are born in map_groups."""
    from ..geo.mercator import ORIGIN

    a, _, coff, _, e, foff = raster_transform
    n_px = float((1 << zoom) * extent)

    def assign(b: pa.Table) -> pa.Table:
        x0 = b.column("x0_e4").to_numpy().astype(np.float64)
        y0 = b.column("y0_e4").to_numpy().astype(np.float64)
        x1 = b.column("x1_e4").to_numpy().astype(np.float64)
        y1 = b.column("y1_e4").to_numpy().astype(np.float64)
        # mercator endpoints (pixel = e4 / 1e4)
        mx0 = x0 / 10000.0 * a + coff
        my0 = y0 / 10000.0 * e + foff
        mx1 = x1 / 10000.0 * a + coff
        my1 = y1 / 10000.0 * e + foff
        # midpoint in e4 integer space, then the same merc transform
        mmx = (x0 + x1) / 20000.0 * a + coff
        mmy = (y0 + y1) / 20000.0 * e + foff
        gx = np.clip(np.floor((mmx + ORIGIN) / (2.0 * ORIGIN) * n_px), 0, n_px - 1)
        gy = np.clip(np.floor((1.0 - (mmy + ORIGIN) / (2.0 * ORIGIN)) * n_px), 0, n_px - 1)
        tx = (gx // extent).astype(np.int64)
        ty = (gy // extent).astype(np.int64)

        def local(m, t, flip):
            g = (m + ORIGIN) / (2.0 * ORIGIN) * n_px if not flip else (
                1.0 - (m + ORIGIN) / (2.0 * ORIGIN)
            ) * n_px
            return np.floor(g).astype(np.int64) - t * extent

        c = b.column("c").to_numpy().astype(np.int64)
        r = b.column("r").to_numpy().astype(np.int64)
        seg = b.column("seg").to_numpy().astype(np.int64)
        # fid packs (cell-col, cell-row, segment) into one int64:
        # seg 2 bits, r 32 bits, c the remaining 29 — fail loudly past
        # the field widths instead of silently colliding feature ids.
        if len(r) and (int(r.max()) >= (1 << 32) or int(c.max()) >= (1 << 29)):
            raise ValueError(
                f"contour grid too large for fid packing "
                f"(r<{1 << 32}, c<{1 << 29}; got r<=%d c<=%d)"
                % (int(r.max()), int(c.max()))
            )
        fid = (c << np.int64(34)) | (r << np.int64(2)) | seg
        return pa.table(
            {
                "x": pa.array(tx),
                "y": pa.array(ty),
                "fid": pa.array(fid),
                "lx0": pa.array(local(mx0, tx, False)),
                "ly0": pa.array(local(my0, ty, True)),
                "lx1": pa.array(local(mx1, tx, False)),
                "ly1": pa.array(local(my1, ty, True)),
            }
        )

    def build(g: pa.Table) -> pa.Table:
        fid = np.asarray(g.column("fid"), dtype=np.int64)
        order = np.argsort(fid, kind="stable")
        n = len(fid)
        px = np.empty(2 * n, dtype=np.int64)
        py = np.empty(2 * n, dtype=np.int64)
        px[0::2] = np.asarray(g.column("lx0"), dtype=np.int64)[order]
        px[1::2] = np.asarray(g.column("lx1"), dtype=np.int64)[order]
        py[0::2] = np.asarray(g.column("ly0"), dtype=np.int64)[order]
        py[1::2] = np.asarray(g.column("ly1"), dtype=np.int64)[order]
        starts = np.arange(0, 2 * n + 1, 2)
        blob = encode_line_layer(
            fid[order], starts, px, py, name=layer_name, extent=extent
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

    from .heatmap import _dedupe_images

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    t0 = time.perf_counter()
    tiles = (
        segments.map_batches(assign, batch_format="pyarrow")
        .groupby(["x", "y"])
        .map_groups(build, batch_format="pyarrow")
    )
    tiles.write_parquet(
        os.path.join(out_dir, "tiles"), partition_cols=["part"],
        min_rows_per_file=32768,
    )
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    manifest.set_meta(
        metadata={
            "name": layer_name, "type": "overlay", "format": "pbf",
            "version": "1.0.0", "minzoom": str(zoom), "maxzoom": str(zoom),
        },
        tilesize=extent, minzoom=zoom, maxzoom=zoom,
    )
    part_dir = os.path.join(out_dir, "tiles", f"part=g{zoom:02d}")
    rows = (
        pads.dataset(part_dir, format="parquet").count_rows()
        if os.path.exists(part_dir) else 0
    )
    manifest.record_complete(
        f"tiles/g{zoom:02d}", rows=rows,
        wall_s=time.perf_counter() - t0, zooms=[zoom],
    )
    _dedupe_images(out_dir, manifest)
    return manifest


MVT_POLYGON = 3


def encode_polygon_box_layer(
    ids: np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    *,
    name: str = "boxes",
    extent: int = MVT_EXTENT,
    attrs: "dict[str, np.ndarray] | None" = None,
) -> bytes:
    """One MVT layer of axis-aligned rectangle POLYGON features
    (exterior rings only, CW in tile coords per spec v2.1 — positive
    shoelace area in the y-down screen space): MoveTo(x0,y0) +
    LineTo(3) around the ring + ClosePath.  Corners are inclusive
    integer tile-local coords; attrs use the same tags mechanism as
    ``encode_point_layer`` (shared key/value table builder)."""
    ids = np.asarray(ids, dtype=np.uint64)
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    n = len(ids)
    # ring: (x0,y0) → (x1,y0) → (x1,y1) → (x0,y1) → close  (CW in
    # y-down tile space ⇒ positive area per the MVT winding rule)
    w = x1 - x0
    h = y1 - y0
    feats = []
    id_b = varint_encode(ids)
    id_off = _varint_offsets(ids)
    # geometry value stream per feature (vectorized over features):
    # [9, zz(x0), zz(y0), 26, zz(w), 0, 0, zz(h), zz(-w), 0, 15]
    vals = np.empty((n, 11), dtype=np.uint64)
    vals[:, 0] = 9
    vals[:, 1] = zigzag(x0)
    vals[:, 2] = zigzag(y0)
    vals[:, 3] = (2 | (3 << 3))  # LineTo count 3
    vals[:, 4] = zigzag(w)
    vals[:, 5] = 0
    vals[:, 6] = 0
    vals[:, 7] = zigzag(h)
    vals[:, 8] = zigzag(-w)
    vals[:, 9] = 0
    vals[:, 10] = 15  # ClosePath count 1
    flat = vals.ravel()
    flat_b = varint_encode(flat)
    off = _varint_offsets(flat)
    g0 = off[np.arange(n) * 11]
    g1 = off[(np.arange(n) + 1) * 11]
    # reuse the tags builder from the point encoder by inlining the
    # same table construction
    key_blocks = b""
    val_blocks = b""
    tag_arr = None
    if attrs:
        names = list(attrs.keys())
        tag_cols = []
        n_vals = 0
        for ki, aname in enumerate(names):
            key_blocks += _len_delimited(3, aname.encode())
            avals = np.asarray(attrs[aname], dtype=np.int64)
            first_idx = np.sort(np.unique(avals, return_index=True)[1])
            uniq_first = avals[first_idx]
            remap = {int(v): j for j, v in enumerate(uniq_first)}
            inv_first = np.array([remap[int(v)] for v in avals], dtype=np.uint64)
            for v in uniq_first:
                if v >= 0:
                    val_blocks += _len_delimited(
                        4, b"\x20" + varint_encode(np.array([v], dtype=np.uint64))
                    )
                else:
                    val_blocks += _len_delimited(
                        4, b"\x30" + varint_encode(zigzag(np.array([v])))
                    )
            tag_cols.append((ki, inv_first + n_vals))
            n_vals += len(uniq_first)
        tag_arr = np.empty((n, 2 * len(names)), dtype=np.uint64)
        for j, (ki, vidx) in enumerate(tag_cols):
            tag_arr[:, 2 * j] = ki
            tag_arr[:, 2 * j + 1] = vidx
    for i in range(n):
        tags = b""
        if tag_arr is not None:
            tags = _len_delimited(2, varint_encode(tag_arr[i]))
        body = (
            b"\x08" + id_b[id_off[i]:id_off[i + 1]]
            + tags
            + b"\x18\x03"  # field 3: type = POLYGON
            + b"\x22" + varint_encode(np.array([g1[i] - g0[i]], dtype=np.uint64))
            + flat_b[g0[i]:g1[i]]
        )
        feats.append(_len_delimited(2, body))
    layer = (
        b"\x78\x02"
        + _len_delimited(1, name.encode())
        + b"".join(feats)
        + key_blocks
        + val_blocks
        + _field(5, 0) + varint_encode(np.array([extent]))
    )
    return _len_delimited(3, layer)


def decode_polygon_box_layer(tile: bytes) -> dict:
    """Decoder for the rectangle POLYGON layer: {name, ids, boxes:
    [(x0,y0,x1,y1)], attrs} — verifies the ring walk + ClosePath."""
    def rd_varint(buf, i):
        shift = val = 0
        while True:
            b = buf[i]
            val |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return val, i
            shift += 7

    def unzig(v):
        return (v >> 1) ^ -(v & 1)

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
            else:  # pragma: no cover
                raise ValueError(f"wire {wire}")
            yield tag, val

    out = {"ids": [], "boxes": [], "keys": [], "values": [], "tags": [],
           "name": None, "version": None}
    for tag, val in fields(tile):
        if tag != 3:
            continue
        for ltag, lval in fields(val):
            if ltag == 15:
                out["version"] = lval
            elif ltag == 1:
                out["name"] = lval.decode()
            elif ltag == 3:
                out["keys"].append(lval.decode())
            elif ltag == 4:
                for vtag, vval in fields(lval):
                    if vtag == 4:
                        out["values"].append(vval)
                    elif vtag == 6:
                        out["values"].append(unzig(vval))
            elif ltag == 2:
                fid, ring, ftags = None, [], []
                for ftag, fval in fields(lval):
                    if ftag == 1:
                        fid = fval
                    elif ftag == 2:
                        i = 0
                        while i < len(fval):
                            t, i = rd_varint(fval, i)
                            ftags.append(t)
                    elif ftag == 4:
                        i = cx = cy = 0
                        closed = False
                        while i < len(fval):
                            cmd, i = rd_varint(fval, i)
                            cid, cnt = cmd & 7, cmd >> 3
                            if cid == 7:
                                closed = True
                                continue
                            for _ in range(cnt):
                                zx, i = rd_varint(fval, i)
                                zy, i = rd_varint(fval, i)
                                cx += unzig(zx)
                                cy += unzig(zy)
                                ring.append((cx, cy))
                        assert closed, "polygon ring must ClosePath"
                xs = [p[0] for p in ring]
                ys = [p[1] for p in ring]
                out["ids"].append(fid)
                out["boxes"].append((min(xs), min(ys), max(xs), max(ys)))
                out["tags"].append(ftags)
    out["attrs"] = [
        {out["keys"][ft[j]]: out["values"][ft[j + 1]] for j in range(0, len(ft), 2)}
        for ft in out["tags"]
    ]
    return out
