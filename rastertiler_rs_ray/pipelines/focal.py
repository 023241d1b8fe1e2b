"""Focal (neighborhood / stencil) raster statistics.

The reference family's raster ops are all *point* ops — ``read_tile``
(/root/reference/src/dataset.rs:121-196) samples each destination pixel
from exactly one source pixel.  Focal ops (GDAL's ``gdaldem``
slope/hillshade family, focal mean/min/max) need each pixel's 3x3
neighborhood, which crosses tile-block boundaries — the one raster
access pattern a blockwise-distributed engine cannot serve with
independent per-block reads.

Two physical plans, same semantics:

``focal_stats_windowed``
    When the source supports windowed reads (a GeoTIFF, the synthetic
    closed-form raster), each task reads its chunk window PLUS a
    1-pixel halo directly — overlap reads, ZERO shuffle.  This is the
    100-TB scale path for file-backed rasters.

``focal_stats_exchange``
    When pixels only exist as a distributed dataset of blocks (a
    *computed* raster living in the object store — the output of a
    previous map stage), neighbors must be exchanged.  Each block emits
    its core plus eight O(perimeter) halo strips keyed by the receiving
    block; ONE hash exchange co-locates them; ``map_groups`` assembles
    the padded array and runs the vectorized stencil.  Exchange volume
    is input + ~(4*chunk+4)/chunk^2 overhead (<4% at chunk=128) — the
    standard distributed-stencil halo pattern.

Semantics (both plans, mirrored term-for-term by the SQL oracle):
for every center pixel inside the block set, the 3x3 window collects
the valid (non-nodata, present-in-block-set) neighbors; pixels outside
the block set are nodata.  Output per center with >=1 valid neighbor:
count, sum, min, max, and mean quantized e4 with the repo's
floor(x*1e4+0.5) convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data



def _ids_task_stage(ids, fn_instance):
    """from_items + plain-TASK map_batches at ~2 blocks/CPU.

    These readers' only state is ``SyntheticRaster.from_spec`` over a
    tiny dict, so an actor pool pays process spin-up for zero per-batch
    benefit (the ``raster_blocks_dataset`` lesson); passing a callable
    INSTANCE makes Ray schedule plain tasks.  The ``concurrency``
    parameters on the public functions are retained for API
    compatibility but unused."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb = max(1, min(len(ids), cpus * 2))
    return ray.data.from_items(ids, override_num_blocks=nb).map_batches(
        fn_instance, batch_format="pyarrow"
    )

def raster_blocks_dataset(
    raster_spec: dict,
    bx0: int,
    by0: int,
    bx1: int,
    by1: int,
    *,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Materialize a rectangular range of raster blocks as a Dataset of
    (bx, by, pixels) rows — the "computed raster" input shape for
    ``focal_stats_exchange``.  Block coords are global pixel // chunk;
    the range is half-open.  Enumeration is a tiny driver-side table
    (one row per block id); pixel reads happen in a stateful sampler
    pool, one bounded chunk^2 window per row.
    """
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(by0, by1)
        for bx in range(bx0, bx1)
    ]

    # Plain-function stage, NOT an actor pool: SyntheticRaster.from_spec
    # is a constructor over a tiny dict (no file handles, no cache to
    # warm), so per-batch reconstruction costs ~µs while an actor pool
    # pays ~0.5-1 s of process spin-up per run (the knn_join lesson).
    # A raster source with real per-actor state (mmap, chunk cache)
    # should go through the render pipeline's TileRenderer pool instead.
    def read_blocks(b: pa.Table) -> pa.Table:
        r = SyntheticRaster.from_spec(raster_spec)
        bxs = b.column("bx").to_numpy(zero_copy_only=False)
        bys = b.column("by").to_numpy(zero_copy_only=False)
        bufs = []
        for bx, by in zip(bxs, bys):
            cols = np.arange(bx * chunk, (bx + 1) * chunk, dtype=np.int64)[None, :]
            rows = np.arange(by * chunk, (by + 1) * chunk, dtype=np.int64)[:, None]
            bufs.append(r.values_at(cols, rows).astype(np.uint8).tobytes())
        return pa.table(
            {
                "bx": pa.array(bxs, pa.int32()),
                "by": pa.array(bys, pa.int32()),
                "pixels": pa.array(bufs, pa.binary()),
            }
        )

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb = max(1, min(len(ids), cpus * 2))
    return ray.data.from_items(ids, override_num_blocks=nb).map_batches(
        read_blocks, batch_format="pyarrow"
    )


def _stencil_stats(
    padded: np.ndarray, valid: np.ndarray, chunk: int
) -> tuple[np.ndarray, ...]:
    """Vectorized 3x3 window stats over a (chunk+2)^2 padded array.
    Returns (n, sum, min, max) as (chunk, chunk) arrays; windows with
    n == 0 carry garbage in min/max — callers mask on n > 0."""
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(padded.astype(np.int64), (3, 3))
    vw = sliding_window_view(valid, (3, 3))
    n = vw.sum(axis=(2, 3)).astype(np.int64)
    s = np.where(vw, w, 0).sum(axis=(2, 3))
    mn = np.where(vw, w, np.int64(2**62)).min(axis=(2, 3))
    mx = np.where(vw, w, np.int64(-(2**62))).max(axis=(2, 3))
    return n, s, mn, mx


def _emit_stats(
    bx: int, by: int, chunk: int, n, s, mn, mx
) -> pa.Table:
    keep = n > 0
    rr, cc = np.nonzero(keep)
    nz = n[keep].astype(np.float64)
    mean_e4 = np.floor(s[keep] / nz * 1e4 + 0.5).astype(np.int64)
    return pa.table(
        {
            "gcol": pa.array(bx * chunk + cc, pa.int64()),
            "grow": pa.array(by * chunk + rr, pa.int64()),
            "n": pa.array(n[keep], pa.int64()),
            "sum_val": pa.array(s[keep], pa.int64()),
            "min_val": pa.array(mn[keep], pa.int64()),
            "max_val": pa.array(mx[keep], pa.int64()),
            "mean_e4": pa.array(mean_e4),
        }
    )


_OUT_SCHEMA = pa.schema(
    [
        ("gcol", pa.int64()),
        ("grow", pa.int64()),
        ("n", pa.int64()),
        ("sum_val", pa.int64()),
        ("min_val", pa.int64()),
        ("max_val", pa.int64()),
        ("mean_e4", pa.int64()),
    ]
)


def focal_stats_exchange(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed 3x3 focal stats over a block dataset via halo
    exchange: each (bx, by, pixels:binary[chunk^2] u8) row emits its
    core plus eight boundary strips addressed to its neighbors
    (role = which slot of the receiver's padded array the piece fills);
    ONE groupby exchange on the receiver's block key co-locates them;
    the per-group assembler pads absent neighbors with nodata and runs
    the strided-window stencil.

    Scale shape: halo strips are O(chunk) each, so the exchange moves
    ~1.04x the input once; group size is bounded (<=9 pieces, core +
    8 strips) so no group outgrows a task regardless of raster size.
    """

    def emit(b: pa.Table) -> pa.Table:
        t_bx, t_by, roles, datas = [], [], [], []
        bxs = b.column("bx").to_numpy(zero_copy_only=False)
        bys = b.column("by").to_numpy(zero_copy_only=False)
        pxs = b.column("pixels").to_pylist()
        # coarse per-block loop (blocks are few and big); strip slicing
        # inside is numpy
        for bx, by, buf in zip(bxs, bys, pxs):
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(chunk, chunk)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    # piece of THIS block that the neighbor at
                    # (bx+dx, by+dy) needs: the edge facing it
                    if dx == 0 and dy == 0:
                        piece = buf
                    else:
                        rs = slice(None) if dy == 0 else (
                            slice(-1, None) if dy == 1 else slice(0, 1)
                        )
                        cs = slice(None) if dx == 0 else (
                            slice(-1, None) if dx == 1 else slice(0, 1)
                        )
                        piece = np.ascontiguousarray(arr[rs, cs]).tobytes()
                    t_bx.append(bx + dx)
                    t_by.append(by + dy)
                    # role: where the piece sits relative to the RECEIVER
                    roles.append((1 - dy) * 3 + (1 - dx))
                    datas.append(piece)
        return pa.table(
            {
                "bkey": pa.array(
                    (np.asarray(t_bx, np.int64) << np.int64(32))
                    | (np.asarray(t_by, np.int64) & np.int64(0xFFFFFFFF)),
                    pa.int64(),
                ),
                "tbx": pa.array(t_bx, pa.int32()),
                "tby": pa.array(t_by, pa.int32()),
                "role": pa.array(roles, pa.int8()),
                "data": pa.array(datas, pa.binary()),
            }
        )

    def assemble(g: pa.Table) -> pa.Table:
        roles = g.column("role").to_numpy(zero_copy_only=False)
        if 4 not in roles:
            # receiver block not in the input set: strips addressed to
            # a block outside the region — no output
            return _OUT_SCHEMA.empty_table()
        bx = int(g.column("tbx")[0].as_py())
        by = int(g.column("tby")[0].as_py())
        padded = np.full((chunk + 2, chunk + 2), nodata, dtype=np.uint8)
        datas = g.column("data").to_pylist()
        for role, buf in zip(roles, datas):
            ry, rx = divmod(int(role), 3)  # 0/1/2 = top/mid/bottom etc.
            a = np.frombuffer(buf, dtype=np.uint8)
            rs = (slice(0, 1), slice(1, chunk + 1), slice(chunk + 1, chunk + 2))[ry]
            cs = (slice(0, 1), slice(1, chunk + 1), slice(chunk + 1, chunk + 2))[rx]
            h = rs.stop - rs.start
            w = cs.stop - cs.start
            padded[rs, cs] = a.reshape(h, w)
        valid = padded != nodata
        n, s, mn, mx = _stencil_stats(padded, valid, chunk)
        return _emit_stats(bx, by, chunk, n, s, mn, mx)

    exploded = blocks.map_batches(emit, batch_format="pyarrow")
    if num_partitions:
        exploded = exploded.repartition(num_partitions, keys=["bkey"])
    return exploded.groupby("bkey").map_groups(assemble, batch_format="pyarrow")


def focal_stats_windowed(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Zero-shuffle focal stats for windowed-readable sources: each
    task reads its chunk window PLUS the 1-pixel halo directly (overlap
    reads), so no exchange at all — the scale path when the raster is a
    file, not a dataset.  Pixels outside the region rectangle are
    nodata, matching ``focal_stats_exchange`` over the same block set.
    """
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]

    class _FocalReader:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            out = []
            bxs = b.column("bx").to_numpy(zero_copy_only=False)
            bys = b.column("by").to_numpy(zero_copy_only=False)
            for bx, by in zip(bxs, bys):
                cols = np.arange(bx * chunk - 1, (bx + 1) * chunk + 1, dtype=np.int64)
                rows = np.arange(by * chunk - 1, (by + 1) * chunk + 1, dtype=np.int64)
                padded = self.r.values_at(cols[None, :], rows[:, None]).astype(
                    np.uint8
                )
                inside = (
                    (cols[None, :] >= c0)
                    & (cols[None, :] < c1)
                    & (rows[:, None] >= r0)
                    & (rows[:, None] < r1)
                )
                valid = (padded != self.r.nodata) & inside
                n, s, mn, mx = _stencil_stats(padded, valid, chunk)
                n = np.where(inside[1:-1, 1:-1], n, 0)  # centers outside region
                out.append(_emit_stats(int(bx), int(by), chunk, n, s, mn, mx))
            return pa.concat_tables(out) if out else _OUT_SCHEMA.empty_table()

    return _ids_task_stage(ids, _FocalReader())


def hillshade_windowed(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    chunk: int = 128,
    cellsize: float = 10.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Horn (1981) hillshade — gdaldem's algorithm — over a pixel
    region via overlap reads (the zero-shuffle focal plan): per pixel
    the 3x3 Horn gradients
    dz/dx = ((c+2f+i) − (a+2d+g)) / (8·cell),
    dz/dy = ((g+2h+i) − (a+2b+c)) / (8·cell),
    then 255·(cos z·cos s + sin z·sin s·cos(az − aspect)), clamped at
    0, emitted only where ALL nine window pixels are valid and
    in-region (Horn's validity rule).  The weighted gradient
    numerators are exact integer sums, so the SQL oracle reproduces
    them bit-for-bit; the transcendental tail is shared-libm stable
    under the integer rounding.

    Output per pixel: (gcol, grow, hillshade 0..255).
    """
    from ..raster.synthetic import SyntheticRaster

    az = np.deg2rad(360.0 - azimuth_deg + 90.0)
    zen = np.deg2rad(90.0 - altitude_deg)
    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]
    out_schema = pa.schema(
        [("gcol", pa.int64()), ("grow", pa.int64()), ("hillshade", pa.int64())]
    )

    class _Shader:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            out = []
            bxs = b.column("bx").to_numpy(zero_copy_only=False)
            bys = b.column("by").to_numpy(zero_copy_only=False)
            for bx, by in zip(bxs, bys):
                cols = np.arange(bx * chunk - 1, (bx + 1) * chunk + 1, dtype=np.int64)
                rows = np.arange(by * chunk - 1, (by + 1) * chunk + 1, dtype=np.int64)
                v = self.r.values_at(cols[None, :], rows[:, None]).astype(np.int64)
                inside = (
                    (cols[None, :] >= c0)
                    & (cols[None, :] < c1)
                    & (rows[:, None] >= r0)
                    & (rows[:, None] < r1)
                )
                valid = (v != self.r.nodata) & inside
                # 3x3 neighbors: a b c / d e f / g h i (row-major)
                a = v[:-2, :-2]; bb = v[:-2, 1:-1]; c = v[:-2, 2:]
                d = v[1:-1, :-2]; f = v[1:-1, 2:]
                g = v[2:, :-2]; h = v[2:, 1:-1]; i = v[2:, 2:]
                from numpy.lib.stride_tricks import sliding_window_view

                all_ok = sliding_window_view(valid, (3, 3)).all(axis=(2, 3))
                # exact-integer gradient numerators
                nx = (c + 2 * f + i) - (a + 2 * d + g)
                ny = (g + 2 * h + i) - (a + 2 * bb + c)
                dzdx = nx.astype(np.float64) * z_factor / (8.0 * cellsize)
                dzdy = ny.astype(np.float64) * z_factor / (8.0 * cellsize)
                slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
                aspect = np.arctan2(dzdy, -dzdx)
                hs = 255.0 * (
                    np.cos(zen) * np.cos(slope)
                    + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
                )
                hsv = np.floor(np.maximum(hs, 0.0) + 0.5).astype(np.int64)
                rr, cc = np.nonzero(all_ok)
                if len(rr) == 0:
                    continue
                out.append(
                    pa.table(
                        {
                            "gcol": pa.array(bx * chunk + cc, pa.int64()),
                            "grow": pa.array(by * chunk + rr, pa.int64()),
                            "hillshade": pa.array(hsv[all_ok], pa.int64()),
                        }
                    )
                )
            return pa.concat_tables(out) if out else out_schema.empty_table()

    return _ids_task_stage(ids, _Shader())


def terrain_ruggedness_windowed(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """gdaldem-family terrain metrics with EXACT integer values — the
    trig-free complement of ``hillshade_windowed`` (same overlap-read
    zero-shuffle plan, same all-nine-valid rule):

    - ``tri8``      Σ|nᵢ − c| over the 8 neighbors (Wilson TRI × 8)
    - ``tpi8``      8·c − Σnᵢ          (TPI × 8, signed)
    - ``roughness`` max − min of the full 3×3 window (gdaldem roughness)

    All three stay in integer space end-to-end, so the SQL mirror is
    bit-exact with no float tree at all.
    """
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]
    out_schema = pa.schema(
        [
            ("gcol", pa.int64()),
            ("grow", pa.int64()),
            ("tri8", pa.int64()),
            ("tpi8", pa.int64()),
            ("roughness", pa.int64()),
        ]
    )

    class _Terrain:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            from numpy.lib.stride_tricks import sliding_window_view

            out = []
            bxs = b.column("bx").to_numpy(zero_copy_only=False)
            bys = b.column("by").to_numpy(zero_copy_only=False)
            for bx, by in zip(bxs, bys):
                cols = np.arange(bx * chunk - 1, (bx + 1) * chunk + 1, dtype=np.int64)
                rows = np.arange(by * chunk - 1, (by + 1) * chunk + 1, dtype=np.int64)
                v = self.r.values_at(cols[None, :], rows[:, None]).astype(np.int64)
                inside = (
                    (cols[None, :] >= c0)
                    & (cols[None, :] < c1)
                    & (rows[:, None] >= r0)
                    & (rows[:, None] < r1)
                )
                valid = (v != self.r.nodata) & inside
                win = sliding_window_view(v, (3, 3))
                all_ok = sliding_window_view(valid, (3, 3)).all(axis=(2, 3))
                c = win[:, :, 1, 1]
                nsum = win.sum(axis=(2, 3)) - c
                tri8 = np.abs(win - c[:, :, None, None]).sum(axis=(2, 3))
                tpi8 = 8 * c - nsum
                rough = win.max(axis=(2, 3)) - win.min(axis=(2, 3))
                rr, cc2 = np.nonzero(all_ok)
                if len(rr) == 0:
                    continue
                out.append(
                    pa.table(
                        {
                            "gcol": pa.array(bx * chunk + cc2, pa.int64()),
                            "grow": pa.array(by * chunk + rr, pa.int64()),
                            "tri8": pa.array(tri8[all_ok], pa.int64()),
                            "tpi8": pa.array(tpi8[all_ok], pa.int64()),
                            "roughness": pa.array(rough[all_ok], pa.int64()),
                        }
                    )
                )
            return pa.concat_tables(out) if out else out_schema.empty_table()

    return _ids_task_stage(ids, _Terrain())


def equalize_blocks(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Histogram equalization over a pixel window — the classic
    GLOBAL-then-MAP raster shape: pass 1 reduces the window to a
    256-bin histogram (map-side bincount partials, one bounded
    groupby), the driver folds the CDF (256 ints) and broadcasts it,
    pass 2 remaps every pixel and rolls each block up to
    (bx, by, n, eq_sum) — integer-exact end-to-end with the classic
    integer transfer ``eq = (cdf(v) − cdf_min) · 255 // (N − cdf_min)``
    (nodata pixels excluded).  Two passes over the source, zero pixel
    shuffles, O(256) driver state."""
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]

    def window(reader, bx, by):
        cols = np.arange(
            max(bx * chunk, c0), min((bx + 1) * chunk, c1), dtype=np.int64
        )
        rows = np.arange(
            max(by * chunk, r0), min((by + 1) * chunk, r1), dtype=np.int64
        )
        v = reader.values_at(cols[None, :], rows[:, None])
        return v[v != reader.nodata].astype(np.int64)

    class _Hist:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            h = np.zeros(256, dtype=np.int64)
            for bx, by in zip(
                b.column("bx").to_numpy(zero_copy_only=False),
                b.column("by").to_numpy(zero_copy_only=False),
            ):
                h += np.bincount(window(self.r, bx, by), minlength=256)
            return pa.table(
                {"bin": pa.array(np.arange(256, dtype=np.int64)), "n": pa.array(h)}
            )

    import ray as _ray
    from ray.data.aggregate import Sum

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    ids_ds = _ray.data.from_items(
        ids, override_num_blocks=max(1, min(len(ids), cpus * 2))
    )
    hist = (
        ids_ds.map_batches(_Hist(), batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: exactly 256 rows
        .sort_values("bin")
    )
    counts = np.zeros(256, dtype=np.int64)
    counts[hist["bin"].to_numpy()] = hist["n"].to_numpy()
    cdf = np.cumsum(counts)
    total = int(cdf[-1])
    nz = np.flatnonzero(counts)
    cdf_min = int(cdf[nz[0]]) if len(nz) else 0
    denom = max(total - cdf_min, 1)
    lut = np.clip((cdf - cdf_min) * 255 // denom, 0, 255).astype(np.int64)
    lut_ref = _ray.put(lut)

    class _Remap:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)
            self.lut = _ray.get(lut_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            bxs = b.column("bx").to_numpy(zero_copy_only=False)
            bys = b.column("by").to_numpy(zero_copy_only=False)
            out_n, out_s = [], []
            for bx, by in zip(bxs, bys):
                v = window(self.r, bx, by)
                eq = self.lut[v]
                out_n.append(len(v))
                out_s.append(int(eq.sum()))
            return pa.table(
                {
                    "bx": pa.array(bxs, pa.int64()),
                    "by": pa.array(bys, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                    "eq_sum": pa.array(out_s, pa.int64()),
                }
            )

    return ids_ds.map_batches(_Remap(), batch_format="pyarrow")


def viewshed_windowed(
    raster_spec: dict,
    obs_col: int,
    obs_row: int,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Viewshed (gdal_viewshed analog) from one observer over a pixel
    window, integer-exact: target t at Chebyshev distance K is visible
    iff NO intermediate sample k ∈ [1, K−1] satisfies
    ``(e_k − e_obs) · K ≥ (e_t − e_obs) · k`` (the cross-multiplied
    line-of-sight slope test — no floats anywhere).  Samples walk the
    discrete line ``pos_k = obs + (t − obs)·k // K`` (floor division).
    Nodata pixels carry their raw value (0) — valleys, not walls.

    Parallel plan: each chunk² block of targets is one task; the
    per-task kernel loops k (≤ window diameter) with whole-block numpy
    gathers — rays never materialize per target.  Output per block:
    (bx, by, n_total, n_visible).
    """
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]

    class _Viewshed:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)
            self.e0 = int(
                self.r.values_at(
                    np.array([[obs_col]]), np.array([[obs_row]])
                ).astype(np.int64)[0, 0]
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            out_bx, out_by, out_n, out_v = [], [], [], []
            for bx, by in zip(
                b.column("bx").to_numpy(zero_copy_only=False),
                b.column("by").to_numpy(zero_copy_only=False),
            ):
                cols = np.arange(
                    max(bx * chunk, c0), min((bx + 1) * chunk, c1), dtype=np.int64
                )
                rows = np.arange(
                    max(by * chunk, r0), min((by + 1) * chunk, r1), dtype=np.int64
                )
                ct = np.repeat(cols, len(rows))
                rt = np.tile(rows, len(cols))
                dc = ct - obs_col
                dr = rt - obs_row
                K = np.maximum(np.abs(dc), np.abs(dr))
                et = self.r.values_at(ct, rt).astype(np.int64)
                rhs = (et - self.e0)  # slope numerator of the target
                visible = np.ones(len(ct), dtype=bool)
                kmax = int(K.max()) if len(K) else 0
                for k in range(1, kmax):
                    act = K > k  # steps strictly between obs and target
                    if not act.any():
                        break
                    sc = obs_col + (dc[act] * k) // K[act]
                    sr = obs_row + (dr[act] * k) // K[act]
                    ek = self.r.values_at(sc, sr).astype(np.int64)
                    blocked = (ek - self.e0) * K[act] >= rhs[act] * k
                    vis_act = visible[act]
                    vis_act &= ~blocked
                    visible[act] = vis_act
                out_bx.append(int(bx))
                out_by.append(int(by))
                out_n.append(len(ct))
                out_v.append(int(visible.sum()))
            return pa.table(
                {
                    "bx": pa.array(out_bx, pa.int64()),
                    "by": pa.array(out_by, pa.int64()),
                    "n_total": pa.array(out_n, pa.int64()),
                    "n_visible": pa.array(out_v, pa.int64()),
                }
            )

    return _ids_task_stage(ids, _Viewshed())


def morphological_opening_blocks(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    threshold: int,
    chunk: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Binary morphological OPENING (erosion then dilation, 3×3
    structuring element) of the mask ``value ≥ threshold`` over a pixel
    window — chaining BOTH focal physical plans: the mask blocks read
    directly (windowed plan), but the eroded raster exists only as
    computed blocks, so the dilation pass runs through the halo
    EXCHANGE plan (``focal_stats_exchange``).

    Boundary semantics (mirrored by the SQL oracle): outside-window is
    FALSE — erosion requires all nine in-window neighbors present and
    true (n == 9 and min == 1); dilation is any-true over whatever
    neighbors exist (max == 1).  Output per block:
    (bx, by, n_mask, n_eroded, n_opened).
    """
    from ..raster.synthetic import SyntheticRaster

    bx0, bx1 = c0 // chunk, (c1 + chunk - 1) // chunk
    by0, by1 = r0 // chunk, (r1 + chunk - 1) // chunk
    ids = [{"bx": bx, "by": by} for by in range(by0, by1) for bx in range(bx0, bx1)]

    class _MaskReader:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            bufs = []
            bxs = b.column("bx").to_numpy(zero_copy_only=False)
            bys = b.column("by").to_numpy(zero_copy_only=False)
            for bx, by in zip(bxs, bys):
                cols = np.arange(bx * chunk, (bx + 1) * chunk, dtype=np.int64)[None, :]
                rows = np.arange(by * chunk, (by + 1) * chunk, dtype=np.int64)[:, None]
                v = self.r.values_at(cols, rows)
                inside = (
                    (cols >= c0) & (cols < c1) & (rows >= r0) & (rows < r1)
                )
                m = ((v >= threshold) & inside).astype(np.uint8)
                bufs.append(m.tobytes())
            return pa.table(
                {
                    "bx": pa.array(bxs, pa.int32()),
                    "by": pa.array(bys, pa.int32()),
                    "pixels": pa.array(bufs, pa.binary()),
                }
            )

    import ray as _ray

    mask_blocks = _ids_task_stage(ids, _MaskReader()).materialize()

    # pass 1: erosion — 3×3 stats via halo exchange (nodata=255 never
    # occurs in a 0/1 mask, so every pixel is valid and n counts
    # in-window presence)
    er_stats = focal_stats_exchange(mask_blocks, chunk=chunk, nodata=255)

    def eroded_to_blocks(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        df["bx"] = df["gcol"] // chunk
        df["by"] = df["grow"] // chunk
        er = ((df["n"] == 9) & (df["min_val"] == 1)).astype(np.uint8)
        df["er"] = er
        out_bx, out_by, bufs = [], [], []
        for (bx, by), g in df.groupby(["bx", "by"], sort=False):
            grid = np.zeros(chunk * chunk, dtype=np.uint8)
            idx = (g["grow"].to_numpy() % chunk) * chunk + (g["gcol"].to_numpy() % chunk)
            grid[idx] = g["er"].to_numpy()
            out_bx.append(int(bx))
            out_by.append(int(by))
            bufs.append(grid.tobytes())
        return pa.table(
            {
                "bx": pa.array(out_bx, pa.int32()),
                "by": pa.array(out_by, pa.int32()),
                "pixels": pa.array(bufs, pa.binary()),
            }
        )

    # the stats stream is row-per-pixel; regroup to blocks with one
    # narrow exchange keyed by the block address
    er_blocks = (
        er_stats.map_batches(
            lambda b: b.append_column(
                "bkey",
                pa.array(
                    (b.column("grow").to_numpy() // chunk) * (1 << 20)
                    + b.column("gcol").to_numpy() // chunk
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("bkey")
        .map_groups(eroded_to_blocks, batch_format="pyarrow")
    ).materialize()

    # pass 2: dilation of the eroded raster — exchange plan again
    dil_stats = focal_stats_exchange(er_blocks, chunk=chunk, nodata=255)

    def rollup(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        df["bx"] = df["gcol"] // chunk
        df["by"] = df["grow"] // chunk
        df["opened"] = (df["max_val"] == 1).astype(np.int64)
        g = df.groupby(["bx", "by"], sort=False)["opened"].sum().reset_index()
        g.rename(columns={"opened": "n_opened"}, inplace=True)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    opened = (
        dil_stats.map_batches(rollup, batch_format="pyarrow")
        .groupby(["bx", "by"])
        .aggregate(Sum("n_opened", alias_name="n_opened"))
    ).materialize()

    # mask and eroded per-block counts ride along for the oracle
    def mask_counts(b: pa.Table) -> pa.Table:
        out = []
        for i in range(len(b)):
            m = np.frombuffer(b.column("pixels")[i].as_py(), dtype=np.uint8)
            out.append(int(m.sum()))
        return pa.table(
            {
                "bx": pa.compute.cast(b.column("bx"), pa.int64()),
                "by": pa.compute.cast(b.column("by"), pa.int64()),
                "n": pa.array(out, pa.int64()),
            }
        )

    nm = mask_blocks.map_batches(mask_counts, batch_format="pyarrow").to_pandas()
    ne = er_blocks.map_batches(mask_counts, batch_format="pyarrow").to_pandas()
    big = opened.to_pandas()  # bounded: one row per block
    big["bx"] = big["bx"].astype(np.int64)
    big["by"] = big["by"].astype(np.int64)
    merged = (
        nm.rename(columns={"n": "n_mask"})
        .merge(ne.rename(columns={"n": "n_eroded"}), on=["bx", "by"], how="left")
        .merge(big, on=["bx", "by"], how="left")
        .fillna(0)
    )
    for c in ("n_eroded", "n_opened"):
        merged[c] = merged[c].astype(np.int64)
    import ray.data as _rd

    return _rd.from_arrow(pa.Table.from_pandas(merged, preserve_index=False))
