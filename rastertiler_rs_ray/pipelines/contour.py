"""Contour extraction: marching squares over a windowed-readable raster.

The classic raster→vector bridge (GDAL ``gdal_contour``): for every
2×2 pixel cell, classify the 4 corners against an iso ``level``
(bit 1 = top-left v00, 2 = top-right v10, 4 = bottom-right v11,
8 = bottom-left v01) and emit the level-set segment(s) whose endpoints
sit on cell edges at the linear interpolation
``t = (level - v_a) / (v_b - v_a)``.

Distribution is the focal family's zero-shuffle plan (focal.py): each
chunk task overlap-reads its (chunk+1)² pixel window directly — a cell
is owned by the chunk containing its top-left pixel, so every segment
is computed exactly once with NO exchange at all.  At 100 TB this is
embarrassingly parallel over chunk ids; for *computed* rasters (pixels
already in the object store) the focal halo-exchange plan applies
unchanged since marching squares only needs the +1 right/bottom halo.

Determinism / oracle contract: the case LUT below fixes each segment's
(start-edge, end-edge) orientation; endpoint coordinates are global
pixel floats quantized e4 (floor(x·1e4 + 0.5), the repo convention),
so a SQL engine mirrors the whole operator — classification,
interpolation, orientation — term for term.  Saddle cells (cases 5 and
10) use the fixed two-segment convention (no center-sample
disambiguation), documented here so the output is a function of the
corner values alone.

Cells touching a nodata corner are holes (skipped), matching
gdal_contour's nodata semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# case → [(start_edge, end_edge), ...]; edges T/R/B/L of the cell
MS_LUT: dict[int, list[tuple[str, str]]] = {
    1: [("T", "L")],
    2: [("T", "R")],
    3: [("L", "R")],
    4: [("R", "B")],
    5: [("T", "L"), ("R", "B")],
    6: [("T", "B")],
    7: [("L", "B")],
    8: [("L", "B")],
    9: [("T", "B")],
    10: [("T", "R"), ("L", "B")],
    11: [("R", "B")],
    12: [("L", "R")],
    13: [("T", "R")],
    14: [("T", "L")],
}

_SCHEMA = pa.schema(
    [
        ("c", pa.int64()),
        ("r", pa.int64()),
        ("seg", pa.int64()),
        ("cse", pa.int64()),
        ("x0_e4", pa.int64()),
        ("y0_e4", pa.int64()),
        ("x1_e4", pa.int64()),
        ("y1_e4", pa.int64()),
    ]
)


def _e4(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e4 + 0.5).astype(np.int64)


def marching_squares_cells(
    vals: np.ndarray,
    nodata: int,
    level: float,
    col0: int,
    row0: int,
) -> pa.Table:
    """Vectorized marching squares over a (H+1, W+1) pixel-value window
    whose top-left pixel is global (col0, row0); returns segments for
    the H×W cells with top-left inside the window core."""
    v = vals.astype(np.float64)
    nod = vals == nodata
    v00, v10 = v[:-1, :-1], v[:-1, 1:]
    v01, v11 = v[1:, :-1], v[1:, 1:]
    valid = ~(nod[:-1, :-1] | nod[:-1, 1:] | nod[1:, :-1] | nod[1:, 1:])
    case = (
        (v00 >= level).astype(np.int64)
        + 2 * (v10 >= level).astype(np.int64)
        + 4 * (v11 >= level).astype(np.int64)
        + 8 * (v01 >= level).astype(np.int64)
    )
    h, w = case.shape
    cf = (col0 + np.arange(w, dtype=np.int64)[None, :]).astype(np.float64)
    rf = (row0 + np.arange(h, dtype=np.int64)[:, None]).astype(np.float64)
    cf = np.broadcast_to(cf, case.shape)
    rf = np.broadcast_to(rf, case.shape)
    with np.errstate(divide="ignore", invalid="ignore"):
        tT = (level - v00) / (v10 - v00)
        tB = (level - v01) / (v11 - v01)
        tL = (level - v00) / (v01 - v00)
        tR = (level - v10) / (v11 - v10)

    def coord(edge: str, m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if edge == "T":
            return cf[m] + tT[m], rf[m]
        if edge == "B":
            return cf[m] + tB[m], rf[m] + 1.0
        if edge == "L":
            return cf[m], rf[m] + tL[m]
        return cf[m] + 1.0, rf[m] + tR[m]  # R

    parts = []
    for k, segs in MS_LUT.items():
        m = valid & (case == k)
        if not m.any():
            continue
        cs = (cf[m]).astype(np.int64)
        rs = (rf[m]).astype(np.int64)
        for j, (e0, e1) in enumerate(segs):
            x0, y0 = coord(e0, m)
            x1, y1 = coord(e1, m)
            parts.append(
                pa.table(
                    {
                        "c": pa.array(cs),
                        "r": pa.array(rs),
                        "seg": pa.array(np.full(len(cs), j, np.int64)),
                        "cse": pa.array(np.full(len(cs), k, np.int64)),
                        "x0_e4": pa.array(_e4(x0)),
                        "y0_e4": pa.array(_e4(y0)),
                        "x1_e4": pa.array(_e4(x1)),
                        "y1_e4": pa.array(_e4(y1)),
                    }
                )
            )
    return pa.concat_tables(parts) if parts else _SCHEMA.empty_table()


def contour_segments_windowed(
    raster_spec: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    level: float = 127.5,
    chunk: int = 128,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Marching-squares segments for all cells whose top-left pixel is
    in [c0, c1-1) × [r0, r1-1) — zero-shuffle: each chunk task
    overlap-reads its (chunk+1)² window (one extra pixel right/bottom),
    so cell ownership is unique by construction."""
    from ..raster.synthetic import SyntheticRaster

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]

    class _ContourReader:
        def __init__(self):
            self.r = SyntheticRaster.from_spec(raster_spec)

        def __call__(self, b: pa.Table) -> pa.Table:
            out = []
            for bx, by in zip(
                b.column("bx").to_numpy(zero_copy_only=False),
                b.column("by").to_numpy(zero_copy_only=False),
            ):
                lo_c, lo_r = int(bx) * chunk, int(by) * chunk
                # cells owned by this chunk: top-left in the chunk AND
                # in-region with the full 2×2 inside [c0,c1)×[r0,r1)
                cc0, rr0 = max(lo_c, c0), max(lo_r, r0)
                cc1 = min(lo_c + chunk, c1 - 1)
                rr1 = min(lo_r + chunk, r1 - 1)
                if cc0 >= cc1 or rr0 >= rr1:
                    continue
                cols = np.arange(cc0, cc1 + 1, dtype=np.int64)
                rows = np.arange(rr0, rr1 + 1, dtype=np.int64)
                vals = self.r.values_at(cols[None, :], rows[:, None])
                t = marching_squares_cells(vals, self.r.nodata, level, cc0, rr0)
                if len(t):
                    out.append(t)
            return pa.concat_tables(out) if out else _SCHEMA.empty_table()

    # task stage, not an actor pool — reader state is a tiny spec dict
    # (see focal._ids_task_stage); ``concurrency`` retained for API compat
    from .focal import _ids_task_stage

    return _ids_task_stage(ids, _ContourReader())
