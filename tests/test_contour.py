"""Marching-squares contour extraction: case LUT, interpolation,
saddle convention, nodata holes, chunk-invariance."""

import numpy as np
import pyarrow as pa
import pytest

from rastertiler_rs_ray.pipelines.contour import (
    MS_LUT,
    contour_segments_windowed,
    marching_squares_cells,
)

L = 127.5
LO, HI = 100, 200  # below / above level


def _cell(case: int) -> np.ndarray:
    """2x2 window realizing `case` (bit1=v00, 2=v10, 4=v11, 8=v01)."""
    v00 = HI if case & 1 else LO
    v10 = HI if case & 2 else LO
    v11 = HI if case & 4 else LO
    v01 = HI if case & 8 else LO
    return np.array([[v00, v10], [v01, v11]], dtype=np.uint8)


def _edge_of(x: float, y: float) -> str:
    if y == 0.0 and 0 < x < 1:
        return "T"
    if y == 1.0 and 0 < x < 1:
        return "B"
    if x == 0.0 and 0 < y < 1:
        return "L"
    if x == 1.0 and 0 < y < 1:
        return "R"
    raise AssertionError(f"endpoint not on an open edge: {(x, y)}")


@pytest.mark.parametrize("case", list(range(1, 15)))
def test_every_case_matches_lut(case):
    t = marching_squares_cells(_cell(case), nodata=0, level=L, col0=0, row0=0)
    assert len(t) == len(MS_LUT[case])
    df = t.to_pandas().sort_values("seg").reset_index(drop=True)
    for j, (e0, e1) in enumerate(MS_LUT[case]):
        row = df.iloc[j]
        assert row["cse"] == case and row["c"] == 0 and row["r"] == 0
        assert _edge_of(row["x0_e4"] / 1e4, row["y0_e4"] / 1e4) == e0
        assert _edge_of(row["x1_e4"] / 1e4, row["y1_e4"] / 1e4) == e1


def test_trivial_cases_emit_nothing():
    for case in (0, 15):
        assert len(marching_squares_cells(_cell(case), 0, L, 0, 0)) == 0


def test_interpolation_exact():
    # v00=100 v10=200: top crossing at t=(127.5-100)/100=0.275
    v = np.array([[100, 200], [100, 100]], dtype=np.uint8)  # case 2 (TR)
    t = marching_squares_cells(v, nodata=0, level=L, col0=10, row0=20)
    row = t.to_pandas().iloc[0]
    assert row["cse"] == 2
    # seg (T, R): start on top edge x=10.275, end on right edge
    assert row["x0_e4"] == 102750 and row["y0_e4"] == 200000
    # right edge: v10=200, v11=100 -> t=(127.5-200)/(100-200)=0.725
    assert row["x1_e4"] == 110000 and row["y1_e4"] == 207250


def test_nodata_hole():
    v = _cell(2)
    v[1, 1] = 0  # one nodata corner kills the cell
    assert len(marching_squares_cells(v, nodata=0, level=L, col0=0, row0=0)) == 0


def test_windowed_chunk_invariance(ray_session):
    """Same region extracted with chunk=64 and chunk=256 → identical
    segment sets (overlap-read ownership is exact)."""
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    spec = default_u8_raster().spec()
    kw = dict(level=L)
    a = (
        contour_segments_windowed(spec, 256, 256, 512, 512, chunk=64, **kw)
        .to_pandas()
        .sort_values(["c", "r", "seg"])
        .reset_index(drop=True)
    )
    b = (
        contour_segments_windowed(spec, 256, 256, 512, 512, chunk=256, **kw)
        .to_pandas()
        .sort_values(["c", "r", "seg"])
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)


def test_windowed_matches_single_array(ray_session):
    """Pipeline output equals one straight marching_squares_cells call
    over the whole window read at once."""
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    r = default_u8_raster()
    c0, r0, c1, r1 = 300, 300, 420, 404
    cols = np.arange(c0, c1, dtype=np.int64)
    rows = np.arange(r0, r1, dtype=np.int64)
    vals = r.values_at(cols[None, :], rows[:, None])
    ref = (
        marching_squares_cells(vals, r.nodata, L, c0, r0)
        .to_pandas()
        .sort_values(["c", "r", "seg"])
        .reset_index(drop=True)
    )
    got = (
        contour_segments_windowed(r.spec(), c0, r0, c1, r1, level=L, chunk=64)
        .to_pandas()
        .sort_values(["c", "r", "seg"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)
