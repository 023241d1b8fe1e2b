"""Grouped rectangle union area vs brute-force pixel oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.spatial import _union_area_block, grouped_union_area


def _brute_area(x0, y0, x1, y1):
    """Pixel-paint oracle on a shifted grid (coords kept small)."""
    ox, oy = min(x0.min(), 0), min(y0.min(), 0)
    W, H = int(x1.max() - ox), int(y1.max() - oy)
    grid = np.zeros((W, H), dtype=bool)
    for a, b, c, d in zip(x0, y0, x1, y1):
        grid[a - ox : c - ox, b - oy : d - oy] = True
    return int(grid.sum())


def test_union_area_block_cases():
    # disjoint, nested, overlapping, degenerate
    x0 = np.array([0, 10, 5, 7, 3])
    y0 = np.array([0, 10, 5, 7, 3])
    x1 = np.array([4, 14, 9, 8, 3])  # last is empty
    y1 = np.array([4, 14, 9, 8, 3])
    ok = (x1 > x0) & (y1 > y0)
    assert _union_area_block(x0[ok], y0[ok], x1[ok], y1[ok]) == _brute_area(
        x0[ok], y0[ok], x1[ok], y1[ok]
    )


def test_union_area_random_matches_brute():
    rng = np.random.default_rng(31)
    for _ in range(20):
        n = rng.integers(1, 60)
        x0 = rng.integers(-100, 200, n)
        y0 = rng.integers(-100, 200, n)
        x1 = x0 + rng.integers(1, 80, n)
        y1 = y0 + rng.integers(1, 80, n)
        assert _union_area_block(x0, y0, x1, y1) == _brute_area(x0, y0, x1, y1)


def test_grouped_union_area_strips(ray_session):
    """Strip clipping must be exact: tiny strip width forces every rect
    across many strips; totals still match the unstripped oracle."""
    rng = np.random.default_rng(41)
    rows = []
    for g in ("a", "b", "c"):
        n = int(rng.integers(20, 50))
        x0 = rng.integers(-500, 500, n)
        y0 = rng.integers(-500, 500, n)
        x1 = x0 + rng.integers(1, 300, n)
        y1 = y0 + rng.integers(1, 300, n)
        for k in range(n):
            rows.append((g, int(x0[k]), int(y0[k]), int(x1[k]), int(y1[k])))
    df = pd.DataFrame(rows, columns=["grp", "x0", "y0", "x1", "y1"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = (
        grouped_union_area(ds, group_col="grp", strip_width=64)
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    for i, (g, gdf) in enumerate(df.groupby("grp")):
        want = _brute_area(
            gdf["x0"].to_numpy(), gdf["y0"].to_numpy(),
            gdf["x1"].to_numpy(), gdf["y1"].to_numpy(),
        )
        assert int(got.loc[i, "union_area"]) == want, g
