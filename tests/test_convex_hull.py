"""Distributed grouped convex hull vs brute-force halfplane oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.spatial import _hull_indices, grouped_convex_hull


def _brute_hull_ids(x, y, ids):
    """p is a hull vertex iff some line through p and another point has
    all points on one side (the SQL oracle's characterisation)."""
    n = len(x)
    if n <= 2:
        return set(ids.tolist())
    out = set()
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            cr = (x[j] - x[i]) * (y - y[i]) - (y[j] - y[i]) * (x - x[i])
            if cr.min() >= 0 or cr.max() <= 0:
                out.add(int(ids[i]))
                break
    return out


def test_hull_indices_square():
    x = np.array([0.0, 2.0, 2.0, 0.0, 1.0])
    y = np.array([0.0, 0.0, 2.0, 2.0, 1.0])
    idx = set(_hull_indices(x, y).tolist())
    assert idx == {0, 1, 2, 3}  # interior point dropped


def test_grouped_hull_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    rows = []
    for g, size in [("a", 40), ("b", 120), ("c", 2), ("d", 1)]:
        x = rng.normal(0, 100, size)
        y = rng.normal(0, 100, size)
        for k in range(size):
            rows.append((g, len(rows), x[k], y[k]))
    df = pd.DataFrame(rows, columns=["grp", "pid", "x", "y"])
    # many tiny blocks → the map-side partial-hull combiner actually runs
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    got = (
        grouped_convex_hull(ds, group_col="grp", x_col="x", y_col="y", id_col="pid")
        .to_pandas()
    )
    for g, gdf in df.groupby("grp"):
        want = _brute_hull_ids(gdf["x"].to_numpy(), gdf["y"].to_numpy(), gdf["pid"].to_numpy())
        have = set(got[got["grp"] == g]["pid"].tolist())
        assert have == want, g


def test_partial_hull_combine_law():
    """hull(A ∪ B) == hull(hull(A) ∪ hull(B)) — the distributive law the
    two-level plan relies on."""
    rng = np.random.default_rng(23)
    x = rng.uniform(-1, 1, 500)
    y = rng.uniform(-1, 1, 500)
    full = set(_hull_indices(x, y).tolist())
    ia = np.arange(250)
    ib = np.arange(250, 500)
    ha = ia[_hull_indices(x[ia], y[ia])]
    hb = ib[_hull_indices(x[ib], y[ib])]
    cand = np.concatenate([ha, hb])
    two_level = set(cand[_hull_indices(x[cand], y[cand])].tolist())
    assert two_level == full
