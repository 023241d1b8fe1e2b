"""Hex-cell pipeline operators vs brute-force numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.geo.hexcell import (
    NEIGHBOR_OFFSETS,
    hex_assign,
    hex_id,
)

RES = 5
N = 3000


@pytest.fixture(scope="module")
def points(ray_session):
    rng = np.random.default_rng(21)
    from rastertiler_rs_ray.geo.mercator import ORIGIN

    mx = rng.uniform(-ORIGIN, ORIGIN, N)
    my = rng.uniform(-ORIGIN * 0.95, ORIGIN * 0.95, N)
    tbl = pa.table({"mx": pa.array(mx), "my": pa.array(my)})
    return ray.data.from_arrow(tbl), mx, my


def _oracle_density(mx, my, res):
    q, r = hex_assign(mx, my, res)
    df = pd.DataFrame({"hex_q": q, "hex_r": r})
    return df.groupby(["hex_q", "hex_r"]).size().rename("n_docs").reset_index()


def test_hex_density_matches_oracle(points):
    from rastertiler_rs_ray.pipelines.spatial import hex_density

    ds, mx, my = points
    got = (
        hex_density(ds, res=RES)
        .to_pandas()
        .sort_values(["hex_q", "hex_r"])
        .reset_index(drop=True)
    )
    want = _oracle_density(mx, my, RES).sort_values(["hex_q", "hex_r"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert np.array_equal(got["hex_q"], want["hex_q"])
    assert np.array_equal(got["hex_r"], want["hex_r"])
    assert np.array_equal(got["n_docs"], want["n_docs"])
    # packed id consistent with (res, q, r)
    hid = hex_id(np.full(len(got), RES), got["hex_q"].to_numpy(), got["hex_r"].to_numpy())
    assert np.array_equal(got["hex_id"].to_numpy(), hid)
    assert int(got["n_docs"].sum()) == N


def test_hex_hotspot_neighbors_matches_bruteforce(points):
    from rastertiler_rs_ray.pipelines.spatial import hex_hotspot_neighbors

    ds, mx, my = points
    min_docs = 3
    got = (
        hex_hotspot_neighbors(ds, res=RES, min_docs=min_docs)
        .to_pandas()
        .sort_values(["hex_q", "hex_r"])
        .reset_index(drop=True)
    )
    dens = _oracle_density(mx, my, RES)
    lut = {(int(a), int(b)): int(n) for a, b, n in dens.itertuples(index=False)}
    hot = dens[dens["n_docs"] >= min_docs]
    rows = []
    for q, r, n in hot.itertuples(index=False):
        nbr = sum(
            lut.get((int(q) + int(dq), int(r) + int(dr)), 0)
            for dq, dr in NEIGHBOR_OFFSETS
        )
        rows.append((int(q), int(r), int(n), nbr))
    want = (
        pd.DataFrame(rows, columns=["hex_q", "hex_r", "n_docs", "neighbor_docs"])
        .sort_values(["hex_q", "hex_r"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
