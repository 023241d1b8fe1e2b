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


def test_hex_dwell_runs(ray_session):
    """Constructed trajectory: known cells/timestamps → exact runs,
    split across many blocks to force the exchange."""
    from rastertiler_rs_ray.geo.hexcell import hex_center
    from rastertiler_rs_ray.pipelines.spatial import hex_dwell_runs

    res = 5
    # user 1: cells A,A,A,B,A,A ; user 2: C,C
    cells = [(0, 0)] * 3 + [(3, -1)] + [(0, 0)] * 2 + [(7, 2)] * 2
    users = [1] * 6 + [2] * 2
    ts = pd.to_datetime(
        ["2026-01-01 00:00", "2026-01-01 00:05", "2026-01-01 00:20",
         "2026-01-01 00:30", "2026-01-01 00:40", "2026-01-01 00:55",
         "2026-01-01 01:00", "2026-01-01 01:30"]
    )
    q = np.array([c[0] for c in cells])
    r = np.array([c[1] for c in cells])
    mx, my = hex_center(q, r, res)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "event_id": pa.array(np.arange(8), pa.int64()),
            "ts": pa.array(ts),
            "mx": pa.array(mx),
            "my": pa.array(my),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = (
        hex_dwell_runs(ds, res=res, min_events=2, min_seconds=0)
        .to_pandas()
        .sort_values(["user_id", "enter_ts"])
        .reset_index(drop=True)
    )
    # runs: u1 A×3 (00:00-00:20), u1 A×2 (00:40-00:55), u2 C×2
    assert len(got) == 3
    assert got.loc[0, "n_events"] == 3 and got.loc[0, "hex_q"] == 0
    assert got.loc[1, "n_events"] == 2 and got.loc[1, "hex_q"] == 0
    assert got.loc[2, "user_id"] == 2 and got.loc[2, "hex_q"] == 7
    # min_seconds filter: the 15-minute run survives a 600 s floor, the
    # singleton-B run never appears, and min_seconds=1e6 kills all
    none = hex_dwell_runs(ds, res=res, min_events=2, min_seconds=1e6).to_pandas()
    assert len(none) == 0
