"""Adversarial skew: every doc lands in ONE tile — the salted paths and
group-holding windows must stay correct when a single key owns 100% of
the rows."""

import numpy as np
import pandas as pd
import ray.data


def test_fully_skewed_tile_assignment_salts_and_counts(ray_session):
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import assign_tiles, tile_assignment_counts

    # a whisker-sized extent: all 50k docs in one z8 tile
    ext = (-59.900, 26.700, -59.899, 26.701)
    pos = synthetic_positions_dataset(50_000, extent=ext, override_num_blocks=16)
    assigned = assign_tiles(pos, [8])
    counts = tile_assignment_counts(assigned).to_pandas()
    assert len(counts) == 1 and counts["n_docs"].iloc[0] == 50_000

    # salt the hot key into 8 sub-groups: same logical counts
    key = int(
        assigned.take_batch(1, batch_format="pyarrow").column("tile_key")[0].as_py()
    )
    salted = assign_tiles(
        synthetic_positions_dataset(50_000, extent=ext, override_num_blocks=16),
        [8],
        salt_map={key: 8},
    )
    sdf = salted.to_pandas()
    assert len(sdf) == 50_000
    # sub-keys actually split the group (load spread across >1 reducer)
    assert sdf["salted_key"].nunique() > 1
    # and re-aggregate to the same histogram
    c2 = tile_assignment_counts(salted).to_pandas()
    assert len(c2) == 1 and c2["n_docs"].iloc[0] == 50_000


def test_fully_skewed_session_and_topn(ray_session):
    """One user owns every event: single-group map_groups stays correct."""
    from rastertiler_rs_ray.pipelines.relational import grouped_top_n, sessionize

    n = 20_000
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 7, unit="s"),
        "value": (np.arange(n) * 37 % 1000).astype(float),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    s = sessionize(ds, ["user_id"], ["ts", "event_id"], "ts", gap_seconds=3600)
    out = s.to_pandas()
    assert len(out) == n and out["session_id"].max() == 1  # 7s gaps, one session

    top = grouped_top_n(
        ray.data.from_pandas(df).repartition(8), ["user_id"],
        order_col="value", n=5, tiebreak_cols=["event_id"],
    ).to_pandas().sort_values("rnk")
    assert top["value"].tolist() == [999.0] * 5  # max value 999 occurs repeatedly
    assert top["event_id"].tolist() == sorted(
        df[df["value"] == 999.0]["event_id"].tolist()
    )[:5]
