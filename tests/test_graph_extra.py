"""Pointer-doubling ancestor closure vs a sequential-walk oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.graph import ancestor_closure


def _walk_oracle(nodes, parent_of):
    """Sequential chain walk, presence-aware: extend only through
    ancestors that are themselves nodes."""
    node_set = set(nodes)
    rows = []
    for n in nodes:
        cur, d = n, 0
        while True:
            p = parent_of(cur)
            d += 1
            rows.append((n, p, d))
            if p not in node_set or p < 1:
                break
            cur = p
    return pd.DataFrame(rows, columns=["node", "anc", "depth"])


def test_ancestor_closure_matches_walk(ray_session):
    # non-contiguous ids: gaps exercise the presence-aware termination
    nodes = np.array([1, 2, 3, 5, 7, 20, 21, 85, 86, 340, 341, 1365], dtype=np.int64)
    parent = lambda x: x // 4
    edges = pa.table({"node": pa.array(nodes), "parent": pa.array(nodes // 4)})
    got = (
        ancestor_closure(ray.data.from_arrow(edges).repartition(3))
        .to_pandas()
        .sort_values(["node", "depth"])
        .reset_index(drop=True)
    )
    want = (
        _walk_oracle(nodes.tolist(), parent)
        .sort_values(["node", "depth"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("node", "anc", "depth"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    # chains of length > 2 prove at least two doubling rounds ran
    assert int(got["depth"].max()) >= 4
