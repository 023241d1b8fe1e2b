"""pagerank: fixed-iteration distributed PageRank vs a dense numpy
power iteration of the same (no-dangling-redistribution) variant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from rastertiler_rs_ray.pipelines.graph import pagerank


def _brute_pagerank(edges, num_iters=3, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        s = np.zeros(n)
        for u, v in edges:
            s[idx[v]] += r[idx[u]] / deg[u]
        r = (1.0 - damping) / n + damping * s
    return dict(zip(nodes, r))


def _run(edges, **kw):
    t = pa.table(
        {
            "u": pa.array([u for u, _ in edges], pa.int64()),
            "v": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = pagerank(ray.data.from_arrow(t).repartition(4), **kw).to_pandas()
    return dict(zip(out["node"], out["rank"]))


def test_pagerank_matches_brute_force(ray_session):
    rng = np.random.RandomState(11)
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, 40, (200, 2)) if a != b})
    got = _run(edges, num_iters=4)
    want = _brute_pagerank(edges, num_iters=4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pagerank_chain_graph_single_term_sums(ray_session):
    # in/out degree <= 1: distributed sums have one term -> exact floats
    edges = [(i, i - 1) for i in range(1, 30) if i % 10 != 0]
    got = _run(edges, num_iters=3)
    want = _brute_pagerank(edges, num_iters=3)
    for k in want:
        assert got[k] == want[k]  # bit-exact


def test_pagerank_rank_mass_and_sink_accumulation(ray_session):
    # star: 0->1, 2->1, 3->1 ; node 1 is a sink that accumulates
    got = _run([(0, 1), (2, 1), (3, 1)], num_iters=2)
    n = 4
    r0 = 1.0 / n
    base = 0.15 / n
    r1_1 = base + 0.85 * 3 * r0
    r2_1 = base + 0.85 * 3 * (base)  # spokes hold base after iter 1
    assert got[1] == pytest.approx(r2_1, rel=1e-12)
    assert got[0] == got[2] == got[3] == pytest.approx(base, rel=1e-12)


def test_pagerank_empty_edges(ray_session):
    t = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out = pagerank(ray.data.from_arrow(t))
    assert out.count() == 0 and out.schema().names == ["node", "rank"]
