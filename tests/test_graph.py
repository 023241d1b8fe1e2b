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


# ---------------------------------------------------------------- triangles


from itertools import combinations

from rastertiler_rs_ray.pipelines.graph import triangle_counts


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    cnt = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for n in (x, y, z):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def _run_tri(edges):
    t = pa.table(
        {
            "u": pa.array([u for u, _ in edges], pa.int64()),
            "v": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    # take_all, not to_pandas: Ray 2.49.2's to_pandas returns a
    # zero-COLUMN frame for any empty dataset regardless of schema
    rows = triangle_counts(ray.data.from_arrow(t).repartition(4)).take_all()
    return {r["node"]: r["triangles"] for r in rows}


def test_triangles_random_graph_conformance(ray_session):
    rng = np.random.default_rng(7)
    n = 40
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(260, 2))
    ]
    assert _run_tri(edges) == _brute_triangles(edges)


def test_triangles_direction_dups_selfloops_ignored(ray_session):
    # K3 expressed redundantly: both directions, dups, plus a self-loop
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (1, 1)]
    assert _run_tri(edges) == {0: 1, 1: 1, 2: 1}


def test_triangles_k4_counts(ray_session):
    # K4: each node sits in C(3,2) = 3 triangles
    edges = [(a, b) for a, b in combinations(range(4), 2)]
    assert _run_tri(edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_hub_skew_star_has_none(ray_session):
    # star graph: a high-degree hub but zero triangles (orientation
    # must not blow up the hub's group: spokes have degree 1 so every
    # edge orients spoke -> hub and the hub emits no wedge)
    edges = [(0, i) for i in range(1, 25)]
    assert _run_tri(edges) == {}


def test_triangles_planted_chain_skips(ray_session):
    # the triangle_doc_links graph at N=30: 8 triangles per chain of 10
    edges = [(i - 1, i) for i in range(30) if i % 10 != 0] + [
        (i - 2, i) for i in range(30) if i % 10 >= 2
    ]
    got = _run_tri(edges)
    want = _brute_triangles(edges)
    assert got == want
    assert sum(want.values()) == 3 * 8 * 3  # 3 chains x 8 triangles x 3 nodes


# ---------------------------------------------------------------- bfs


def _brute_bfs(edges, seeds, max_hops, undirected=True):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        if undirected:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


def _run_bfs(edges, seeds, **kw):
    from rastertiler_rs_ray.pipelines.graph import bfs_hops

    t = pa.table(
        {
            "u": pa.array([u for u, _ in edges], pa.int64()),
            "v": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    s = pa.table({"node": pa.array(list(seeds), pa.int64())})
    out = bfs_hops(
        ray.data.from_arrow(t).repartition(4),
        ray.data.from_arrow(s),
        **kw,
    ).to_pandas()
    return dict(zip(out["node"], out["hops"]))


def test_bfs_min_hops_competing_paths(ray_session):
    # chain 0-1-2-3-4-5 plus skips (0,2),(2,4): node 4 is 2 hops via
    # skips even though the chain offers a 4-hop path
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 2), (2, 4)]
    got = _run_bfs(edges, [0], max_hops=3)
    want = _brute_bfs(edges, [0], 3)
    assert got == want
    assert got[4] == 2 and got[5] == 3


def test_bfs_multi_source_and_bound(ray_session):
    rng = np.random.default_rng(7)
    edges = [tuple(e) for e in rng.integers(0, 60, size=(150, 2)) if e[0] != e[1]]
    seeds = [0, 17, 42]
    for mh in (1, 2, 4):
        got = _run_bfs(edges, seeds, max_hops=mh)
        assert got == _brute_bfs(edges, seeds, mh)


def test_bfs_directed(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = _run_bfs(edges, [0], max_hops=5, undirected=False)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_early_exhaustion(ray_session):
    # component exhausts before max_hops; loop must break, not error
    edges = [(0, 1), (5, 6)]
    got = _run_bfs(edges, [0], max_hops=10)
    assert got == {0: 0, 1: 1}


class TestJaccardLinkPrediction:
    def test_vs_brute_force(self, ray_session):
        import itertools

        from rastertiler_rs_ray.pipelines.graph import jaccard_link_prediction

        rng = np.random.default_rng(13)
        n_nodes = 30
        edges = set()
        while len(edges) < 60:
            a, b = rng.integers(0, n_nodes, 2)
            if a != b:
                edges.add((min(int(a), int(b)), max(int(a), int(b))))
        u = np.array([e[0] for e in edges], dtype=np.int64)
        v = np.array([e[1] for e in edges], dtype=np.int64)
        # duplicates + reversed duplicates must be harmless
        ds = ray.data.from_arrow(
            pa.table({"u": np.concatenate([u, v]), "v": np.concatenate([v, u])})
        )
        got = {
            (r["u"], r["v"]): (r["common"], r["jaccard_e4"])
            for r in jaccard_link_prediction(ds).take_all()
        }

        nbr = {i: set() for i in range(n_nodes)}
        for a, b in edges:
            nbr[a].add(b)
            nbr[b].add(a)
        want = {}
        for a, b in itertools.combinations(range(n_nodes), 2):
            if (a, b) in edges:
                continue
            c = len(nbr[a] & nbr[b])
            if c >= 1:
                un = len(nbr[a] | nbr[b])
                want[(a, b)] = (c, int(np.floor(10000.0 * c / un + 0.5)))
        assert got == want
        assert len(want) > 20  # non-trivial instance

    def test_existing_edges_excluded(self, ray_session):
        from rastertiler_rs_ray.pipelines.graph import jaccard_link_prediction

        # triangle + pendant: (0,1) is an edge AND shares neighbor 2 → excluded
        ds = ray.data.from_arrow(
            pa.table({"u": [0, 1, 0, 2], "v": [1, 2, 2, 3]})
        )
        got = {(r["u"], r["v"]): r["common"] for r in jaccard_link_prediction(ds).take_all()}
        assert (0, 1) not in got and (0, 2) not in got and (1, 2) not in got
        # (1,3) share 2; (0,3) share 2
        assert got == {(0, 3): 1, (1, 3): 1}
