"""Iterative graph algorithms over edge-list Datasets, Ray-Data-first.

``connected_components`` (dedup.py) covers the equivalence-class side;
this module adds the value-propagation side — fixed-iteration PageRank,
the canonical "repeat: join ranks onto edges, aggregate by destination"
pattern every link-analysis / graph-feature pipeline at corpus scale
reduces to.  Same engine shape the reference uses for its one wide
exchange (groupby on a key), just iterated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .relational import distinct, grouped_aggregate, shuffle_hash_join


def _node_shard(ids: np.ndarray, nshards: int) -> np.ndarray:
    """Deterministic splitmix64 shard assignment for integer node ids."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) * np.uint64(_SM_K1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_K2)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_K3)
        z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(nshards)).astype(np.int64)


@ray.remote(num_cpus=1)
class _PageRankShard:
    """One Pregel-style vertex shard: owns ranks for nodes with
    hash(node) % P == sid and all edges whose SOURCE lives here.

    Everything positional is precomputed once in ``finalize``/
    ``set_in_plan`` — each iteration only multiplies, segment-sums, and
    exchanges fixed-order float arrays with peers (no ids on the wire,
    no joins, no per-iteration shuffle).
    """

    def __init__(self, sid: int, nshards: int):
        self.sid, self.P = sid, nshards
        self._node_parts: list[np.ndarray] = []
        self._edge_parts: list[tuple[np.ndarray, np.ndarray]] = []
        self._in_idx: dict[int, np.ndarray] = {}

    def add_nodes(self, ids: np.ndarray) -> None:
        self._node_parts.append(np.asarray(ids, np.int64))

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._edge_parts.append(
            (np.asarray(src, np.int64), np.asarray(dst, np.int64))
        )

    def finalize(self) -> list[tuple[int, np.ndarray]]:
        """Build local index structures; returns the (peer, unique dst
        ids) exchange plan so each peer can precompute ITS receive
        indices — ids cross the wire exactly once, not per iteration."""
        self.nodes = (
            np.unique(np.concatenate(self._node_parts))
            if self._node_parts
            else np.array([], np.int64)
        )
        self._node_parts = []
        if self._edge_parts:
            src = np.concatenate([p[0] for p in self._edge_parts])
            dst = np.concatenate([p[1] for p in self._edge_parts])
        else:
            src = dst = np.array([], np.int64)
        self._edge_parts = []
        # out-degree weights are shard-local (edges sharded by src)
        usrc, inv, cnt = np.unique(src, return_inverse=True, return_counts=True)
        w = 1.0 / cnt[inv]
        # sort by dst once: per-dst partial sums become one reduceat
        order = np.argsort(dst, kind="stable")
        dsts = dst[order]
        self._src_idx = np.searchsorted(self.nodes, src[order])
        self._w = w[order]
        udst, seg_starts = np.unique(dsts, return_index=True)
        self._seg_starts = seg_starts
        dshard = _node_shard(udst, self.P)
        plan = []
        self._out_slices: list[np.ndarray] = []
        for p in range(self.P):
            m = dshard == p
            self._out_slices.append(np.flatnonzero(m))
            plan.append((p, udst[m]))
        return plan

    def set_in_plan(self, from_sid: int, ids: np.ndarray) -> None:
        self._in_idx[from_sid] = np.searchsorted(self.nodes, ids)

    def num_nodes(self) -> int:
        return int(len(self.nodes))

    def seed(self, n_total: int) -> None:
        self.rank = np.full(len(self.nodes), 1.0 / n_total, np.float64)

    def compute_parts(self):
        """Per-dst partial sums, split per owning shard.  Called with
        ``.options(num_returns=P)`` so each part is its own object ref
        — peers fetch their part directly from this actor's node (the
        driver routes refs only, never the floats).  Peer-to-peer
        ``ray.get`` inside actor methods would deadlock single-threaded
        actors all blocked in the same barrier; this ref-routing shape
        can't."""
        if len(self._w):
            contrib = self._w * self.rank[self._src_idx]
            sums = np.add.reduceat(contrib, self._seg_starts)
        else:
            sums = np.array([], np.float64)
        parts = [sums[self._out_slices[p]] for p in range(self.P)]
        return parts[0] if self.P == 1 else tuple(parts)

    def apply_update(self, base: float, damping: float, *incoming) -> None:
        """``incoming`` arrives ordered by sender shard id (fixed-order
        float arrays matching the ``set_in_plan`` id lists)."""
        local = np.zeros(len(self.nodes), np.float64)
        for q, sums in enumerate(incoming):
            if len(sums):
                local[self._in_idx[q]] += sums  # ids unique per sender
        self.rank = base + damping * local

    def result(self) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(self.nodes, pa.int64()),
                "rank": pa.array(self.rank, pa.float64()),
            }
        )


@ray.remote
def _scatter_block(
    tbl: pa.Table, u_col: str, v_col: str, nshards: int
) -> list:
    """One edge block → per-shard (src, dst) arrays + per-shard unique
    endpoint arrays (nodes ride along, no separate pass)."""
    if tbl.num_rows == 0 or u_col not in tbl.column_names:
        # Ray emits zero-column empty blocks on sparse inputs
        z = np.array([], np.int64)
        return [(z, z, z) for _ in range(nshards)]
    src = np.asarray(tbl.column(u_col), np.int64)
    dst = np.asarray(tbl.column(v_col), np.int64)
    sshard = _node_shard(src, nshards)
    out = []
    ends = np.unique(np.concatenate([src, dst]))
    eshard = _node_shard(ends, nshards)
    for p in range(nshards):
        m = sshard == p
        out.append((src[m], dst[m], ends[eshard == p]))
    return out


def pagerank(
    edges: ray.data.Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    num_iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Fixed-iteration PageRank over a directed edge list → one row
    (node, rank) per edge endpoint.

    The simple-sum variant (no dangling-mass redistribution: rank
    flowing into a zero-out-degree node stays there and its own mass
    ``(1-d)/N`` is re-seeded each round) — the convention that keeps
    each iteration SQL-oracle-able by unrolling.  Isolated nodes (no
    incident edge) are absent from the input and the output; union a
    self-loop-free node list upstream if they must be ranked.

    Execution: the one place the Dataset API genuinely can't express
    the semantics well — iterating joins re-exchanges the full edge
    list every round (3 all-to-alls × N iterations).  Instead this is
    a Pregel-style fused iteration over ``num_partitions`` shard
    actors: edges are scattered ONCE by hash(src) (out-degree weights
    then computable shard-locally — no deg join), the (src-shard →
    dst-shard) id lists are exchanged once at setup, and each
    iteration moves only fixed-order FLOAT arrays directly between
    actors (P² small messages, no ids, no shuffle, no driver data
    path).  Per-shard memory is edges/P — the standard distributed
    PageRank memory contract (GraphX/Pregel).  Node ids must be
    integers; hash-partition stringy ids upstream.
    """
    nshards = num_partitions or max(
        2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2)
    )
    shards = [
        _PageRankShard.remote(p, nshards) for p in range(nshards)
    ]

    # one pass over edge blocks: scatter (src,dst) by hash(src) and the
    # block's unique endpoints by hash(node); the driver routes only refs
    pending = []
    for ref in edges.to_arrow_refs():
        pending.append(_scatter_block.remote(ref, u_col, v_col, nshards))
    waits = []
    for parts in pending:
        parts = ray.get(parts)
        for p, (src_p, dst_p, nodes_p) in enumerate(parts):
            if len(src_p):
                waits.append(shards[p].add_edges.remote(src_p, dst_p))
            if len(nodes_p):
                waits.append(shards[p].add_nodes.remote(nodes_p))
    ray.get(waits)

    plans = ray.get([s.finalize.remote() for s in shards])
    waits = []
    for q, plan in enumerate(plans):
        for p, ids in plan:
            waits.append(shards[p].set_in_plan.remote(q, ids))
    ray.get(waits)

    n = sum(ray.get([s.num_nodes.remote() for s in shards]))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )
    ray.get([s.seed.remote(n) for s in shards])
    base = (1.0 - damping) / n

    for _ in range(num_iters):
        # barrier 1: every shard computes its per-peer float parts
        part_refs = [
            s.compute_parts.options(num_returns=nshards).remote()
            if nshards > 1
            else [s.compute_parts.remote()]
            for s in shards
        ]
        # barrier 2: each shard applies the parts addressed to it
        # (refs passed through — Ray moves the floats actor-to-actor)
        ray.get(
            [
                shards[p].apply_update.remote(
                    base, damping, *[part_refs[q][p] for q in range(nshards)]
                )
                for p in range(nshards)
            ]
        )

    refs = [s.result.remote() for s in shards]
    out = ray.data.from_arrow_refs(refs)
    # pin the result before the shard actors die with this frame
    out = out.materialize()
    for s in shards:
        ray.kill(s)
    return out


_TRI_SENTINEL = -(1 << 63)  # int64 min — reserved node id for the
# schema-keeping sentinel row; real graphs never legitimately lose it
# because a (SENT, SENT) closing edge would be a self-loop.

_SM_K1 = 0x9E3779B97F4A7C15
_SM_K2 = 0xBF58476D1CE4E5B9
_SM_K3 = 0x94D049BB133111EB


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit combine of a canonical (a < b) node pair —
    the single-column join key for closing-edge lookups.  splitmix64
    finalizer over a golden-ratio-weighted sum; collisions are possible
    in principle, so every consumer re-verifies both endpoint columns
    after the join (no false triangle can survive)."""
    with np.errstate(over="ignore"):
        z = a.astype(np.uint64) * np.uint64(_SM_K1) + b.astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_K2)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_K3)
        z = z ^ (z >> np.uint64(31))
    return z.view(np.int64)


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-node triangle participation counts over an undirected graph
    given as an edge list (direction and duplicates ignored) → one row
    (node, triangles) per node in at least one triangle.

    Degree-oriented node-iterator (the MapReduce-classic
    Suri–Vassilvitskii shape): canonicalize + dedupe edges, orient each
    edge from its lower-(degree, id) endpoint toward the higher, emit
    the wedge set per oriented source inside one ``groupby``, and close
    each wedge against the canonical edge set with a hash join.  Degree
    orientation is the skew defence: a hub of degree D generates a
    wedge only toward STRICTLY higher-(degree, id) neighbors, so total
    wedge volume is O(m^1.5) and no single group explodes — no salting
    needed even for power-law link graphs.

    Scale contract: the only corpus-wide exchanges are the edge dedupe,
    the degree aggregate + two degree joins, the wedge groupby, and the
    closing hash join — all over NARROW int64 rows; wedges (the one
    super-linear intermediate) stream straight from ``map_groups`` into
    the join without materializing.  Driver state: none.  The join key
    is a 64-bit mixed combine of the pair (``_pair_key``) re-verified
    on both endpoint columns after the join, so hash collisions cannot
    fabricate a triangle.
    """
    node_t = pa.int64()

    def canon(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(u_col), dtype=np.int64)
        v = np.asarray(b.column(v_col), dtype=np.int64)
        keep = u != v  # self-loops close no triangle
        u, v = u[keep], v[keep]
        a = np.minimum(u, v)
        bb = np.maximum(u, v)
        return pa.table({"a": pa.array(a, node_t), "b": pa.array(bb, node_t)})

    ce = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    both = ce.map_batches(
        lambda t: pa.table({"node": t.column("a")}), batch_format="pyarrow"
    ).union(
        ce.map_batches(
            lambda t: pa.table({"node": t.column("b")}), batch_format="pyarrow"
        )
    )
    deg = grouped_aggregate(both, ["node"], [("__deg", "node", "count")])

    with_da = shuffle_hash_join(ce, deg, on="a", right_on="node",
                                num_partitions=num_partitions)

    def keep_da(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "__da": pc.cast(t.column("__deg"), pa.int64())})

    def _schemaful(cols: list[tuple[str, pa.DataType]], fn):
        def g(t: pa.Table) -> pa.Table:
            need = {nm for nm, _ in cols}
            if t.num_rows == 0:
                return pa.table({nm: pa.array([], ty) for nm, ty in cols})
            return fn(t)

        return g

    with_da = with_da.map_batches(
        _schemaful([("a", node_t), ("b", node_t), ("__da", pa.int64())], keep_da),
        batch_format="pyarrow",
    )
    with_db = shuffle_hash_join(with_da, deg, on="b", right_on="node",
                                num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        da = np.asarray(t.column("__da"), dtype=np.int64)
        db = np.asarray(t.column("__deg"), dtype=np.int64)
        # src = lower (degree, id); a < b already, so ties go a -> b
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table({"src": pa.array(src, node_t), "dst": pa.array(dst, node_t)})

    oriented = with_db.map_batches(
        _schemaful([("src", node_t), ("dst", node_t)], orient),
        batch_format="pyarrow",
    )

    def wedges(df) -> pa.Table:
        nb = np.sort(df["dst"].to_numpy(dtype=np.int64))
        i, j = np.triu_indices(len(nb), k=1)
        lo, hi = nb[i], nb[j]  # sorted, so lo < hi = canonical
        # Arrow out (not pandas) so every wedge block shares the
        # sentinel's block type and a metadata-free, hashable schema.
        return pa.table(
            {
                "w_lo": pa.array(lo, node_t),
                "w_hi": pa.array(hi, node_t),
                "apex": pa.array(
                    np.full(len(lo), int(df["src"].iloc[0]), np.int64), node_t
                ),
                "__wk": pa.array(_pair_key(lo, hi), pa.int64()),
            }
        )

    wedge_ds = oriented.groupby("src").map_groups(wedges, batch_format="pandas")

    def edge_keys(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        return pa.table(
            {"e_a": pa.array(a, node_t), "e_b": pa.array(b, node_t),
             "__ek": pa.array(_pair_key(a, b), pa.int64())}
        )

    keyed_edges = ce.map_batches(edge_keys, batch_format="pyarrow")

    # A graph whose every oriented source has <2 higher neighbors (e.g. a
    # star) yields an ALL-empty wedge set; Ray 2.49.2 forwards empty
    # blocks around map UDFs as zero-COLUMN blocks, which crash the hash
    # join ("No match ... FieldRef.Name(__wk)") and strip the output
    # schema.  Union one sentinel wedge AND its matching sentinel edge so
    # exactly one (SENT, SENT, SENT) row survives the join and the
    # aggregate — guaranteeing a schema-ful block end-to-end — then drop
    # it after the aggregate.  No REAL wedge can match the sentinel edge:
    # wedges have strictly lo < hi (dedup + triu k=1) while the sentinel
    # edge needs lo == hi == SENT, and a real (SENT, SENT) edge would be
    # a self-loop, removed by ``canon``.
    sent = np.array([_TRI_SENTINEL], np.int64)
    sent_key = _pair_key(sent, sent)
    sentinel_wedge = ray.data.from_arrow(
        pa.table(
            {
                "w_lo": pa.array(sent, node_t),
                "w_hi": pa.array(sent, node_t),
                "apex": pa.array(sent, node_t),
                "__wk": pa.array(sent_key, pa.int64()),
            }
        )
    )
    sentinel_edge = ray.data.from_arrow(
        pa.table(
            {
                "e_a": pa.array(sent, node_t),
                "e_b": pa.array(sent, node_t),
                "__ek": pa.array(sent_key, pa.int64()),
            }
        )
    )

    closed = shuffle_hash_join(
        wedge_ds.union(sentinel_wedge),
        keyed_edges.union(sentinel_edge),
        on="__wk",
        right_on="__ek",
        num_partitions=num_partitions,
    )

    def verify_and_emit(t: pa.Table) -> pa.Table:
        cols = ("w_lo", "w_hi", "apex", "e_a", "e_b")
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.table({"node": pa.array([], node_t)})
        lo = np.asarray(t.column("w_lo"), dtype=np.int64)
        hi = np.asarray(t.column("w_hi"), dtype=np.int64)
        apex = np.asarray(t.column("apex"), dtype=np.int64)
        ea = np.asarray(t.column("e_a"), dtype=np.int64)
        eb = np.asarray(t.column("e_b"), dtype=np.int64)
        ok = (lo == ea) & (hi == eb)  # kill hash-collision matches
        tri_nodes = np.concatenate([apex[ok], lo[ok], hi[ok]])
        return pa.table({"node": pa.array(tri_nodes, node_t)})

    members = closed.map_batches(verify_and_emit, batch_format="pyarrow")
    counts = grouped_aggregate(
        members, ["node"], [("triangles", "node", "count")]
    )

    def drop_sentinel(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("node"), _TRI_SENTINEL))

    out = counts.map_batches(drop_sentinel, batch_format="pyarrow")
    # Materialize the (narrow: two int64 columns, O(triangle nodes))
    # result so the zero-triangle case can be answered with a schema-ful
    # empty dataset — Ray 2.49.2's aggregate leaves all-empty outputs as
    # zero-COLUMN blocks that lose the frame columns in ``to_pandas``.
    out = out.materialize()
    if out.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], node_t),
                    "triangles": pa.array([], pa.int64()),
                }
            )
        )
    return out


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    max_hops: int,
    undirected: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance, bounded at ``max_hops``.

    The standard distributed frontier expansion (GraphFrames' BFS
    shape): each round hash-joins the frontier onto the edge list
    (all-to-all on node id), dedups the candidates (groupby-min — every
    candidate this round carries the same hop count, so min == any),
    drops already-settled nodes with Ray's native ``left_anti`` shuffle
    join, and unions the fresh nodes into the settled set.  Rounds are
    bounded by ``max_hops`` and each round's result is materialized so
    the lineage stays O(1) deep — the same per-iteration contract as
    ``pagerank``.  BFS-by-rounds guarantees minimality: a node first
    discovered in round ``h`` has no shorter path.

    At corpus scale every structure here (edge list, frontier, settled
    set) stays a hash-partitioned Dataset; nothing is collected to the
    driver.  The per-round anti-join re-shuffles the settled set — the
    accepted cost of bounded-round BFS (settled is narrow: two int64
    columns).

    ``edges``: (u, v) int64 pairs.  ``seeds``: a ``node`` column.
    Returns (node, hops) for every node within ``max_hops`` of any
    seed, seeds included at hops 0.
    """
    if num_partitions is None:
        num_partitions = max(int(ray.cluster_resources().get("CPU", 8)) * 2, 8)

    def orient(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        if undirected:
            return pa.table(
                {"src": np.concatenate([u, v]), "dst": np.concatenate([v, u])}
            )
        return pa.table({"src": u, "dst": v})

    adj = edges.map_batches(orient, batch_format="pyarrow").materialize()

    def seed0(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "hops": pa.array(np.zeros(len(b), np.int64)),
            }
        )

    settled = seeds.map_batches(seed0, batch_format="pyarrow").materialize()
    frontier = settled

    for h in range(1, max_hops + 1):
        nbrs = shuffle_hash_join(
            frontier.select_columns(["node"]),
            adj,
            on="node",
            right_on="src",
            num_partitions=num_partitions,
        )

        def relabel(b: pa.Table, _h: int = h) -> pa.Table:
            d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(d),
                    "hops": pa.array(np.full(len(d), _h, np.int64)),
                }
            )

        # materialize + emptiness check BEFORE the anti join: a frontier
        # with no outgoing edges aggregates to zero-COLUMN empty blocks
        # (Ray 2.49.2) that crash the join's key resolution
        cand = grouped_aggregate(
            nbrs.map_batches(relabel, batch_format="pyarrow"),
            ["node"],
            [("hops", "hops", "min")],
        ).materialize()
        if cand.count() == 0:
            break
        fresh = shuffle_hash_join(
            cand,
            settled.select_columns(["node"]),
            on="node",
            join_type="left_anti",
            num_partitions=num_partitions,
        ).materialize()
        if fresh.count() == 0:
            break
        settled = settled.union(fresh).materialize()
        frontier = fresh

    return settled


def jaccard_link_prediction(
    edges: ray.data.Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    min_common: int = 1,
) -> ray.data.Dataset:
    """Neighbor-set Jaccard link prediction: for every NON-edge pair
    (u, v) sharing at least ``min_common`` neighbors, emit
    ``(u, v, common, jaccard_e4)`` where jaccard = |N(u)∩N(v)| /
    |N(u)∪N(v)| — the classic common-neighbors / Jaccard score used to
    propose missing links (citation suggestion, dedup candidate
    seeding).

    Plan: canonicalize + dedupe edges; per-center wedge enumeration in
    one ``groupby`` (each wedge = one co-neighbor pair, emitted with a
    count of 1); existing edges are unioned into the SAME exchange as
    marker rows (count 0, flag 1), so common-neighbor counting and
    known-edge exclusion cost ONE narrow groupby together.  Degrees
    (16 B/row) are broadcast via ``ray.put`` for the final union-size
    arithmetic — at node counts beyond broadcast reach, swap the map
    for two ``shuffle_hash_join`` passes on u then v.

    Hub caution: wedge volume is Σ deg(w)² over centers.  Unlike
    ``triangle_counts`` this is inherent to the statistic (a hub really
    does make all neighbor pairs candidates); cap or sample hub
    adjacency upstream if the graph is power-law.
    """
    import pandas as pd

    node_t = pa.int64()

    def canon(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(u_col), dtype=np.int64)
        v = np.asarray(b.column(v_col), dtype=np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(u, v), node_t),
                "b": pa.array(np.maximum(u, v), node_t),
            }
        )

    from .relational import distinct

    e = distinct(edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"])
    e = e.materialize()

    def both_ways(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column("a"), dtype=np.int64)
        bb = np.asarray(b.column("b"), dtype=np.int64)
        return pa.table(
            {
                "n": pa.array(np.concatenate([a, bb]), node_t),
                "m": pa.array(np.concatenate([bb, a]), node_t),
            }
        )

    adj = e.map_batches(both_ways, batch_format="pyarrow")

    deg_df = adj.groupby("n").count().to_pandas()
    deg_ref = ray.put(
        dict(
            zip(
                deg_df["n"].to_numpy(np.int64),
                deg_df["count()"].to_numpy(np.int64),
            )
        )
    )

    def wedges(g: pa.Table) -> pa.Table:
        nb = np.sort(np.asarray(g.column("m"), dtype=np.int64))
        k = len(nb)
        if k < 2:
            ii = jj = np.array([], dtype=np.int64)
        else:
            ii, jj = np.triu_indices(k, k=1)
        return pa.table(
            {
                "x": pa.array(nb[ii] if k >= 2 else ii, node_t),
                "y": pa.array(nb[jj] if k >= 2 else jj, node_t),
                "one": pa.array(np.ones(len(ii), dtype=np.int64)),
                "flag": pa.array(np.zeros(len(ii), dtype=np.int64)),
            }
        )

    wedge_rows = adj.groupby("n").map_groups(wedges, batch_format="pyarrow")

    def edge_markers(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": b.column("a"),
                "y": b.column("b"),
                "one": pa.array(np.zeros(len(b), dtype=np.int64)),
                "flag": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )

    unioned = wedge_rows.union(e.map_batches(edge_markers, batch_format="pyarrow"))
    agg = unioned.groupby(["x", "y"]).sum(["one", "flag"])

    def score(b: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        x = np.asarray(b.column("x"), dtype=np.int64)
        y = np.asarray(b.column("y"), dtype=np.int64)
        c = np.asarray(b.column("sum(one)"), dtype=np.int64)
        flag = np.asarray(b.column("sum(flag)"), dtype=np.int64)
        keep = (flag == 0) & (c >= min_common)
        x, y, c = x[keep], y[keep], c[keep]
        du = pd.Series(x).map(deg).to_numpy(np.int64)
        dv = pd.Series(y).map(deg).to_numpy(np.int64)
        union_sz = du + dv - c
        j_e4 = np.floor(10000.0 * c / union_sz + 0.5).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(x, node_t),
                "v": pa.array(y, node_t),
                "common": pa.array(c),
                "jaccard_e4": pa.array(j_e4),
            }
        )

    return agg.map_batches(score, batch_format="pyarrow")


def ancestor_closure(
    edges: ray.data.Dataset,
    *,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> ray.data.Dataset:
    """Transitive closure of a FOREST (one parent per node): every
    (node, ancestor, depth) pair, computed in O(log depth) shuffle
    rounds by pointer doubling instead of O(depth) sequential walks.

    Round k joins the exact-distance-2^k jump edges against all known
    paths of length ≤ 2^k: a path of length 2^k + d (1 ≤ d ≤ 2^k)
    decomposes UNIQUELY at the 2^k mark (single-parent ⇒ unique paths),
    so rounds emit each (node, ancestor) pair exactly once and no
    round-level dedup exchange is needed.  Terminates when no jump
    edges of the next power length exist — ceil(log2(max depth))
    rounds total; at a 10^12-row forest of depth 10^3 that is 10
    bounded hash-join exchanges, never a 10^3-step driver loop.

    The SQL mirror is the classic WITH RECURSIVE ancestor walk.
    """
    from .relational import shuffle_hash_join

    def base(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.compute.cast(b.column(node_col), pa.int64()),
                "anc": pa.compute.cast(b.column(parent_col), pa.int64()),
                "depth": pa.array(np.ones(len(b), np.int64)),
            }
        )

    reach = edges.map_batches(base, batch_format="pyarrow").materialize()
    for k in range(max_rounds):
        step = 1 << k

        def exact(b: pa.Table, _s=step) -> pa.Table:
            t = b.filter(pa.compute.equal(b.column("depth"), pa.scalar(_s)))
            return pa.table({"jnode": t.column("node"), "jmid": t.column("anc")})

        # materialize + empty check BEFORE the join: an all-filtered
        # dataset loses its schema and the hash join rejects it; no
        # exact-2^k paths also means no longer paths can exist — the
        # natural termination.
        jump = reach.map_batches(exact, batch_format="pyarrow").materialize()
        if jump.count() == 0:
            break
        joined = shuffle_hash_join(jump, reach, on="jmid", right_on="node")

        def extend(b: pa.Table, _s=step) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("jnode"),
                    "anc": b.column("anc"),
                    "depth": pa.compute.add(b.column("depth"), pa.scalar(_s)),
                }
            )

        new = joined.map_batches(extend, batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        reach = reach.union(new).materialize()
    return reach


def k_core(
    edges: ray.data.Dataset,
    k: int,
    *,
    u_col: str = "u",
    v_col: str = "v",
    max_rounds: int = 100,
) -> ray.data.Dataset:
    """Nodes of the k-core (maximal subgraph with min degree ≥ k) by
    distributed peeling: each round computes degrees (one narrow
    groupby), keeps nodes with degree ≥ k, and semi-joins the edge list
    against the survivor set on BOTH endpoints (shuffle hash joins —
    the survivor set can be huge, so no broadcast).  Converges when a
    round removes nothing; rounds are bounded by the degeneracy
    ordering depth, typically ≪ max_rounds.  Returns (node)."""
    from .relational import shuffle_hash_join

    def undirect(b: pa.Table) -> pa.Table:
        u = pa.compute.cast(b.column(u_col), pa.int64())
        v = pa.compute.cast(b.column(v_col), pa.int64())
        return pa.table(
            {
                "u": pa.concat_arrays([u.combine_chunks(), v.combine_chunks()]),
                "v": pa.concat_arrays([v.combine_chunks(), u.combine_chunks()]),
            }
        )

    # SET semantics: parallel edges must not inflate degrees
    und = distinct(
        edges.map_batches(undirect, batch_format="pyarrow"), ["u", "v"]
    ).materialize()
    keep = None
    for _ in range(max_rounds):
        deg = und.groupby("u").count().materialize()

        def thresh(b: pa.Table, ge: bool) -> pa.Table:
            cmp = pa.compute.greater_equal if ge else pa.compute.less
            t = b.filter(cmp(b.column("count()"), pa.scalar(k)))
            return pa.table({"node": t.column("u")})

        keep = deg.map_batches(
            lambda b: thresh(b, True), batch_format="pyarrow"
        ).materialize()
        bad = deg.map_batches(lambda b: thresh(b, False), batch_format="pyarrow")
        n_bad = bad.count()
        if keep.count() == 0 or n_bad == 0:
            break
        # Peeling removes FEW nodes per round after the first (bounded
        # by the degeneracy frontier), so the removed set broadcasts
        # and edges filter map-only; the shuffle semi-joins are the
        # fallback when a round's removal set is itself huge.
        if n_bad <= 2_000_000:
            bad_arr = pa.array(
                bad.to_pandas()["node"].to_numpy(), pa.int64()
            )  # bounded by the n_bad guard
            bad_ref = ray.put(bad_arr)

            def drop(b: pa.Table) -> pa.Table:
                bs = ray.get(bad_ref)
                m = pa.compute.and_(
                    pa.compute.invert(pa.compute.is_in(b.column("u"), value_set=bs)),
                    pa.compute.invert(pa.compute.is_in(b.column("v"), value_set=bs)),
                )
                return b.filter(m)

            und = und.map_batches(drop, batch_format="pyarrow").materialize()
        else:
            und = shuffle_hash_join(
                und, keep.map_batches(lambda b: b, batch_format="pyarrow"),
                on="u", right_on="node",
            ).select_columns(["u", "v"])
            und = shuffle_hash_join(
                und, keep.map_batches(lambda b: b, batch_format="pyarrow"),
                on="v", right_on="node",
            ).select_columns(["u", "v"]).materialize()
    # Empty-core guard (same Ray pitfall triangle_counts handles): when
    # peeling empties the edge list, the final groupby emits zero-COLUMN
    # empty blocks and downstream out["node"] would KeyError — pin the
    # schema explicitly.
    if keep is None or keep.count() == 0:
        return ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    return keep
