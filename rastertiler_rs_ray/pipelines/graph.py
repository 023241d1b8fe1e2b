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
    each iteration expressible as exactly one join + one aggregate,
    and therefore SQL-oracle-able by unrolling.  Isolated nodes (no
    incident edge) are absent from the input and the output; union a
    self-loop-free node list upstream if they must be ranked.

    Scale contract: per iteration ONE hash-join exchange
    (weighted edges ⋈ ranks on source) + ONE groupby(dst) sum + ONE
    left join back onto the node set — all distributed, driver state
    is the scalar N.  Ranks are materialized per iteration so lineage
    stays O(1) deep instead of O(iters); blocks live in the object
    store and spill.  Out-degree weights are computed once and the
    weighted edge list reused every round.  (A production variant
    would pin edges and ranks to one co-partitioning to skip the
    re-shuffle per round; Ray's hash join re-exchanges both sides —
    documented cost, same results.)
    """
    nodes = distinct(
        edges.map_batches(
            lambda b: pa.table({"node": b.column(u_col)}), batch_format="pyarrow"
        ).union(
            edges.map_batches(
                lambda b: pa.table({"node": b.column(v_col)}), batch_format="pyarrow"
            )
        ),
        ["node"],
    ).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )
    base = (1.0 - damping) / n

    node_t = nodes.schema().types[0]

    def _empty(names_types: list[tuple[str, pa.DataType]]) -> pa.Table:
        return pa.table({nm: pa.array([], t) for nm, t in names_types})

    deg = grouped_aggregate(edges, [u_col], [("__deg", v_col, "count")])

    def weigh(b: pa.Table) -> pa.Table:
        # Ray's join op can emit zero-row blocks with EMPTY schemas —
        # return a schema-ful empty so downstream unify stays clean.
        if b.num_rows == 0 or "__deg" not in b.column_names:
            return _empty(
                [("__src", node_t), ("__dst", node_t), ("__w", pa.float64())]
            )
        return pa.table(
            {
                "__src": b.column(u_col),
                "__dst": b.column(v_col),
                "__w": pc.divide(
                    pa.scalar(1.0, pa.float64()),
                    pc.cast(b.column("__deg"), pa.float64()),
                ),
            }
        )

    edges_w = shuffle_hash_join(
        edges, deg, on=u_col, num_partitions=num_partitions
    ).map_batches(weigh, batch_format="pyarrow").materialize()

    def seed(batch: pa.Table) -> pa.Table:
        r = np.full(batch.num_rows, 1.0 / n)
        return batch.append_column("rank", pa.array(r, pa.float64()))

    ranks = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def spread(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rank" not in b.column_names:
            return _empty([("__dst", node_t), ("__c", pa.float64())])
        return pa.table(
            {
                "__dst": b.column("__dst"),
                "__c": pc.multiply(b.column("rank"), b.column("__w")),
            }
        )

    def update(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return _empty([("node", node_t), ("rank", pa.float64())])
        s = (
            pc.fill_null(pc.cast(batch.column("__s"), pa.float64()), 0.0)
            if "__s" in batch.column_names
            else pa.array(np.zeros(batch.num_rows), pa.float64())
        )
        r = pc.add(
            pa.scalar(base, pa.float64()),
            pc.multiply(pa.scalar(float(damping), pa.float64()), s),
        )
        return pa.table({"node": batch.column("node"), "rank": r})

    for _ in range(num_iters):
        contrib = shuffle_hash_join(
            edges_w, ranks, on="__src", right_on="node",
            num_partitions=num_partitions,
        ).map_batches(spread, batch_format="pyarrow")
        sums = grouped_aggregate(contrib, ["__dst"], [("__s", "__c", "sum")])
        joined = shuffle_hash_join(
            nodes, sums, on="node", right_on="__dst",
            join_type="left_outer", num_partitions=num_partitions,
        )
        ranks = joined.map_batches(update, batch_format="pyarrow").materialize()

    return ranks


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
