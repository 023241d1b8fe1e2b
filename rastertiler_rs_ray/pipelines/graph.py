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
