"""Approximate-nearest-neighbor search over an embedding column.

Two paths, same contract (query set × corpus → top-k by cosine):

- ``brute_force_topk`` — the exactness baseline.  Query matrix is
  normalized once and ``ray.put`` ONCE; every batch does a single
  numpy matmul (corpus_batch × queries.T) and a per-batch partial
  top-k; the driver heap-merges the tiny partials.  No shuffle; scales
  linearly in corpus size and is embarrassingly parallel — the pattern
  of the reference's broadcast-side lookup (SURVEY §2.4 J2).
- ``ivf_topk`` — the scale path: k-means-style coarse quantizer
  (trained on a driver-side sample), corpus bucketed by nearest
  centroid in one map pass, queries probe ``nprobe`` nearest cells so
  only ~nprobe/nlist of the corpus is scanned.  Recall is tested
  against the brute-force baseline.

Embeddings ride as Arrow ``list<float>`` → zero-copy flatten to an
(n, dim) float matrix per batch; all scoring is one BLAS call.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _as_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    n = len(batch)
    flat = np.asarray(batch.column(vec_col).combine_chunks().flatten(), dtype=np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _merge_partials(rows: list[dict], k: int) -> pa.Table:
    """Heap-merge per-batch partial top-k lists into global top-k/query."""
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append((r["score"], r["neighbor_id"]))
    q_out, n_out, s_out, rank_out = [], [], [], []
    for q in sorted(per_query):
        top = heapq.nlargest(k, per_query[q], key=lambda t: (t[0], -t[1] if isinstance(t[1], int) else 0))
        for rank, (s, nid) in enumerate(top, 1):
            q_out.append(q)
            n_out.append(nid)
            s_out.append(s)
            rank_out.append(rank)
    return pa.table(
        {
            "query_id": pa.array(q_out),
            "neighbor_id": pa.array(n_out),
            "score": pa.array(s_out, pa.float64()),
            "rank": pa.array(rank_out, pa.int32()),
        }
    )


def _query_state(queries: pa.Table, vec_col: str, query_id_col: str) -> dict:
    return {
        "qm": _normalize(_as_matrix(queries, vec_col)),
        "qids": np.asarray(queries.column(query_id_col)),
        "qid_type": queries.column(query_id_col).type,
    }


def _probe_lut(probe: np.ndarray, n_codes: int) -> np.ndarray:
    """(n_codes, nq) bool membership table from per-query probe lists —
    lets the scorer derive the (rows, nq) probe mask with one fancy
    index instead of a (rows, nq, n_probe) broadcast."""
    nq = probe.shape[0]
    lut = np.zeros((n_codes, nq), dtype=bool)
    lut[probe.ravel(), np.repeat(np.arange(nq), probe.shape[1])] = True
    return lut


def _scan_topk(
    ds: ray.data.Dataset,
    state: dict,
    *,
    k: int,
    vec_col: str,
    id_col: str,
    exclude_self: bool,
    mask_fn=None,
) -> pa.Table:
    """Shared ANN scan: per-batch (pruned) matmul + partial top-k,
    driver heap-merge of the tiny partials.

    ``mask_fn(state, batch, cm) -> (row_keep | None, probed | None)``
    supplies the bucketed paths' probe mask; rows outside every query's
    probe set are DROPPED before the matmul, so the scored fraction
    really is |probe set| / n_buckets, not a post-hoc mask over a full
    brute-force scan.  Empty and fully-pruned batches return an empty
    block with a stable schema."""
    ref = ray.put(state)

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        qmat, qid = st["qm"], st["qids"]
        nid_type = batch.column(id_col).type

        def empty() -> pa.Table:
            return pa.table(
                {
                    "query_id": pa.array([], st["qid_type"]),
                    "neighbor_id": pa.array([], nid_type),
                    "score": pa.array([], pa.float64()),
                }
            )

        if len(batch) == 0:
            return empty()
        cm = _normalize(_as_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        probed = None
        if mask_fn is not None:
            row_keep, probed = mask_fn(st, batch, cm)
            if row_keep is not None:
                cm, ids = cm[row_keep], ids[row_keep]
                if probed is not None:
                    probed = probed[row_keep]
            if cm.shape[0] == 0:
                return empty()
        sims = cm @ qmat.T  # (rows, nq)
        if probed is not None:
            sims[~probed] = -np.inf
        if exclude_self:
            sims[ids[:, None] == qid[None, :]] = -np.inf
        kk = min(k, sims.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        nq = sims.shape[1]
        out_q = np.repeat(qid, kk)
        out_n = ids[part.T.reshape(-1)]
        out_s = sims[part.T.reshape(-1), np.repeat(np.arange(nq), kk)]
        keep = np.isfinite(out_s)
        return pa.table(
            {
                "query_id": pa.array(out_q[keep], st["qid_type"]),
                "neighbor_id": pa.array(out_n[keep], nid_type),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_partials(rows, k)


def brute_force_topk(
    corpus: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k: broadcast queries, per-batch matmul + partial
    top-k, driver heap-merge.  Returns (query_id, neighbor_id, score, rank)."""
    state = _query_state(queries, vec_col, query_id_col)
    return _scan_topk(
        corpus, state, k=k, vec_col=vec_col, id_col=id_col, exclude_self=exclude_self
    )


def label_centroids(
    corpus: ray.data.Dataset,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-label mean vector in long format (label, dim, psum, pcnt → mean).

    Map-side partial: each block contributes one (label, dim) sum/count
    row pair per label it sees — the exchange moves labels × dim rows
    per block, never the vectors themselves.  The final combine is a
    tiny grouped sum.  This is the vector analogue of grouped_aggregate
    and stays a streaming pass at 10^12 rows.
    """
    from .relational import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch, vec_col)  # (n, dim) float64
        labels = batch.column(label_col).to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        dim = mat.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq.astype(np.int64), dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq))),
                "psum": pa.array(sums.ravel(), pa.float64()),
                "pcnt": pa.array(np.repeat(counts, dim)),
            }
        )

    agg = grouped_aggregate(
        corpus.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("s", "psum", "sum"), ("c", "pcnt", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy()
        c = batch.column("c").to_numpy()
        mean_e4 = np.round(s / c * 1e4).astype(np.int64)
        return pa.table(
            {
                "label": batch.column("label"),
                "dim": batch.column("dim"),
                "mean_e4": pa.array(mean_e4),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def train_centroids(
    corpus: ray.data.Dataset,
    *,
    nlist: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample (coarse quantizer).

    At 100 TB the sample is still driver-sized — the quantizer is tiny
    state broadcast to all scan tasks.
    """
    rows = corpus.limit(sample).take_all()
    x = _normalize(np.asarray([r[vec_col] for r in rows], dtype=np.float64))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(
    corpus: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """IVF-style ANN: bucket corpus by nearest centroid, scan only the
    ``nprobe`` cells nearest each query.

    One map pass assigns cells; rows whose cell no query probes are
    dropped before the matmul (only the cell assignment touches them),
    and at scale the cell id becomes the Parquet partition key so
    unprobed cells are never read at all (``build_ivf_index``).
    """
    if centroids is None:
        centroids = train_centroids(corpus, nlist=nlist, vec_col=vec_col)
    state = _query_state(queries, vec_col, query_id_col)
    probe = np.argsort(-(state["qm"] @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    state["cents"] = centroids
    state["lut"] = _probe_lut(probe, len(centroids))

    def mask(st: dict, batch: pa.Table, cm: np.ndarray):
        cell = np.argmax(cm @ st["cents"].T, axis=1)  # (rows,)
        probed = st["lut"][cell]  # (rows, nq)
        return probed.any(axis=1), probed

    return _scan_topk(
        corpus, state, k=k, vec_col=vec_col, id_col=id_col,
        exclude_self=exclude_self, mask_fn=mask,
    )


def build_ivf_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    *,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the IVF index: corpus written to Parquet
    hive-partitioned by nearest-centroid cell (one pass), quantizer
    saved alongside.  This is the scale path ``ivf_topk``'s docstring
    promises — at 100 TB the index is built once and every query set
    after that reads only its probed partitions."""
    import os

    if centroids is None:
        centroids = train_centroids(corpus, nlist=nlist, vec_col=vec_col)
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    cents_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        cm = _normalize(_as_matrix(batch, vec_col))
        cell = np.argmax(cm @ cents.T, axis=1).astype(np.int32)
        t = batch.select([id_col, vec_col])
        # cell stored BOTH as partition key (pruning) and column (the
        # probe mask needs it without re-deriving per row)
        t = t.append_column("cell", pa.array(cell))
        return t.append_column("__cell", pa.array(cell))

    corpus.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "cells"), partition_cols=["__cell"]
    )
    return centroids


def ivf_topk_indexed(
    index_dir: str,
    queries: pa.Table,
    *,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
    stats: dict | None = None,
) -> pa.Table:
    """ANN over a ``build_ivf_index`` layout: ONLY the partitions probed
    by some query are read from storage — genuine partition pruning,
    the remaining cells never leave disk.  ``stats`` receives
    {partitions_read, partitions_total, rows_read}."""
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    state = _query_state(queries, vec_col, query_id_col)
    qm = state["qm"]
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)

    cells_root = os.path.join(index_dir, "cells")
    all_parts = sorted(d for d in os.listdir(cells_root) if d.startswith("__cell="))
    wanted = set(int(c) for c in probe.ravel())
    part_files = [
        os.path.join(cells_root, d, f)
        for d in all_parts
        if int(d.split("=", 1)[1]) in wanted
        for f in sorted(os.listdir(os.path.join(cells_root, d)))
        if f.endswith(".parquet")
    ]
    if stats is not None:
        import pyarrow.dataset as pads

        stats.update(
            partitions_read=sum(
                1 for d in all_parts if int(d.split("=", 1)[1]) in wanted
            ),
            partitions_total=len(all_parts),
            rows_read=(
                pads.dataset(part_files, format="parquet").count_rows()
                if part_files
                else 0
            ),
        )
    if not part_files:
        return _merge_partials([], k)

    state["lut"] = _probe_lut(probe, len(centroids))

    def mask(st: dict, batch: pa.Table, cm: np.ndarray):
        cell = batch.column("cell").to_numpy()
        probed = st["lut"][cell]  # (rows, nq)
        return probed.any(axis=1), probed

    return _scan_topk(
        ray.data.read_parquet(part_files, columns=[id_col, vec_col, "cell"]),
        state, k=k, vec_col=vec_col, id_col=id_col,
        exclude_self=exclude_self, mask_fn=mask,
    )


def lsh_topk(
    corpus: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
    bits: int = 6,
    hamming_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
    seed: int = 11,
) -> pa.Table:
    """Random-hyperplane LSH-bucketed ANN (the SimHash-style scale path,
    complementing ``ivf_topk``).

    ``bits`` signed projections hash every vector to a 2^bits bucket
    code; each query multi-probes its own bucket plus all codes within
    Hamming distance ``hamming_probe`` (flipped-bit neighborhood), so a
    corpus row is scored only when its code lands in some query's probe
    set — the expected scan fraction is |probe set| / 2^bits.  Unlike
    IVF there is NO training pass: the hyperplanes are seeded constants,
    which makes the bucket assignment reproducible across runs and
    engines (the property the dedup family's SimHash relies on too).
    At scale the bucket code becomes the Parquet partition key exactly
    as ``build_ivf_index`` does for cells.

    Recall is tested against ``brute_force_topk`` (same contract as the
    IVF path).
    """
    from itertools import combinations

    if not 0 <= hamming_probe <= bits:
        raise ValueError(f"hamming_probe must be in [0, {bits}], got {hamming_probe}")
    rng = np.random.RandomState(seed)
    dim = _as_matrix(queries.slice(0, 1), vec_col).shape[1]
    planes = rng.standard_normal((dim, bits))

    state = _query_state(queries, vec_col, query_id_col)
    state["planes"] = planes
    state["bits"] = bits
    qcode = _lsh_codes(state["qm"], planes, bits)  # (nq,)
    # multi-probe neighborhood: own code + every code within the full
    # Hamming ball of radius `hamming_probe` (any radius up to `bits`)
    probes = [qcode]
    for r in range(1, hamming_probe + 1):
        for flip_bits in combinations(range(bits), r):
            m = 0
            for b in flip_bits:
                m |= 1 << b
            probes.append(qcode ^ m)
    probe = np.stack(probes, axis=1)  # (nq, n_probe)
    state["lut"] = _probe_lut(probe, 1 << bits)

    def mask(st: dict, batch: pa.Table, cm: np.ndarray):
        code = _lsh_codes(cm, st["planes"], st["bits"])
        probed = st["lut"][code]  # (rows, nq)
        return probed.any(axis=1), probed

    return _scan_topk(
        corpus, state, k=k, vec_col=vec_col, id_col=id_col,
        exclude_self=exclude_self, mask_fn=mask,
    )


def _lsh_codes(mat: np.ndarray, planes: np.ndarray, bits: int) -> np.ndarray:
    sgn = (mat @ planes) > 0  # (n, bits)
    return (sgn.astype(np.int64) << np.arange(bits, dtype=np.int64)).sum(axis=1)


def kmeans_centroids(
    corpus: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd k-means centroid training (the first half of
    ``kmeans_clusters``, reusable by SemDeDup-style consumers): returns
    the k x dim centroid matrix; only centroid state ever reaches the
    driver.  See ``kmeans_clusters`` for the topology notes."""
    return _kmeans_train(corpus, k=k, iters=iters, vec_col=vec_col, id_col=id_col)[1]


def kmeans_clusters(
    corpus: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Distributed Lloyd k-means over the FULL corpus, returning the
    per-vector cluster assignment (id_col, cluster) — the clustering
    stage of embedding-based corpus curation (cluster-balanced
    sampling, near-dup pruning, domain discovery).

    Unlike ``train_centroids`` (driver-side sample for the IVF coarse
    quantizer), every pass here is distributed and centroid state is
    the ONLY driver/broadcast payload (k × dim floats):

    - init: the k vectors with smallest ``id_col`` (deterministic),
      found via block-local partial k-smallest — the driver pull is
      blocks × k rows, never the corpus;
    - each iteration: one ``map_batches`` pass emits (cluster, dim,
      psum, pcnt) partial rows (k·dim per block, the vector analogue of
      a map-side combine) → tiny grouped sum → new centroids broadcast
      via ``ray.put``;
    - final pass assigns every vector (argmin of squared L2; ties →
      lowest cluster index).

    Centroids are rounded to the 1e-9 grid after every update so the
    result is invariant to block layout and float summation order
    (absorbed ulps), making assignments reproducible run to run.
    """
    import ray as _ray

    corpus, cents = _kmeans_train(
        corpus, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )

    ref = _ray.put(cents)

    def assign_final(batch: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        if len(batch) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        mat = _as_matrix(batch, vec_col)
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return corpus.map_batches(assign_final, batch_format="pyarrow")


def _kmeans_train(
    corpus: ray.data.Dataset,
    *,
    k: int,
    iters: int,
    vec_col: str,
    id_col: str,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Shared k-means training loop: returns (materialized narrow
    corpus, k x dim centroid matrix).  Topology documented on
    ``kmeans_clusters``."""
    import ray as _ray

    from .relational import grouped_aggregate

    corpus = corpus.select_columns([id_col, vec_col]).materialize()

    def init_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        if len(ids) == 0:
            return batch
        sel = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(sel))

    seed = (
        corpus.map_batches(init_partial, batch_format="pyarrow")
        .to_pandas()  # blocks x k rows, driver-bounded
        .sort_values(id_col)
        .head(k)
    )
    cents = np.round(
        np.asarray([np.asarray(v, dtype=np.float64) for v in seed[vec_col]]) * 1e9
    ) / 1e9

    def sums_partial(ref):
        def f(batch: pa.Table) -> pa.Table:
            c = _ray.get(ref)
            if len(batch) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "psum": pa.array([], pa.float64()),
                        "pcnt": pa.array([], pa.int64()),
                    }
                )
            mat = _as_matrix(batch, vec_col)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1).astype(np.int64)
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            dim = mat.shape[1]
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(np.arange(len(c), dtype=np.int64), dim)),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(c))),
                    "psum": pa.array(sums.ravel(), pa.float64()),
                    "pcnt": pa.array(np.repeat(counts, dim)),
                }
            )

        return f

    for _ in range(iters):
        ref = _ray.put(cents)
        agg = grouped_aggregate(
            corpus.map_batches(sums_partial(ref), batch_format="pyarrow"),
            ["cluster", "dim"],
            [("s", "psum", "sum"), ("c", "pcnt", "sum")],
        ).to_pandas()  # k x dim rows
        agg = agg.sort_values(["cluster", "dim"])
        s = agg["s"].to_numpy().reshape(len(cents), -1)
        n = agg["c"].to_numpy().reshape(len(cents), -1)
        upd = np.where(n > 0, s / np.maximum(n, 1), cents)
        cents = np.round(upd * 1e9) / 1e9  # absorb summation-order ulps

    return corpus, cents


# --------------------------------------------------- product quantization


def train_pq_codebooks(
    corpus: ray.data.Dataset,
    *,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., PQ): split
    the (normalized) vector into ``m`` contiguous subspaces and run
    Lloyd k-means with ``ks`` centroids independently in each.

    Like ``train_centroids``, training is a driver-side sample — the
    codebook is tiny broadcast state (m × ks × dim/m floats); at 100 TB
    the sample is still driver-sized.  Returns (m, ks, dsub) float64.
    Requires dim % m == 0.

    Seeding is k-means++ (D² sampling): an already-covered subvector
    has distance 0 and can never be re-picked, so when a subspace holds
    ≤ ks distinct values the init recovers every one of them and Lloyd
    converges to the lossless codebook — the property the exactness
    test pins.  Random init would almost surely seed duplicate points
    and strand empty clusters.
    """
    rows = corpus.limit(sample).take_all()
    x = _normalize(np.asarray([r[vec_col] for r in rows], dtype=np.float64))
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)

    def _kmeanspp(sub: np.ndarray, k: int) -> np.ndarray:
        cents = [sub[rng.randint(len(sub))]]
        d2 = ((sub - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            tot = d2.sum()
            if tot <= 0.0:  # fewer distinct points than k: duplicate
                cents.append(cents[-1])
                continue
            pick = sub[rng.choice(len(sub), p=d2 / tot)]
            cents.append(pick)
            d2 = np.minimum(d2, ((sub - pick) ** 2).sum(axis=1))
        return np.asarray(cents)

    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = _kmeanspp(sub, min(ks, n))
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if len(cents) < ks:  # sample smaller than ks: pad by repetition
            cents = np.vstack([cents] * (ks // len(cents) + 1))[:ks]
        books[j] = cents
    return books


def pq_encode(
    corpus: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Compress the corpus to PQ codes: (id_col, code list<uint8> of m).

    One map pass; per batch the per-subspace assignment is a single
    argmin over squared L2 (vectorized).  The codes dataset is what a
    100 TB deployment persists and scans — m bytes/vector instead of
    4·dim; the float embeddings never leave the encode stage.
    """
    m, ks, dsub = codebooks.shape
    ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(ref)
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "code": pa.array([], pa.list_(pa.uint8(), m)),
                }
            )
        x = _normalize(_as_matrix(batch, vec_col))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cents = books[j]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()), m
                ),
            }
        )

    return corpus.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    corpus: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
    codebooks: np.ndarray | None = None,
) -> pa.Table:
    """PQ asymmetric-distance top-k: train codebooks (driver sample),
    compress the corpus to uint8 codes in one map pass, then scan the
    CODES — never the floats — with per-query lookup tables.

    ADC scoring: cosine(q, x) ≈ q · recon(x) = Σ_j (q_subj · c_j[code_j]),
    so each query precomputes an (m, ks) inner-product table and a
    batch's scores are one fancy-gather + sum over the uint8 codes
    (``np.take_along_axis``) — no per-row Python, no float vectors in
    the scan.  This is the memory-scale path for embeddings: the scan
    input is m bytes/vector (64 B vs 3 KB at dim=768 float32), letting
    a 100 TB embedding corpus fit hot in the object store.  Recall vs
    ``brute_force_topk`` is pinned in tests; exact when every subspace
    has ≤ ks distinct subvectors.

    Returns (query_id, neighbor_id, score, rank) like the other paths.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, m=m, ks=ks, vec_col=vec_col, sample=2048
        )
    m, ks, dsub = codebooks.shape
    st = _query_state(queries, vec_col, query_id_col)
    qm = st["qm"]  # (nq, dim) normalized
    # (nq, m, ks) inner-product tables: lut[q, j, c] = q_subj · books[j, c]
    lut = np.einsum("qjd,jcd->qjc", qm.reshape(len(qm), m, dsub), codebooks)
    ref = ray.put({"lut": lut, "qids": st["qids"], "qid_type": st["qid_type"]})

    codes_ds = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        tab, qid = s["lut"], s["qids"]
        nid_type = batch.column(id_col).type if len(batch.column_names) else pa.int64()
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], s["qid_type"]),
                    "neighbor_id": pa.array([], nid_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        codes = np.asarray(
            batch.column("code").combine_chunks().flatten(), dtype=np.int64
        ).reshape(len(batch), m)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # gather: (1, nq, m, ks) along last axis with (rows, 1, m, 1)
        sims = np.take_along_axis(
            tab[None, :, :, :], codes[:, None, :, None], axis=3
        ).sum(axis=2)[..., 0]  # (rows, nq)
        if exclude_self:
            sims[ids[:, None] == qid[None, :]] = -np.inf
        kk = min(k, sims.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        nq = sims.shape[1]
        out_q = np.repeat(qid, kk)
        out_n = ids[part.T.reshape(-1)]
        out_s = sims[part.T.reshape(-1), np.repeat(np.arange(nq), kk)]
        keep = np.isfinite(out_s)
        return pa.table(
            {
                "query_id": pa.array(out_q[keep], s["qid_type"]),
                "neighbor_id": pa.array(out_n[keep], nid_type),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    rows = codes_ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_partials(rows, k)


# ------------------------------------------------------- distributed PCA


def pca_train(
    corpus: ray.data.Dataset,
    *,
    n_components: int = 8,
    vec_col: str = "embedding",
) -> dict:
    """Exact distributed PCA over the FULL corpus via second-moment
    partials: each block emits its (dim × dim) scatter ``XᵀX``, row sum
    and count — the classic map-side combine where the exchange is
    O(blocks · dim²) regardless of corpus size — and the driver solves
    the dim × dim eigenproblem (dim is model-sized, never data-sized).

    Eigenvector sign is fixed deterministically (largest-|component|
    coordinate made positive) so the model is reproducible across
    block layouts.  Returns {"mean": (dim,), "components": (k, dim),
    "explained_var": (k,)} — tiny broadcast state for ``pca_project``.
    """

    def partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "i": pa.array([], pa.int64()),
                    "vals": pa.array([], pa.list_(pa.float64())),
                }
            )
        x = _as_matrix(batch, vec_col)
        dim = x.shape[1]
        scatter = x.T @ x  # (dim, dim)
        rows = {
            "kind": ["s"] * dim + ["m", "n"],
            "i": list(range(dim)) + [0, 0],
            "vals": [scatter[i].tolist() for i in range(dim)]
            + [x.sum(axis=0).tolist(), [float(len(x))]],
        }
        return pa.table(
            {
                "kind": pa.array(rows["kind"], pa.string()),
                "i": pa.array(rows["i"], pa.int64()),
                "vals": pa.array(rows["vals"], pa.list_(pa.float64())),
            }
        )

    # blocks × (dim + 2) narrow rows; summed per (kind, i) off-driver
    def combine(df):
        import pandas as _pd

        out = (
            df.assign(vals=df["vals"].map(np.asarray))
            .groupby(["kind", "i"], sort=False)["vals"]
            .apply(lambda s: np.sum(np.stack(s.to_numpy()), axis=0))
            .reset_index()
        )
        return _pd.DataFrame(
            {"kind": out["kind"], "i": out["i"], "vals": out["vals"].map(list)}
        )

    agg = (
        corpus.map_batches(partials, batch_format="pyarrow")
        .groupby(["kind", "i"])
        .map_groups(combine, batch_format="pandas")
        .to_pandas()  # (dim + 2) rows x dim floats — model-sized
    )
    n = float(agg.loc[agg["kind"] == "n", "vals"].iloc[0][0])
    mean = np.asarray(agg.loc[agg["kind"] == "m", "vals"].iloc[0]) / n
    srows = agg[agg["kind"] == "s"].sort_values("i")
    scatter = np.stack(srows["vals"].map(np.asarray).to_numpy())
    cov = scatter / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-w)[:n_components]
    comps = v[:, order].T  # (k, dim)
    flip = np.sign(comps[np.arange(len(comps)), np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": np.maximum(w[order], 0.0),
    }


def pca_project(
    corpus: ray.data.Dataset,
    model: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> ray.data.Dataset:
    """Project every vector onto the PCA components (map-only; the
    model rides the object store once via ``ray.put``)."""
    ref = ray.put((model["mean"], model["components"]))
    k = model["components"].shape[0]

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.list_(pa.float64(), k)),
                }
            )
        x = _as_matrix(batch, vec_col)
        proj = (x - mean) @ comps.T  # (n, k)
        return pa.table(
            {
                id_col: batch.column(id_col),
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(proj.ravel(), pa.float64()), k
                ),
            }
        )

    return corpus.map_batches(project, batch_format="pyarrow")


# ------------------------------------------- similarity threshold join


def similarity_threshold_join(
    corpus: ray.data.Dataset,
    probes: pa.Table,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Cosine-similarity threshold join of a streaming corpus against a
    broadcast probe table: every (corpus row, probe row) pair with
    ``cosine > threshold``.  The "match against a fixed reference set"
    primitive — blocklist screening, eval-set contamination by
    embedding, linking a corpus to a small curated index.

    Unlike the top-k scans this is a JOIN (unbounded matches per
    probe), so it returns a Dataset, not a merged driver table.

    Scale contract: map-only, zero shuffle.  The probe matrix is
    normalized once and rides the object store via ``ray.put``
    (probe-sized, read zero-copy per task); each batch is one
    (rows × nprobe) matmul + one boolean mask — no per-row Python.
    The probe side must be broadcast-sized (≤ ~10⁶ rows); corpus-scale
    both sides is the LSH self-join family (``embedding_cosine_dedup``).
    """
    st = _query_state(probes, vec_col, probe_id_col)
    ref = ray.put({"qm": st["qm"], "qids": st["qids"]})
    qid_type = st["qid_type"]

    def match(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        nid_type = (
            batch.column(id_col).type if id_col in batch.column_names else pa.int64()
        )
        empty = pa.table(
            {
                id_col: pa.array([], nid_type),
                "probe_id": pa.array([], qid_type),
                "sim_e9": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        xn = _normalize(_as_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col))
        sims = xn @ s["qm"].T  # (rows, nprobe)
        hit = sims > threshold
        if exclude_self:
            hit &= ids[:, None] != s["qids"][None, :]
        r, c = np.nonzero(hit)
        if len(r) == 0:
            return empty
        return pa.table(
            {
                id_col: pa.array(ids[r], nid_type),
                "probe_id": pa.array(s["qids"][c], qid_type),
                # scaled-integer similarity: exact to hash-compare
                "sim_e9": pa.array(
                    np.floor(sims[r, c] * 1e9 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return corpus.map_batches(match, batch_format="pyarrow")


def quantize_embeddings_int8(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Row-wise symmetric int8 quantization of an embedding column —
    the standard 4x shrink before ANN index build / shipping vectors
    across the wire: per-vector ``scale = max|x| / 127`` and
    ``q = floor(x / scale + 0.5)`` ∈ [-127, 127].  Output is EXPLODED
    to ``(id, dim, q)`` scalar rows so the result is engine-agnostic
    (list-value reprs differ across Arrow/pandas/DuckDB; scalars hash
    identically).

    Determinism: all arithmetic is float64 (float32 inputs promote
    exactly), and the half-up rule ``floor(x*127/m + 0.5)`` is spelled
    identically in numpy and SQL — no round()-convention coupling.
    All-zero vectors quantize to all-zero rows.

    Scale contract: map-only (the per-vector max needs no aggregate),
    zero-copy Arrow list offsets, one vectorized ``reduceat`` per
    batch — no Python loop, no shuffle, embarrassingly resumable.
    """

    def quant(t: pa.Table) -> pa.Table:
        return _quantize_int8_table(t, vec_col=vec_col, id_col=id_col)

    return ds.map_batches(quant, batch_format="pyarrow")


def _quantize_int8_chunk(
    ids_chunk: np.ndarray, arr: pa.ListArray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize one ListArray chunk → (ids, dims, q) int64 arrays.

    Handles SLICED chunks zero-copy: a sliced ListArray's ``.offsets``
    don't start at 0 and ``.values`` spans the parent buffer, so the
    offsets are rebased to the slice's own window instead of indexing
    the parent raw.
    """
    flat = np.asarray(arr.values, dtype=np.float64)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    flat = flat[offs[0] : offs[-1]]
    offs = offs - offs[0]
    if len(flat) == 0:
        z = np.array([], np.int64)
        return z, z, z
    lens = np.diff(offs)
    ids = np.repeat(ids_chunk, lens)
    dims = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(
        offs[:-1], lens
    )
    # segment absmax; clip start indices so empty rows (dropped by
    # the repeat anyway) cannot push reduceat out of bounds
    starts = np.minimum(offs[:-1], len(flat) - 1)
    mx = np.maximum.reduceat(np.abs(flat), starts)
    mx_rep = np.repeat(mx, lens)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(flat * 127.0 / mx_rep + 0.5)
    q = np.where(mx_rep == 0.0, 0.0, q).astype(np.int64)
    return ids, dims, q


def _quantize_int8_table(
    t: pa.Table, *, vec_col: str, id_col: str
) -> pa.Table:
    """Per-batch kernel of ``quantize_embeddings_int8``: per-chunk
    zero-copy (no combine_chunks copy of the embedding buffer)."""
    ids_all = np.asarray(t.column(id_col), dtype=np.int64)
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    row0 = 0
    for chunk in t.column(vec_col).chunks:
        n = len(chunk)
        if n:
            parts.append(
                _quantize_int8_chunk(ids_all[row0 : row0 + n], chunk)
            )
        row0 += n
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            id_col: pa.array(np.concatenate([p[0] for p in parts]), pa.int64()),
            "dim": pa.array(np.concatenate([p[1] for p in parts]), pa.int64()),
            "q": pa.array(np.concatenate([p[2] for p in parts]), pa.int64()),
        }
    )


def mmr_rerank(
    corpus: ray.data.Dataset,
    query: np.ndarray,
    *,
    k: int = 10,
    pool: int = 100,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998) — the diversity-aware re-ranker: greedily pick k items
    maximizing lam·sim(q, d) − (1−lam)·max_{s∈selected} sim(d, s).

    Two-stage shape, like every production re-ranker: the DISTRIBUTED
    stage reduces the corpus to a ``pool``-sized candidate set by
    query cosine (per-block top-k partials, the ``top_k`` topology —
    k×blocks rows ever reach the driver); the greedy MMR loop then
    runs on that bounded pool (O(pool²·dim) driver math).  Ties break
    by lowest id.  Returns (rank, id, score_e6).
    """
    from .relational import top_k as _top_k

    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    q_ref = ray.put(q)

    def scored(b: pa.Table) -> pa.Table:
        qq = ray.get(q_ref)
        if len(b) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "simq": pa.array([], pa.float64()),
                    "vec": pa.array([], pa.binary()),
                }
            )
        m = _normalize(_as_matrix(b, vec_col))
        return pa.table(
            {
                id_col: b.column(id_col),
                "simq": pa.array(m @ qq, pa.float64()),
                "vec": pa.array([r.tobytes() for r in m], pa.binary()),
            }
        )

    cand = _top_k(
        corpus.map_batches(scored, batch_format="pyarrow"), pool, "simq"
    )
    ids = cand.column(id_col).to_numpy()
    simq = cand.column("simq").to_numpy()
    vecs = np.stack(
        [np.frombuffer(v, dtype=np.float64) for v in cand.column("vec").to_pylist()]
    )
    order = np.lexsort((ids, -simq))
    ids, simq, vecs = ids[order], simq[order], vecs[order]
    n = len(ids)
    selected: list[int] = []
    max_sim_sel = np.full(n, -np.inf)
    taken = np.zeros(n, dtype=bool)
    out_rank, out_id, out_score = [], [], []
    for rank in range(min(k, n)):
        if selected:
            score = lam * simq - (1.0 - lam) * max_sim_sel
        else:
            score = lam * simq
        score = np.where(taken, -np.inf, score)
        best = int(np.lexsort((ids, -score))[0])
        taken[best] = True
        selected.append(best)
        out_rank.append(rank + 1)
        out_id.append(int(ids[best]))
        out_score.append(int(np.floor(score[best] * 1e6 + 0.5)))
        sim_to_best = vecs @ vecs[best]
        max_sim_sel = np.maximum(max_sim_sel, sim_to_best)
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "score_e6": pa.array(out_score, pa.int64()),
        }
    )


def logistic_irls(
    ds: ray.data.Dataset,
    x_cols: "Sequence[str]",
    y_col: str,
    *,
    iters: int = 8,
    ridge: float = 1e-9,
) -> tuple[np.ndarray, int]:
    """Distributed logistic regression by IRLS (Newton-Raphson on the
    log-likelihood): each iteration broadcasts β, every block computes
    its partial Gram XᵀWX and XᵀWz over [1 | x_cols] (W = p(1−p),
    z = Xβ + (y−p)/W, the working response), ONE bounded reduce sums
    the (d+1)² partials, the driver solves the (d+1)×(d+1) system.

    The classic model-training shape for the engine: per-iteration
    driver state is O(d²), the corpus never moves, and ``iters`` is
    fixed (no data-dependent convergence test) so runs are
    deterministic.  Returns (β, n_rows).
    """
    x_cols = list(x_cols)
    d = len(x_cols) + 1

    def features(b: pa.Table) -> pa.Table:
        cols = {"__y": pa.array(
            b.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        )}
        for c in x_cols:
            cols["__" + c] = pa.array(
                b.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            )
        return pa.table(cols)

    feats = ds.map_batches(features, batch_format="pyarrow").materialize()
    beta = np.zeros(d, dtype=np.float64)
    n_rows = feats.count()

    for _ in range(iters):
        beta_ref = ray.put(beta.copy())

        def partials(b: pa.Table) -> pa.Table:
            bb = ray.get(beta_ref)
            n = len(b)
            X = np.empty((n, d), dtype=np.float64)
            X[:, 0] = 1.0
            for j, c in enumerate(x_cols):
                X[:, j + 1] = b.column("__" + c).to_numpy()
            y = b.column("__y").to_numpy()
            eta = X @ bb
            p = 1.0 / (1.0 + np.exp(-eta))
            w = np.maximum(p * (1.0 - p), 1e-9)
            z = eta + (y - p) / w
            Xw = X * w[:, None]
            gram = X.T @ Xw  # d×d
            rhs = Xw.T @ z  # d
            flat = np.concatenate([gram.ravel(), rhs])
            return pa.table(
                {f"g{i}": pa.array([flat[i]]) for i in range(d * d + d)}
            )

        sums = (
            feats.map_batches(partials, batch_format="pyarrow")
            .to_pandas()  # bounded: one row per block, d²+d floats each
            .sum(axis=0)
            .to_numpy()
        )
        gram = sums[: d * d].reshape(d, d) + ridge * np.eye(d)
        rhs = sums[d * d :]
        beta = np.linalg.solve(gram, rhs)
    return beta, n_rows
