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
    qm = _normalize(_as_matrix(queries, vec_col))
    qids = np.asarray(queries.column(query_id_col))
    q_ref = ray.put((qm, qids))

    def score(batch: pa.Table) -> pa.Table:
        qmat, qid = ray.get(q_ref)
        cm = _normalize(_as_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = cm @ qmat.T  # (batch, nq)
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
                "query_id": pa.array(out_q[keep]),
                "neighbor_id": pa.array(out_n[keep]),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    rows = corpus.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_partials(rows, k)


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

    One map pass assigns cells; scoring masks each (row, query) pair to
    the query's probed cells — rows outside every probe list cost only
    the mask, not a scan, and at scale the cell id becomes the Parquet
    partition key so unprobed cells are never read at all.
    """
    if centroids is None:
        centroids = train_centroids(corpus, nlist=nlist, vec_col=vec_col)
    qm = _normalize(_as_matrix(queries, vec_col))
    qids = np.asarray(queries.column(query_id_col))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    q_ref = ray.put((qm, qids, centroids, probe))

    def score(batch: pa.Table) -> pa.Table:
        qmat, qid, cents, probes = ray.get(q_ref)
        cm = _normalize(_as_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cell = np.argmax(cm @ cents.T, axis=1)  # (batch,)
        sims = cm @ qmat.T  # (batch, nq)
        probed = (cell[:, None, None] == probes[None, :, :]).any(axis=2)  # (batch, nq)
        sims[~probed] = -np.inf
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
                "query_id": pa.array(out_q[keep]),
                "neighbor_id": pa.array(out_n[keep]),
                "score": pa.array(out_s[keep], pa.float64()),
            }
        )

    rows = corpus.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_partials(rows, k)
