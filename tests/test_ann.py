"""ANN: brute-force exactness vs numpy oracle; IVF recall on clustered data."""

import numpy as np
import pyarrow as pa
import ray.data

from rastertiler_rs_ray.pipelines.ann import brute_force_topk, ivf_topk, train_centroids


def _clustered(n=400, dim=32, ncl=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((ncl, dim)) * 5
    assign = rng.randint(0, ncl, n)
    x = centers[assign] + rng.standard_normal((n, dim)) * 0.3
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float32())),
        }
    ), x


def _oracle_topk(x, qidx, k):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn[qidx] @ xn.T
    for r, q in enumerate(qidx):
        sims[r, q] = -np.inf
    out = {}
    for r, q in enumerate(qidx):
        out[q] = set(np.argsort(-sims[r])[:k].tolist())
    return out


def test_brute_force_matches_numpy_oracle(ray_session):
    tbl, x = _clustered()
    # float32 storage: oracle must see the same rounded values
    x32 = np.asarray(
        [np.asarray(v, dtype=np.float32) for v in tbl.column("embedding").to_pylist()]
    ).astype(np.float64)
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 10)
    got = brute_force_topk(ds, queries, k=5)
    want = _oracle_topk(x32, list(range(10)), 5)
    by_q = {}
    for r in got.to_pylist():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q == want


def test_ivf_recall_on_clustered(ray_session):
    tbl, _ = _clustered()
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 20)
    bf = brute_force_topk(ds, queries, k=5)
    iv = ivf_topk(ds, queries, k=5, nlist=8, nprobe=2)
    bfp = {(r["query_id"], r["neighbor_id"]) for r in bf.to_pylist()}
    ivp = {(r["query_id"], r["neighbor_id"]) for r in iv.to_pylist()}
    recall = len(bfp & ivp) / len(bfp)
    assert recall >= 0.9, recall


def test_ivf_centroids_deterministic(ray_session):
    tbl, _ = _clustered()
    ds = ray.data.from_arrow(tbl)
    c1 = train_centroids(ds, nlist=8)
    c2 = train_centroids(ds, nlist=8)
    assert np.allclose(c1, c2)


def test_label_centroids_match_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from rastertiler_rs_ray.pipelines.ann import label_centroids

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
    got = (
        label_centroids(emb)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
    labels = t.column("label").to_numpy()
    mat = np.asarray(t.column("embedding").combine_chunks().flatten(), dtype=np.float64)
    mat = mat.reshape(len(labels), -1)
    for lab in np.unique(labels):
        ref = np.round(mat[labels == lab].mean(axis=0) * 1e4).astype(np.int64)
        sub = got[got["label"] == lab].sort_values("dim")["mean_e4"].to_numpy()
        assert (sub == ref).all(), lab


def test_ivf_indexed_matches_inline_and_prunes(ray_session, tmp_path):
    """build_ivf_index + ivf_topk_indexed: same results as the inline
    ivf_topk with the same quantizer, and each query set reads only its
    probed partitions from storage."""
    from rastertiler_rs_ray.pipelines.ann import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        train_centroids,
    )

    tbl, _ = _clustered()
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 20)
    cents = train_centroids(ds, nlist=8)

    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, nlist=8, centroids=cents)

    stats = {}
    got = ivf_topk_indexed(idx, queries, k=5, nprobe=2, stats=stats)
    want = ivf_topk(ds, queries, k=5, nlist=8, nprobe=2, centroids=cents)
    gp = {(r["query_id"], r["neighbor_id"]) for r in got.to_pylist()}
    wp = {(r["query_id"], r["neighbor_id"]) for r in want.to_pylist()}
    assert gp == wp
    # pruning: probed cells < all cells, rows read < corpus
    assert stats["partitions_read"] < stats["partitions_total"], stats
    assert stats["rows_read"] < len(tbl), stats


def test_lsh_recall_on_clustered(ray_session):
    from rastertiler_rs_ray.pipelines.ann import lsh_topk

    tbl, _ = _clustered()
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 20)
    bf = brute_force_topk(ds, queries, k=5)
    ls = lsh_topk(ds, queries, k=5, bits=6, hamming_probe=2)
    bfp = {(r["query_id"], r["neighbor_id"]) for r in bf.to_pylist()}
    lsp = {(r["query_id"], r["neighbor_id"]) for r in ls.to_pylist()}
    recall = len(bfp & lsp) / len(bfp)
    assert recall >= 0.85, recall


def test_lsh_deterministic_across_partitioning(ray_session):
    from rastertiler_rs_ray.pipelines.ann import lsh_topk

    tbl, _ = _clustered()
    queries = tbl.slice(0, 10)
    a = lsh_topk(ray.data.from_arrow(tbl).repartition(2), queries, k=5)
    b = lsh_topk(ray.data.from_arrow(tbl).repartition(9), queries, k=5)
    # Neighbor identities and ranks must be partition-invariant exactly.
    # Scores are deterministic only up to BLAS accumulation order (the
    # matmul blocking depends on the batch's matrix shape), so compare
    # them with a last-ulp tolerance instead of bitwise.
    ra, rb = a.to_pylist(), b.to_pylist()
    assert [(r["query_id"], r["neighbor_id"], r["rank"]) for r in ra] == [
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in rb
    ]
    assert np.allclose(
        [r["score"] for r in ra], [r["score"] for r in rb], rtol=0, atol=1e-12
    )


def test_scan_topk_handles_empty_blocks(ray_session):
    """A filter that empties some blocks must not crash the scorers
    (reshape(0, -1) regression) and the schema must stay stable."""
    import pyarrow.compute as pc

    from rastertiler_rs_ray.pipelines.ann import ivf_topk, lsh_topk

    tbl, _ = _clustered()
    queries = tbl.slice(0, 5)
    ds = (
        ray.data.from_arrow(tbl)
        .repartition(8)
        .filter(lambda r: r["vec_id"] < 40)  # most blocks end up empty
    )
    bf = brute_force_topk(ds, queries, k=3)
    assert len(bf) == 15 and bf.column("neighbor_id").null_count == 0
    for out in (
        ivf_topk(ds, queries, k=3, nlist=8, nprobe=8),
        lsh_topk(ds, queries, k=3, bits=4, hamming_probe=4),
    ):
        assert out.column_names == ["query_id", "neighbor_id", "score", "rank"]
        assert len(out) > 0


def test_lsh_full_hamming_ball_equals_brute_force(ray_session):
    """hamming_probe == bits probes every code, so results must equal
    the exact brute-force top-k (also pins radius>2 generalization)."""
    from rastertiler_rs_ray.pipelines.ann import lsh_topk

    tbl, _ = _clustered()
    ds = ray.data.from_arrow(tbl).repartition(3)
    queries = tbl.slice(0, 10)
    bf = brute_force_topk(ds, queries, k=5)
    ls = lsh_topk(ds, queries, k=5, bits=5, hamming_probe=5)
    assert bf.to_pylist() == ls.to_pylist()


def test_lsh_rejects_bad_hamming_probe(ray_session):
    import pytest as _pytest

    from rastertiler_rs_ray.pipelines.ann import lsh_topk

    tbl, _ = _clustered()
    with _pytest.raises(ValueError, match="hamming_probe"):
        lsh_topk(ray.data.from_arrow(tbl), tbl.slice(0, 2), bits=6, hamming_probe=7)


def _kmeans_ref(x, ids, k, iters):
    """Numpy reference with the SAME deterministic spec: init = k
    smallest ids, squared-L2 argmin (ties -> lowest cluster), empty
    clusters keep their centroid, 1e-9 centroid rounding."""
    def _d2(x, c):
        # same expansion as the engine so float ulps agree exactly
        return (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]

    order = np.argsort(ids, kind="stable")[:k]
    cents = np.round(x[order] * 1e9) / 1e9
    for _ in range(iters):
        a = np.argmin(_d2(x, cents), axis=1)
        nxt = cents.copy()
        for c in range(k):
            m = x[a == c]
            if len(m):
                nxt[c] = m.mean(axis=0)
        cents = np.round(nxt * 1e9) / 1e9
    return np.argmin(_d2(x, cents), axis=1)


def test_kmeans_clusters_matches_reference_and_partitioning(ray_session):
    from rastertiler_rs_ray.pipelines.ann import kmeans_clusters

    tbl, x = _clustered(n=300, dim=16, ncl=5, seed=11)
    ids = tbl.column("vec_id").to_numpy()
    # the table stores float32 — the reference must see the same values
    xq = x.astype(np.float32).astype(np.float64)
    want = dict(zip(ids, _kmeans_ref(xq, ids, 5, 4)))
    for parts in (2, 9):
        got = (
            kmeans_clusters(
                ray.data.from_arrow(tbl).repartition(parts), k=5, iters=4
            )
            .to_pandas()
            .set_index("vec_id")["cluster"]
            .to_dict()
        )
        assert got == want, parts


def test_kmeans_clusters_separates_planted_blobs(ray_session):
    from rastertiler_rs_ray.pipelines.ann import kmeans_clusters

    # well-separated blobs: every planted cluster must map to exactly
    # one k-means cluster (purity 1.0)
    rng = np.random.RandomState(5)
    centers = rng.randn(4, 8) * 50
    x = np.concatenate([c + rng.randn(60, 8) for c in centers])
    lab = np.repeat(np.arange(4), 60)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x)), pa.int64()),
            "embedding": pa.array(list(x.astype(float)), pa.list_(pa.float32())),
        }
    )
    out = kmeans_clusters(ray.data.from_arrow(tbl), k=4, iters=6).to_pandas()
    df = out.assign(truth=lab[out["vec_id"].to_numpy()])
    assert df.groupby("truth")["cluster"].nunique().eq(1).all()
    assert df["cluster"].nunique() == 4


def _planted_pq(n=256, m=4, dsub=4, ks=8, seed=11):
    """Corpus where each subspace takes exactly ks distinct subvector
    values — PQ reconstruction is lossless, so ADC == exact cosine.

    Vocab subvectors are unit-norm so every full vector has norm √m
    and the pipeline's L2-normalize scales all rows uniformly (the
    ks-distinct-values property survives normalization); pick combos
    are sampled WITHOUT replacement so no two rows share an embedding
    (duplicate vectors would make the k-th-neighbor tie-break
    layout-dependent)."""
    rng = np.random.RandomState(seed)
    vocab = rng.standard_normal((m, ks, dsub))
    vocab /= np.linalg.norm(vocab, axis=2, keepdims=True)
    combos = rng.choice(ks**m, size=n, replace=False)
    picks = np.stack(np.unravel_index(combos, (ks,) * m), axis=1)
    x = np.concatenate([vocab[j, picks[:, j]] for j in range(m)], axis=1)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float32())),
        }
    )
    return tbl


def test_pq_exact_when_subspaces_quantize_losslessly(ray_session):
    from rastertiler_rs_ray.pipelines.ann import pq_topk, train_pq_codebooks

    tbl = _planted_pq()
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 12)
    books = train_pq_codebooks(ds, m=4, ks=8, sample=256, iters=12)
    bf = brute_force_topk(ds, queries, k=5)
    pq = pq_topk(ds, queries, k=5, codebooks=books)
    bfp = {(r["query_id"], r["neighbor_id"]) for r in bf.to_pylist()}
    pqp = {(r["query_id"], r["neighbor_id"]) for r in pq.to_pylist()}
    assert pqp == bfp  # lossless codebooks => identical neighbor sets


def test_pq_cluster_fidelity_on_clustered(ray_session):
    """PQ codes preserve COARSE geometry: on well-separated clusters,
    k-means collapses each cluster to (near-)identical codes, so exact
    within-cluster ranking is unrecoverable by design — the meaningful
    contract is that every returned neighbor comes from the query's
    own cluster (inter-cluster ADC separation)."""
    from rastertiler_rs_ray.pipelines.ann import pq_topk

    tbl, x = _clustered(n=400, dim=32)
    # recover the planted assignment: centers are the generator's first
    # draw from RandomState(3), noise (0.3) << separation (~5·√dim)
    centers = np.random.RandomState(3).standard_normal((8, 32)) * 5
    assign = np.argmin(
        ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1), axis=1
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = tbl.slice(0, 20)
    out = pq_topk(ds, queries, k=5, m=8, ks=16)
    rows = out.to_pylist()
    assert len(rows) == 100  # 20 queries x 5 neighbors
    same = sum(assign[r["query_id"]] == assign[r["neighbor_id"]] for r in rows)
    assert same / len(rows) >= 0.95, same / len(rows)


def test_pq_encode_schema_and_compression(ray_session):
    from rastertiler_rs_ray.pipelines.ann import pq_encode, train_pq_codebooks

    tbl, _ = _clustered(n=100, dim=32)
    ds = ray.data.from_arrow(tbl).repartition(3)
    books = train_pq_codebooks(ds, m=8, ks=16, sample=100)
    assert books.shape == (8, 16, 4)
    codes = pq_encode(ds, books).to_pandas()
    assert len(codes) == 100
    arr = np.stack(codes["code"].to_numpy())
    assert arr.shape == (100, 8) and arr.dtype == np.uint8
    assert arr.max() < 16


def test_pca_matches_numpy_and_is_layout_invariant(ray_session):
    from rastertiler_rs_ray.pipelines.ann import pca_project, pca_train

    rng = np.random.RandomState(21)
    # anisotropic cloud: a few dominant directions
    basis = rng.standard_normal((16, 16))
    scales = np.array([10, 7, 5, 3] + [0.3] * 12)
    x = (rng.standard_normal((300, 16)) * scales) @ basis
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.tolist() for v in x], pa.list_(pa.float64())),
        }
    )
    m4 = pca_train(ray.data.from_arrow(tbl).repartition(4), n_components=4)
    m7 = pca_train(ray.data.from_arrow(tbl).repartition(7), n_components=4)

    # numpy reference on the same data
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)[:4]
    ref_var = w[order]

    assert np.allclose(m4["mean"], mean, atol=1e-9)
    assert np.allclose(m4["explained_var"], ref_var, rtol=1e-8)
    # components match up to the deterministic sign fix
    ref = v[:, order].T
    flip = np.sign(ref[np.arange(4), np.argmax(np.abs(ref), axis=1)])
    assert np.allclose(m4["components"], ref * flip[:, None], atol=1e-7)
    # block-layout invariance (absorbed float-sum ulps)
    assert np.allclose(m4["components"], m7["components"], atol=1e-7)

    proj = pca_project(
        ray.data.from_arrow(tbl).repartition(4), m4
    ).to_pandas().sort_values("vec_id")
    pm = np.stack(proj["pca"].to_numpy())
    assert pm.shape == (300, 4)
    # projection reproduces the reference subspace coordinates
    assert np.allclose(pm, (x - mean) @ (ref * flip[:, None]).T, atol=1e-6)
    # projected variance equals eigenvalues
    assert np.allclose(pm.var(axis=0), ref_var, rtol=1e-6)


def test_similarity_threshold_join_matches_numpy(ray_session):
    from rastertiler_rs_ray.pipelines.ann import similarity_threshold_join

    tbl, x = _clustered(n=200, dim=16)
    x32 = np.asarray(
        [np.asarray(v, dtype=np.float32) for v in tbl.column("embedding").to_pylist()]
    ).astype(np.float64)
    xn = x32 / np.linalg.norm(x32, axis=1, keepdims=True)
    sims = xn @ xn.T
    thr = 0.9
    want = {
        (i, j)
        for i in range(len(xn))
        for j in range(len(xn))
        if i != j and sims[i, j] > thr
    }
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = similarity_threshold_join(ds, tbl, threshold=thr).to_pandas()
    got = set(zip(out["vec_id"], out["probe_id"]))
    assert got == want
    assert len(want) > 0  # clustered data must produce in-cluster pairs
    # scaled-integer similarity matches the float to 1e-9
    for _, r in out.head(50).iterrows():
        assert abs(r["sim_e9"] - round(sims[r["vec_id"], r["probe_id"]] * 1e9)) <= 1


def test_quantize_embeddings_int8_conformance(ray_session):
    from rastertiler_rs_ray.pipelines.ann import quantize_embeddings_int8

    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 8).astype(np.float32)
    vecs[7] = 0.0  # all-zero vector quantizes to zeros
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        quantize_embeddings_int8(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    x = vecs.astype(np.float64)
    mx = np.abs(x).max(axis=1)
    exp = np.floor(x * 127.0 / np.where(mx == 0, 1, mx)[:, None] + 0.5)
    exp = np.where(mx[:, None] == 0, 0, exp).astype(np.int64)
    assert len(out) == 40 * 8
    got = out["q"].to_numpy().reshape(40, 8)
    assert (got == exp).all()
    assert np.abs(got).max() <= 127
    assert (got[7] == 0).all()
    # every vector's max-magnitude dim hits exactly +/-127
    nz = np.delete(np.arange(40), 7)
    assert (np.abs(got[nz]).max(axis=1) == 127).all()


def test_quantize_int8_kernel_sliced_list_array():
    # a sliced ListArray chunk's offsets don't start at 0 and its
    # .values spans the parent buffer — the kernel must rebase instead
    # of indexing the parent values raw
    from rastertiler_rs_ray.pipelines.ann import (
        _quantize_int8_chunk,
        _quantize_int8_table,
    )

    rng = np.random.RandomState(11)
    vecs = rng.randn(30, 4).astype(np.float32)
    full_arr = pa.array(
        [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
    )
    sliced = full_arr.slice(10, 12)
    assert sliced.offsets[0].as_py() != 0  # precondition: actually sliced
    ids = np.arange(10, 22, dtype=np.int64)
    got_ids, got_dims, got_q = _quantize_int8_chunk(ids, sliced)
    rebased = pa.array(
        [list(map(float, v)) for v in vecs[10:22]], pa.list_(pa.float32())
    )
    want_ids, want_dims, want_q = _quantize_int8_chunk(ids, rebased)
    assert (got_ids == want_ids).all()
    assert (got_dims == want_dims).all()
    assert (got_q == want_q).all()
    assert len(got_q) == 12 * 4

    # table path: multi-chunk column with a sliced chunk
    t = pa.table(
        {
            "vec_id": pa.chunked_array(
                [pa.array(ids[:5]), pa.array(ids[5:])]
            ),
            "embedding": pa.chunked_array([sliced.slice(0, 5), sliced.slice(5)]),
        }
    )
    out = _quantize_int8_table(t, vec_col="embedding", id_col="vec_id")
    assert out.column("q").to_pylist() == list(want_q)
    assert out.column("vec_id").to_pylist() == list(want_ids)


class TestMmr:
    def test_matches_sequential_reference_and_diversifies(self, ray_session):
        from rastertiler_rs_ray.pipelines.ann import mmr_rerank

        rng = np.random.default_rng(9)
        dim, n = 16, 200
        base = rng.standard_normal((n, dim))
        q = rng.standard_normal(dim)
        # plant 5 near-copies of the best match: pure relevance would
        # return the clones; MMR must interleave diverse items
        best = q + 0.05 * rng.standard_normal(dim)
        for i in range(5):
            base[i] = best  # exact clones: pairwise cosine 1.0
        ids = np.arange(n, dtype=np.int64)
        corpus = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in base], pa.list_(pa.float64())
                    ),
                }
            )
        ).repartition(4)
        k, pool, lam = 8, 50, 0.5
        out = mmr_rerank(corpus, q, k=k, pool=pool, lam=lam).to_pandas()
        assert len(out) == k and out["rank"].tolist() == list(range(1, k + 1))
        # clones don't dominate: at most 2 of the 5 clones selected
        assert (out["vec_id"] < 5).sum() <= 2

        # sequential reference over the same pool
        nm = base / np.linalg.norm(base, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        simq = nm @ qn
        order = np.lexsort((ids, -simq))[:pool]
        pids, psim, pvec = ids[order], simq[order], nm[order]
        sel, got_ids = [], []
        maxsel = np.full(pool, -np.inf)
        taken = np.zeros(pool, bool)
        for _ in range(k):
            score = lam * psim - (0.0 if not sel else (1 - lam) * maxsel)
            score = np.where(taken, -np.inf, score)
            b = int(np.lexsort((pids, -score))[0])
            taken[b] = True
            sel.append(b)
            got_ids.append(int(pids[b]))
            maxsel = np.maximum(maxsel, pvec @ pvec[b])
        assert out["vec_id"].tolist() == got_ids
