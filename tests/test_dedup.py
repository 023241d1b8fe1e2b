"""Dedup family correctness on planted-duplicate corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.dedup import (
    embedding_cosine_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while zoom tiles stream "
    "through the actor pool and every batch stays vectorized end to end "
    "with arrow buffers shared zero copy across the object store"
)
OTHER = (
    "completely different content about benchmarking shuffle strategies "
    "partition counts block sizes and the cost of all to all exchanges "
    "in a streaming execution engine with backpressure"
)


def _doc_table():
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "  " + BASE + " "),  # whitespace-normalized dup of 0
        (3, BASE.replace("lazy", "sleepy")),  # near dup of 0
        (4, OTHER),
        (5, OTHER.replace("cost", "price").replace("counts", "totals")),  # near dup of 4
        (6, "tiny"),
        (7, ""),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_exact_dedup_keeps_min_id(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    ids = set(out["doc_id"])
    # 1 and 2 collapse into 0; everything else unique
    assert ids == {0, 3, 4, 5, 6, 7}


def test_minhash_lsh_dedup_drops_near_dups(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.6, concurrency=2)
    ids = set(out.to_pandas()["doc_id"])
    assert 0 in ids and 4 in ids          # cluster survivors (min id)
    assert 1 not in ids and 2 not in ids  # exact dups caught too
    assert 3 not in ids                   # near dup of 0
    assert 6 in ids                       # distinct doc survives
    # 7 (empty) must never merge with non-empty docs
    assert 7 in ids


def test_simhash_dedup_drops_near_dups(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = simhash_dedup(ds, hamming_threshold=6, concurrency=2)
    ids = set(out.to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert 4 in ids and 6 in ids


def test_ngram_jaccard_dedup(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = ngram_jaccard_dedup(ds, threshold=0.5, concurrency=2)
    ids = set(out.to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids and 2 not in ids and 3 not in ids
    assert 4 in ids and 5 not in ids
    assert 6 in ids


def test_embedding_cosine_dedup(ray_session):
    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16))
    vecs = list(base)
    # plant near-dups of vector 0 and 5
    vecs.append(base[0] + 0.01 * rng.standard_normal(16))  # id 20 ~ 0
    vecs.append(base[5] + 0.01 * rng.standard_normal(16))  # id 21 ~ 5
    tbl = pa.table(
        {
            "vec_id": pa.array(range(22), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = embedding_cosine_dedup(ray.data.from_arrow(tbl), threshold=0.98)
    ids = set(out.to_pandas()["vec_id"])
    assert 0 in ids and 20 not in ids
    assert 5 in ids and 21 not in ids
    assert len(ids) == 20


def test_no_driver_take_all_in_any_family(ray_session, monkeypatch):
    """Scale contract: no dedup family may materialize O(N) state on the
    driver via take_all — signature verify happens in map_groups, payload
    verify via distributed joins, survivor election in worker tasks."""
    def forbidden(self, *a, **kw):
        raise AssertionError("driver-side take_all called inside a dedup pipeline")

    monkeypatch.setattr(ray.data.Dataset, "take_all", forbidden)

    tbl = _doc_table()
    ids = set(
        minhash_lsh_dedup(ray.data.from_arrow(tbl), jaccard_threshold=0.6)
        .to_pandas()["doc_id"]
    )
    assert 0 in ids and 1 not in ids
    ids = set(simhash_dedup(ray.data.from_arrow(tbl), hamming_threshold=6).to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids
    ids = set(ngram_jaccard_dedup(ray.data.from_arrow(tbl), threshold=0.5).to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids

    rng = np.random.RandomState(0)
    base = rng.standard_normal((10, 8))
    vecs = list(base) + [base[0] + 0.001 * rng.standard_normal(8)]
    vtbl = pa.table(
        {
            "vec_id": pa.array(range(11), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ids = set(embedding_cosine_dedup(ray.data.from_arrow(vtbl), threshold=0.98).to_pandas()["vec_id"])
    assert 0 in ids and 10 not in ids


def test_sharded_union_find_matches_single_task(ray_session):
    """compute_drop_ids: the sharded two-level path (forced by
    shard_threshold=0) elects identical survivors to the single-task
    path, including chains that span shards and duplicate edges."""
    from rastertiler_rs_ray.pipelines.dedup import compute_drop_ids

    rng = np.random.RandomState(7)
    edges = []
    # 40 chain components of length 6 (stress transitive stitching)
    node = 0
    for _ in range(40):
        chain = list(range(node, node + 6))
        node += 6
        edges += list(zip(chain[:-1], chain[1:]))
    # duplicate edges (multi-band analog) + shuffled order
    edges += [edges[i] for i in rng.randint(0, len(edges), 50)]
    rng.shuffle(edges)
    tbl = pa.table(
        {
            "u": pa.array([a for a, _ in edges], pa.int64()),
            "v": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    small = compute_drop_ids(ray.data.from_arrow(tbl).repartition(8))
    sharded = compute_drop_ids(
        ray.data.from_arrow(tbl).repartition(8), shard_threshold=0, num_shards=5
    )
    assert small is not None and sharded is not None
    assert sorted(small.to_pylist()) == sorted(sharded.to_pylist())
    # each chain drops all but its min
    assert len(small) == 40 * 5


def test_dedup_deterministic_across_parallelism(ray_session):
    tbl = _doc_table()
    a = set(minhash_lsh_dedup(ray.data.from_arrow(tbl).repartition(1), jaccard_threshold=0.6, concurrency=1).to_pandas()["doc_id"])
    b = set(minhash_lsh_dedup(ray.data.from_arrow(tbl).repartition(4), jaccard_threshold=0.6, concurrency=2).to_pandas()["doc_id"])
    assert a == b


def test_apply_per_bucket_matches_naive_groupby(ray_session):
    """_apply_per_bucket (hash-sharded run-length slicing) emits the
    same pair set as a literal groupby(__bucket).map_groups, for a
    bucket table with singletons, multi-member buckets, and a
    degenerate hot bucket."""
    from rastertiler_rs_ray.pipelines.dedup import _apply_per_bucket, _empty_pairs

    rng = np.random.RandomState(11)
    # ~half singletons, a few buckets of 2-5, one hot bucket of 40
    buckets = np.concatenate([
        np.arange(200),                         # singletons
        np.repeat(np.arange(1000, 1040), rng.randint(2, 6, 40)),
        np.full(40, 7777),                      # hot bucket
    ])
    n = len(buckets)
    rng.shuffle(buckets)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "__bucket": pa.array(buckets.astype(np.int64)),
        }
    )
    max_bucket = 30  # hot bucket must be skipped by per_bucket itself

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        if len(ids) < 2 or len(ids) > max_bucket:
            return _empty_pairs(pa.int64())
        iu, ju = np.triu_indices(len(ids), 1)
        return pa.table(
            {
                "u": pa.array([ids[i] for i in iu], pa.int64()),
                "v": pa.array([ids[j] for j in ju], pa.int64()),
            }
        )

    ds = ray.data.from_arrow(tbl).repartition(6)
    fast = _apply_per_bucket(ds, per_bucket, pa.int64(), num_shards=7)
    naive = ds.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")
    fp = sorted(map(tuple, fast.to_pandas()[["u", "v"]].itertuples(index=False)))
    np_ = sorted(map(tuple, naive.to_pandas()[["u", "v"]].itertuples(index=False)))
    assert fp == np_ and len(fp) > 0


def test_exact_dedup_shard_invariance(ray_session):
    """Survivors are independent of shard count and input partitioning."""
    tbl = _doc_table()
    a = exact_dedup(ray.data.from_arrow(tbl).repartition(1), num_shards=1)
    b = exact_dedup(ray.data.from_arrow(tbl).repartition(5), num_shards=17)
    assert set(a.to_pandas()["doc_id"]) == set(b.to_pandas()["doc_id"]) == {0, 3, 4, 5, 6, 7}


def test_embedding_dedup_fixed_size_list(ray_session):
    """Regression: fixed_size_list<float32> embeddings must round-trip the
    pair-payload attach as float64 row bytes (the verifier decodes float64
    unconditionally) — an earlier version shipped them as float32 bytes,
    corrupting every decoded vector."""
    rng = np.random.RandomState(1)
    base = rng.standard_normal((15, 8)).astype(np.float32)
    vecs = np.concatenate([base, base[:2] + np.float32(0.005)])  # 15,16 ~ 0,1
    flat = pa.array(vecs.reshape(-1))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(17), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(flat, 8),
        }
    )
    out = embedding_cosine_dedup(ray.data.from_arrow(tbl), threshold=0.98)
    ids = set(out.to_pandas()["vec_id"])
    assert 0 in ids and 15 not in ids
    assert 1 in ids and 16 not in ids
    assert len(ids) == 15


def test_adaptive_shards_scale_with_size(ray_session):
    """num_shards defaults to ~256 MB per shard with a floor, so a group
    never holds a fixed 1/64 of an arbitrarily large corpus."""
    from rastertiler_rs_ray.pipelines.dedup import _TARGET_SHARD_BYTES, _adaptive_shards

    small = ray.data.from_arrow(_doc_table())
    _, n_small = _adaptive_shards(small, floor=8)
    assert n_small == 8  # tiny input hits the floor
    est = small.materialize().size_bytes()
    expected = max(8, int((est * 3) // _TARGET_SHARD_BYTES))
    big = small.union(small).union(small)
    _, n_big = _adaptive_shards(big, floor=8)
    assert n_big == expected


def test_planted_dedup_corpus_margins_and_survivors(ray_session):
    """The planted-oracle corpora (driver_queries) rest on deterministic
    safety margins: cross-group estimated Jaccard FAR below the 0.8
    verify threshold and simhash Hamming far above 3, so the dedup
    result is exactly the identical-text grouping the SQL oracle
    computes.  Pin the margins and the survivor set."""
    import numpy as np

    from rastertiler_rs_ray.functions.text import char_shingles
    from rastertiler_rs_ray.pipelines.dedup import MinHasher, SimHasher
    from rastertiler_rs_ray.pipelines.driver_queries import (
        _planted_exact_texts,
        minhash_dedup_planted,
        simhash_dedup_planted,
    )

    spine = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    texts = _planted_exact_texts(spine).column("text").to_pylist()
    sh = [char_shingles(t, 5) for t in texts]
    mh, sm = MinHasher(64, 5), SimHasher()
    sigs = np.stack([mh.signature(s) for s in sh])
    sims = np.array([sm.simhash(s) for s in sh], dtype=np.uint64)
    iu, ju = np.triu_indices(len(texts), 1)
    cross = np.array([texts[i] != texts[j] for i, j in zip(iu, ju)])
    est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)[iu, ju][cross]
    x = sims[:, None] ^ sims[None, :]
    ham = np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(len(texts), len(texts), 8),
        axis=2,
    ).sum(axis=2)[iu, ju][cross]
    assert est.max() < 0.7, est.max()
    assert ham.min() > 3, ham.min()

    # survivor set = {5g} ∪ singletons {5g+3, 5g+4} over the sf0.001 spine
    want = {d for d in range(500) if d % 5 in (0, 3, 4)}
    got_mh = set(minhash_dedup_planted("/root/testdata/sf0.001").to_pandas()["doc_id"])
    got_sh = set(simhash_dedup_planted("/root/testdata/sf0.001").to_pandas()["doc_id"])
    assert got_mh == want
    assert got_sh == want


def test_planted_ngram_family_jaccards(ray_session):
    """The ngram planted family's pairwise word-3-gram Jaccards sit at
    engineered values (47/49, 1, 20/76, 0) — nowhere near the 0.8
    threshold boundary — and the pipeline keeps exactly the component
    minima plus the below-threshold singletons."""
    from rastertiler_rs_ray.functions.text import word_ngrams
    from rastertiler_rs_ray.pipelines.driver_queries import (
        _planted_ngram_texts,
        ngram_dedup_planted,
    )

    spine = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    t = _planted_ngram_texts(spine).column("text").to_pylist()

    def jac(a, b):
        ga, gb = word_ngrams(a, 3), word_ngrams(b, 3)
        return len(ga & gb) / len(ga | gb)

    assert jac(t[0], t[1]) == 47 / 49
    assert jac(t[0], t[2]) == 1.0
    assert jac(t[0], t[3]) == 20 / 76
    assert jac(t[0], t[4]) == 0.0
    assert jac(t[0], t[5]) == 0.0  # next group leader: disjoint vocab

    got = set(ngram_dedup_planted("/root/testdata/sf0.001").to_pandas()["doc_id"])
    want = {d for d in range(500) if d % 5 in (0, 3, 4)}
    assert got == want


def _para_brute(docs, sep="\n"):
    """First-occurrence paragraph dedup, row-at-a-time."""
    seen = set()
    out = []
    for doc_id, text in docs:
        kept, removed = [], 0
        for p in text.split(sep):
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        out.append((doc_id, sep.join(kept), removed))
    return out


def test_dedup_paragraphs_matches_brute_force(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import dedup_paragraphs

    docs = [
        (0, "header\nalpha beta\nfooter"),
        (1, "header\ngamma delta\nfooter"),  # header+footer removed
        (2, "alpha beta\nheader\nfresh"),  # both paras removed, fresh kept
        (3, "header\nfooter"),  # everything removed -> empty text
        (4, ""),  # empty doc: '' becomes a paragraph, deduped later
        (5, ""),
        (6, "unique tail"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    out = (
        dedup_paragraphs(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _para_brute(docs)
    assert len(out) == len(want)
    for i, (did, text, nrem) in enumerate(want):
        r = out.iloc[i]
        assert (r["doc_id"], r["text"], r["n_removed"]) == (did, text, nrem)


def test_dedup_paragraphs_partition_invariant(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import dedup_paragraphs

    rng = np.random.RandomState(11)
    paras = [f"para {i}" for i in range(20)]
    docs = [
        (i, "\n".join(rng.choice(paras, rng.randint(1, 6))))
        for i in range(60)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    outs = []
    for nparts in (1, 7):
        outs.append(
            dedup_paragraphs(ray.data.from_arrow(tbl).repartition(nparts), num_shards=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = _para_brute(docs)
    for i, (did, text, nrem) in enumerate(want):
        r = outs[0].iloc[i]
        assert (r["doc_id"], r["text"], r["n_removed"]) == (did, text, nrem)


def _cc_brute(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = sorted((ru, rv))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def test_connected_components_small_and_sharded_agree(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import connected_components

    rng = np.random.RandomState(17)
    edges = [tuple(sorted(rng.randint(0, 200, 2))) for _ in range(300)]
    tbl = pa.table(
        {
            "u": pa.array([u for u, _ in edges], pa.int64()),
            "v": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    want = _cc_brute(edges)
    ds = ray.data.from_arrow(tbl).repartition(6)
    small = connected_components(ds).to_pandas()
    got_small = dict(zip(small["node"], small["component"]))
    assert got_small == want
    # force the sharded two-level path on the same graph
    sharded = connected_components(ds, shard_threshold=0, num_shards=7).to_pandas()
    got_sharded = dict(zip(sharded["node"], sharded["component"]))
    assert got_sharded == want
    # component labels are the min node of each component
    for node, comp in want.items():
        assert comp <= node


def test_connected_components_empty_and_self_edges(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import connected_components

    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out_ds = connected_components(ray.data.from_arrow(empty))
    # Ray's to_pandas() drops columns on 0-row datasets — assert on schema
    assert out_ds.count() == 0 and out_ds.schema().names == ["node", "component"]

    selfe = pa.table({"u": pa.array([5, 5, 9], pa.int64()), "v": pa.array([5, 6, 9], pa.int64())})
    out = connected_components(ray.data.from_arrow(selfe)).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {5: 5, 6: 5, 9: 9}


def test_dedup_incremental_drops_only_reference_matches(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import dedup_incremental

    ref = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["alpha  beta", "gamma delta", "epsilon zeta"],
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "text": [
                "alpha beta",        # dup of ref 0 modulo whitespace -> drop
                "fresh document",    # clean -> keep
                "gamma delta",       # dup of ref 1 -> drop
                "fresh document",    # within-batch dup only -> keep (contract)
                "another one",       # clean -> keep
            ],
        }
    )
    out = dedup_incremental(
        ray.data.from_arrow(new).repartition(3),
        ray.data.from_arrow(ref).repartition(2),
    ).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13, 14]


def test_dedup_incremental_small_bloom_forces_exact_verify(ray_session):
    # 2^8-bit bloom over 200 reference keys -> dense false positives;
    # the exact-verify pass must still keep every non-duplicate.
    from rastertiler_rs_ray.pipelines.dedup import dedup_incremental

    ref = pa.table(
        {"doc_id": pa.array(range(200), pa.int64()),
         "text": [f"ref doc number {i}" for i in range(200)]}
    )
    new = pa.table(
        {"doc_id": pa.array(range(1000, 1300), pa.int64()),
         "text": [f"new doc number {i}" for i in range(300)]}
    )
    out = dedup_incremental(
        ray.data.from_arrow(new).repartition(4),
        ray.data.from_arrow(ref).repartition(4),
        bits_log2=8,
    ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(1000, 1300))


def test_dedup_incremental_empty_reference(ray_session):
    from rastertiler_rs_ray.pipelines.dedup import dedup_incremental

    ref = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    new = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"]})
    out = dedup_incremental(
        ray.data.from_arrow(new), ray.data.from_arrow(ref)
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_normalized_exact_dedup_collapses_reformatted(ray_session):
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.dedup import normalized_exact_dedup

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "the quick brown fox",
                "The, Quick;  BROWN    fox!",   # reformat of 0 → dropped
                "THE QUICK BROWN FOX",          # case copy of 0 → dropped
                "a different document",
                "a different  DOCUMENT.",       # reformat of 3 → dropped
                "the quick brown foxes",        # genuinely distinct → kept
            ],
        }
    )
    got = (
        normalized_exact_dedup(
            ray.data.from_pandas(df).repartition(3), num_shards=4
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == [0, 3, 5]


def test_normalized_exact_dedup_partition_invariant(ray_session):
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.dedup import normalized_exact_dedup

    base = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"doc number {i % 10} body" for i in range(40)],
        }
    )
    ids = []
    for parts in (1, 7):
        out = normalized_exact_dedup(
            ray.data.from_pandas(base).repartition(parts), num_shards=8
        ).to_pandas()
        ids.append(sorted(out["doc_id"].tolist()))
    assert ids[0] == ids[1] == list(range(10))


class TestSemDeDup:
    def test_planted_margin_and_survivors(self, ray_session):
        """The planted ±1 corpus's cross-group cosine stays far below
        the 0.9 threshold (pins the SQL oracle's no-merge assumption),
        and semdedup keeps exactly min-id per cohort + all uniques."""
        from rastertiler_rs_ray.pipelines.dedup import semdedup
        from rastertiler_rs_ray.pipelines.driver_queries import (
            _SEMDEDUP_THRESHOLD,
            _planted_vectors,
        )

        n = 500
        t = _planted_vectors(
            pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
        )
        vecs = np.asarray(t.column("embedding").combine_chunks().flatten()).reshape(
            n, -1
        )
        nm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sim = nm @ nm.T
        did = np.arange(n)
        base = np.where(did % 5 < 3, did // 5, 1_000_000 + did)
        cross = sim[base[:, None] != base[None, :]]
        assert cross.max() < _SEMDEDUP_THRESHOLD - 0.05  # wide margin
        out = semdedup(
            ray.data.from_arrow(t), k=8, iters=3, threshold=_SEMDEDUP_THRESHOLD
        ).to_pandas()
        got = set(out.vec_id)
        want = set(did[did % 5 >= 3]) | {
            int((did[(did % 5 < 3) & (did // 5 == c)]).min())
            for c in np.unique(did[did % 5 < 3] // 5)
        }
        assert got == want

    def test_keep_rule_farthest_from_centroid(self, ray_session):
        """Among near-duplicates the survivor is the member farthest
        from its cluster centroid (SemDeDup's keep rule)."""
        from rastertiler_rs_ray.pipelines.dedup import semdedup

        rng = np.random.default_rng(2)
        # two tight near-dup groups + isolated points, all in one cluster
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        rows, ids = [], []
        for i in range(4):  # group A: tiny perturbations of base
            v = base + 0.001 * (i + 1) * rng.standard_normal(16)
            rows.append(v)
            ids.append(10 + i)
        far = rng.standard_normal(16)
        far /= np.linalg.norm(far)
        rows.append(far)
        ids.append(99)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in rows], pa.list_(pa.float64())
                ),
            }
        )
        out = semdedup(
            ray.data.from_arrow(t), k=1, iters=2, threshold=0.99
        ).to_pandas()
        kept = set(out.vec_id)
        assert 99 in kept
        group_kept = kept - {99}
        assert len(group_kept) == 1
        # the survivor must be the group member farthest from the centroid
        vecs = np.stack(rows)
        cent = vecs.mean(0)
        d2 = ((vecs[:4] - cent) ** 2).sum(1)
        assert group_kept == {ids[int(np.argmax(d2))]}


def test_record_linkage(ray_session):
    """Blocking + lev<=1 verify + components: hand-built cohorts."""
    from rastertiler_rs_ray.pipelines.dedup import record_linkage

    rows = [
        # cohort A: exact dup + one-char typo (same 8-char prefix)
        {"cust_id": 1, "name": "aaaabbbb-one"},
        {"cust_id": 2, "name": "aaaabbbb-one"},
        {"cust_id": 3, "name": "aaaabbbb-onX"},
        # same block but > 1 edit away: separate entity
        {"cust_id": 4, "name": "aaaabbbb-twoXY"},
        # different block entirely
        {"cust_id": 5, "name": "zzzz-solo"},
        # pair split by blocking (prefix differs in first 8): NOT linked
        {"cust_id": 6, "name": "bbbbcccc-x"},
        {"cust_id": 7, "name": "bbbbcccX-x"},
    ]
    out = (
        record_linkage(
            ray.data.from_items(rows),
            id_col="cust_id",
            name_col="name",
            block_prefix=8,
            max_distance=1,
        )
        .to_pandas()
        .sort_values("cust_id")
        .reset_index(drop=True)
    )
    assert out.canonical_id.tolist() == [1, 1, 1, 4, 5, 6, 7]
