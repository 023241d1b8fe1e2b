"""Curation operators: decontamination, sequence packing, repetition."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from rastertiler_rs_ray.pipelines.curation import (
    ngram_contamination,
    pack_sequences,
    repetition_stats,
)


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_ngram_contamination_counts_positions(ray_session):
    eval_ds = _docs([(100, "a b c d e")])
    train = _docs(
        [
            (0, "x a b c d y a b c d"),  # two hits of "a b c d"
            (1, "b c d e"),              # one hit
            (2, "a b x c d"),            # no 4-gram overlap
            (3, "short"),                # too short for any 4-gram
            (4, ""),                     # empty
        ]
    )
    out = (
        ngram_contamination(train, eval_ds, n=4)
        .to_pandas()
        .set_index("doc_id")["n_hits"]
        .to_dict()
    )
    assert out == {0: 2, 1: 1}


def test_ngram_contamination_no_cross_doc_grams(ray_session):
    # tokens spanning two documents must not form a gram: doc 0 ends
    # "a b", doc 1 starts "c d" — eval gram "a b c d" must NOT match
    eval_ds = _docs([(100, "a b c d")])
    train = _docs([(0, "z z a b"), (1, "c d z z")])
    assert ngram_contamination(train, eval_ds, n=4).count() == 0


def test_pack_sequences_greedy(ray_session):
    rows = [
        (0, "t " * 100),  # 100 tokens -> seq 0 (fill 100)
        (1, "t " * 100),  # fits -> seq 0, offset 100
        (2, "t " * 100),  # 300 > 256 -> seq 1, offset 0
        (3, "t " * 300),  # oversize alone -> seq 2
        (4, "t " * 10),   # after oversize -> seq 3
        (150, "t " * 5),  # different shard (shard_size=100) -> own seq 0
    ]
    out = (
        pack_sequences(_docs(rows), capacity=256, shard_size=100)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "seq_id"] == 0 and out.loc[0, "seq_offset"] == 0
    assert out.loc[1, "seq_id"] == 0 and out.loc[1, "seq_offset"] == 100
    assert out.loc[2, "seq_id"] == 1 and out.loc[2, "seq_offset"] == 0
    assert out.loc[3, "seq_id"] == 2
    assert out.loc[4, "seq_id"] == 3
    assert out.loc[150, "seq_id"] == 1 * 1_000_000 + 0
    assert out.loc[150, "n_tokens"] == 5
    # every sequence respects capacity unless it holds a single oversize doc
    for sid, g in out.groupby("seq_id"):
        assert g["n_tokens"].sum() <= 256 or len(g) == 1


def test_pack_sequences_partition_invariance(ray_session):
    rng = np.random.RandomState(7)
    rows = [(i, "w " * int(rng.randint(1, 120))) for i in range(97)]
    a = pack_sequences(_docs(rows), capacity=200, shard_size=25).to_pandas()
    b = (
        pack_sequences(
            _docs(rows).repartition(7), capacity=200, shard_size=25
        ).to_pandas()
    )
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_repetition_stats_values(ray_session):
    out = (
        repetition_stats(
            _docs(
                [
                    (0, "a a a a"),      # 4 tokens, 1 distinct, bigram "a a" x3
                    (1, "a b c d"),      # all distinct, all bigrams unique
                    (2, ""),             # empty
                    (3, "x"),            # single token, no bigrams
                ]
            )
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0].tolist() == [4, 2500, 10000, 10000]
    assert out.loc[1].tolist() == [4, 10000, 2500, 3333]
    assert out.loc[2].tolist() == [0, 0, 0, 0]
    assert out.loc[3].tolist() == [1, 10000, 10000, 0]


def test_filter_repetitive_keeps_varied_text(ray_session):
    from rastertiler_rs_ray.pipelines.curation import filter_repetitive

    ds = _docs(
        [
            (0, "a a a a a a a a a b"),  # distinct 2/10 = 2000
            (1, "one two three four five"),  # 10000
            (2, ""),  # 0 tokens -> distinct_frac 0, dropped
        ]
    )
    out = filter_repetitive(ds, min_distinct_frac_e4=4000).to_pandas()
    assert set(out["doc_id"]) == {1}
    assert list(out.columns) == ["doc_id", "text"]  # original columns pass through


def test_decontaminate_drops_only_contaminated(ray_session):
    from rastertiler_rs_ray.pipelines.curation import decontaminate

    eval_ds = _docs([(100, "p q r s")])
    train = _docs([(0, "x p q r s y"), (1, "p q x r s"), (2, "totally other words here")])
    out = decontaminate(train, eval_ds, n=4).to_pandas()
    assert set(out["doc_id"]) == {1, 2}
    # full rows survive, not just ids
    assert "text" in out.columns


def test_cli_curate_resumable(ray_session, tmp_path):
    """CLI curate runs the composed pipeline to a checkpointed layout;
    a second run resumes and rewrites nothing."""
    import json
    import os

    from rastertiler_rs_ray.__main__ import main

    out = str(tmp_path / "curated")
    rc = main(["curate", "/root/testdata/sf0.001/documents.parquet", out,
               "--capacity", "200", "--shard-size", "50"])
    assert rc == 0
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    parts = manifest["partitions"]
    assert parts and all(v["status"] == "complete" for v in parts.values())
    total = sum(v["rows"] for v in parts.values())
    assert total > 0
    mtimes = {
        d: os.path.getmtime(os.path.join(out, "data", d))
        for d in os.listdir(os.path.join(out, "data"))
    }
    rc = main(["curate", "/root/testdata/sf0.001/documents.parquet", out,
               "--capacity", "200", "--shard-size", "50"])
    assert rc == 0
    after = {
        d: os.path.getmtime(os.path.join(out, "data", d))
        for d in os.listdir(os.path.join(out, "data"))
    }
    assert after == mtimes  # resume: no partition rewritten


def test_decontaminate_bloom_mode_matches_exact(ray_session):
    """The Bloom scale path must drop the same docs as exact mode on a
    small corpus (FP rate ~0 at 2^24 bits for a handful of grams) and
    must reject unknown modes."""
    import pytest as _pytest

    from rastertiler_rs_ray.pipelines.curation import decontaminate

    eval_ds = _docs([(100, "p q r s t u")])
    train = _docs(
        [(i, f"w{i} p q r s y z{i}") for i in range(0, 6, 2)]
        + [(i, f"clean doc number {i} with different words") for i in range(1, 7, 2)]
    )
    exact = set(decontaminate(train, eval_ds, n=4).to_pandas()["doc_id"])
    bloom = set(decontaminate(train, eval_ds, n=4, mode="bloom").to_pandas()["doc_id"])
    assert exact == bloom == {1, 3, 5}
    with _pytest.raises(ValueError, match="mode"):
        decontaminate(train, eval_ds, mode="nope")


def test_dup_ngram_coverage_hand_cases(ray_session):
    from rastertiler_rs_ray.pipelines.curation import dup_ngram_coverage

    docs = _docs(
        [
            (0, "a b c d x y z w"),      # "a b c d" also in doc 1 -> 4 covered
            (1, "q a b c d r s t"),      # same dup gram -> 4 covered
            (2, "u v w x"),              # unique 4-gram -> 0
            (3, "m n o p m n o p m"),    # self-repeat "m n o p" at 0 and 4,
                                          #   plus "n o p m" at 1 and 5 -> covers 0..8 = 9
            (4, "tiny"),                 # <4 tokens -> 0
        ]
    )
    out = (
        dup_ngram_coverage(docs, n=4, num_shards=4, join_partitions=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_tokens"].to_dict() == {0: 8, 1: 8, 2: 4, 3: 9, 4: 1}
    assert out["covered_tokens"].to_dict() == {0: 4, 1: 4, 2: 0, 3: 9, 4: 0}


def test_dup_ngram_coverage_shard_invariance(ray_session):
    from rastertiler_rs_ray.pipelines.curation import dup_ngram_coverage

    rng = np.random.default_rng(7)
    vocab = np.array(["a", "b", "c", "d", "e"], dtype=object)
    rows = [
        (i, " ".join(vocab[rng.integers(0, 5, rng.integers(4, 30))]))
        for i in range(40)
    ]
    a = (
        dup_ngram_coverage(_docs(rows), n=3, num_shards=2, join_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_ngram_coverage(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                    }
                )
            ).repartition(7),
            n=3, num_shards=9, join_partitions=5,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_remove_dup_ngrams_hand_case(ray_session):
    from rastertiler_rs_ray.pipelines.curation import remove_dup_ngrams

    docs = _docs(
        [
            (0, "a b c d x y z w"),
            (1, "q a b c d r s t"),
            (2, "u v w x"),
            (4, "tiny"),
        ]
    )
    out = (
        remove_dup_ngrams(docs, n=4, num_shards=3)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "text"] == "x y z w" and out.loc[0, "n_removed"] == 4
    assert out.loc[1, "text"] == "q r s t" and out.loc[1, "n_removed"] == 4
    assert out.loc[2, "text"] == "u v w x" and out.loc[2, "n_removed"] == 0
    assert out.loc[4, "text"] == "tiny" and out.loc[4, "n_removed"] == 0


def test_remove_dup_ngrams_matches_coverage(ray_session):
    # n_removed must equal dup_ngram_coverage's covered_tokens doc-by-doc
    from rastertiler_rs_ray.pipelines.curation import (
        dup_ngram_coverage,
        remove_dup_ngrams,
    )

    rng = np.random.default_rng(11)
    vocab = np.array(["a", "b", "c", "d"], dtype=object)
    rows = [
        (i, " ".join(vocab[rng.integers(0, 4, rng.integers(3, 25))]))
        for i in range(30)
    ]
    cov = (
        dup_ngram_coverage(_docs(rows), n=3, num_shards=4, join_partitions=4)
        .to_pandas().set_index("doc_id")["covered_tokens"].sort_index()
    )
    rem = (
        remove_dup_ngrams(_docs(rows), n=3, num_shards=5)
        .to_pandas().set_index("doc_id")["n_removed"].sort_index()
    )
    assert cov.to_dict() == rem.to_dict()


def _src_docs(rows):
    # rows: (doc_id, source)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _brute_cap(rows, cap):
    # reference: k-smallest (splitmix64(doc_id), doc_id) per source
    from rastertiler_rs_ray.pipelines.curation import _mix64_i64

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    h = _mix64_i64(ids)
    order = sorted(range(len(rows)), key=lambda i: (int(h[i]), int(ids[i])))
    kept, seen = set(), {}
    for i in order:
        s = rows[i][1]
        if seen.get(s, 0) < cap:
            seen[s] = seen.get(s, 0) + 1
            kept.add(int(ids[i]))
    return kept


def test_cap_per_source_matches_brute_force(ray_session):
    from rastertiler_rs_ray.pipelines.curation import cap_per_source

    rng = np.random.default_rng(3)
    rows = [(i, f"host{int(rng.integers(0, 5))}") for i in range(200)]
    out = cap_per_source(_src_docs(rows), cap=7).to_pandas()
    # exactly min(cap, n_source) rows per source, and the right ones
    counts = out.groupby("source").size().to_dict()
    import collections

    truth = collections.Counter(s for _, s in rows)
    assert counts == {s: min(7, c) for s, c in truth.items()}
    assert set(out["doc_id"]) == _brute_cap(rows, 7)


def test_cap_per_source_partition_and_salt_invariance(ray_session):
    from rastertiler_rs_ray.pipelines.curation import cap_per_source

    # one hot source (120 docs) + long tail; selection must not depend
    # on block layout or on the salt-shard count
    rows = [(i, "hot" if i % 3 else f"h{i % 17}") for i in range(180)]
    a = cap_per_source(_src_docs(rows), cap=9).to_pandas()
    b = cap_per_source(
        _src_docs(rows).repartition(11), cap=9, salt_shards=4
    ).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["doc_id"]) == _brute_cap(rows, 9)


def test_cap_per_source_carry_cols_and_under_cap(ray_session):
    from rastertiler_rs_ray.pipelines.curation import cap_per_source

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["a", "a", "b"], pa.string()),
                "lang": pa.array(["en", "fr", "de"], pa.string()),
            }
        )
    )
    out = cap_per_source(ds, cap=10, carry_cols=("lang",)).to_pandas()
    # under-cap sources pass through whole, carry columns intact
    assert sorted(out.columns) == ["doc_id", "lang", "source"]
    assert len(out) == 3
    assert set(zip(out["doc_id"], out["lang"])) == {(1, "en"), (2, "fr"), (3, "de")}


def _budget_brute(rows, budget):
    # rows: (doc_id, group, n_tokens, score); global rule: per group,
    # (score desc, doc_id asc) prefix while running total <= budget
    kept = set()
    import collections

    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r[1]].append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: (-r[3], r[0]))
        cum = 0
        for r in rs:
            cum += r[2]
            if cum <= budget:
                kept.add(r[0])
            else:
                break
    return kept


def _budget_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
                "score": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def test_select_by_token_budget_matches_prefix_rule(ray_session):
    from rastertiler_rs_ray.pipelines.curation import select_by_token_budget

    rng = np.random.default_rng(19)
    rows = [
        (
            i,
            f"g{int(rng.integers(0, 4))}",
            int(rng.integers(5, 60)),
            float(rng.integers(0, 50)) / 50.0,  # coarse scores -> many ties
        )
        for i in range(300)
    ]
    out = select_by_token_budget(_budget_ds(rows), 400).to_pandas()
    assert set(out["doc_id"]) == _budget_brute(rows, 400)
    assert sorted(out.columns) == ["doc_id", "lang", "n_tokens"]
    # per-group totals respect the budget
    assert (out.groupby("lang")["n_tokens"].sum() <= 400).all()


def test_select_by_token_budget_partition_invariance_and_fit(ray_session):
    from rastertiler_rs_ray.pipelines.curation import select_by_token_budget

    rng = np.random.default_rng(23)
    rows = [
        (i, f"g{int(rng.integers(0, 3))}", int(rng.integers(1, 30)),
         float(rng.random()))
        for i in range(150)
    ]
    a = select_by_token_budget(_budget_ds(rows), 250).to_pandas()
    b = select_by_token_budget(
        _budget_ds(rows).repartition(13), 250, bins=64
    ).to_pandas()
    srt = lambda d: d.sort_values("doc_id").reset_index(drop=True)
    assert srt(a).equals(srt(b))  # also invariant to bin count
    # a budget larger than any group keeps everything
    full = select_by_token_budget(_budget_ds(rows), 10**9).to_pandas()
    assert len(full) == len(rows)


def _chunk_reference(texts, C, S):
    """Brute-force chunking oracle."""
    out = []
    for did, text in texts:
        toks = text.split()
        n = len(toks)
        if n == 0:
            continue
        nch = 1 + max(0, -(-(n - C) // S))
        for i in range(nch):
            s, e = i * S, min(i * S + C, n)
            out.append((did, i, " ".join(toks[s:e]), e - s))
    return sorted(out)


def test_chunk_documents_matches_reference(ray_session):
    from rastertiler_rs_ray.pipelines.curation import chunk_documents

    texts = [
        (0, "a b c d e f g h i j"),          # n=10 > C: multi-chunk
        (1, "x y"),                           # short: one chunk
        (2, ""),                              # empty: none
        (3, " ".join(f"t{i}" for i in range(8))),   # n == C: one chunk
        (4, " ".join(f"u{i}" for i in range(12))),  # n = C + S: two chunks
        (5, " ".join(f"v{i}" for i in range(13))),  # straddles stride edge
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([t[0] for t in texts], pa.int64()),
            "text": pa.array([t[1] for t in texts], pa.string()),
        }
    )
    got = (
        chunk_documents(
            ray.data.from_arrow(tbl).repartition(3), chunk_tokens=8, stride=4
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    want = _chunk_reference(texts, 8, 4)
    assert list(map(tuple, got.to_numpy())) == want
    # overlap contract: consecutive chunks share C - S tokens
    full = got[got["doc_id"] == 0].reset_index(drop=True)
    first, second = full["chunk_text"][0].split(), full["chunk_text"][1].split()
    assert first[4:] == second[:4]


def test_chunk_documents_covers_every_token(ray_session):
    from rastertiler_rs_ray.pipelines.curation import chunk_documents

    rng = np.random.RandomState(5)
    texts = [
        (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(0, 40))))
        for i in range(50)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([t[0] for t in texts], pa.int64()),
            "text": pa.array([t[1] for t in texts], pa.string()),
        }
    )
    got = chunk_documents(
        ray.data.from_arrow(tbl).repartition(4), chunk_tokens=16, stride=8
    ).to_pandas()
    for did, text in texts:
        toks = set(text.split())
        covered = set()
        for ct in got.loc[got["doc_id"] == did, "chunk_text"]:
            covered.update(ct.split())
        assert covered == toks, did


def _brute_split(doc_ids, pairs, train_pct=80):
    """Reference union-find + splitmix64 side rule."""
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    from rastertiler_rs_ray.pipelines.curation import _mix64_i64

    out = {}
    for d in doc_ids:
        comp = find(d)
        h = int(_mix64_i64(np.asarray([comp], dtype=np.int64))[0])
        out[d] = (comp, "train" if h % 100 < train_pct else "eval")
    return out


def test_leakage_safe_split_conformance(ray_session):
    from rastertiler_rs_ray.pipelines.curation import leakage_safe_split

    rng = np.random.RandomState(11)
    doc_ids = list(range(200))
    # planted near-dup clusters of sizes 2..6 plus many singletons
    pairs = []
    base = 0
    for size in (2, 3, 4, 5, 6):
        members = list(range(base, base + size))
        pairs += [(members[i], members[i + 1]) for i in range(size - 1)]
        base += size + 7
    pairs += [(150, 151), (151, 152)]
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": doc_ids})).repartition(4)
    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [u for u, _ in pairs], "v": [v for _, v in pairs]})
    )
    out = (
        leakage_safe_split(docs, edges, train_pct=80)
        .to_pandas()
        .sort_values("doc_id")
    )
    exp = _brute_split(doc_ids, pairs)
    assert list(out["component"]) == [exp[d][0] for d in doc_ids]
    assert list(out["split"]) == [exp[d][1] for d in doc_ids]
    # the invariant that motivates the operator: one component, one side
    g = out.groupby("component")["split"].nunique()
    assert (g == 1).all()
    # both sides are populated at this size
    assert set(out["split"]) == {"train", "eval"}


def test_leakage_safe_split_no_pairs_is_row_hash(ray_session):
    from rastertiler_rs_ray.pipelines.curation import leakage_safe_split

    doc_ids = list(range(50))
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": doc_ids}))
    edges = ray.data.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out = (
        leakage_safe_split(docs, edges, train_pct=80)
        .to_pandas()
        .sort_values("doc_id")
    )
    exp = _brute_split(doc_ids, [])
    assert list(out["component"]) == doc_ids
    assert list(out["split"]) == [exp[d][1] for d in doc_ids]


def test_training_shards_conformance(ray_session):
    from rastertiler_rs_ray.pipelines.curation import _mix64_i64, training_shards

    ids = np.arange(300, dtype=np.int64)
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(5)
    out = (
        training_shards(docs, num_shards=8)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    h = _mix64_i64(ids)
    exp = pd.DataFrame(
        {"doc_id": ids, "shard": (h % np.uint64(8)).astype(np.int64), "h": h}
    )
    exp = exp.sort_values(["shard", "h", "doc_id"]).reset_index(drop=True)
    exp["pos"] = exp.groupby("shard").cumcount()
    assert list(out["doc_id"]) == list(exp["doc_id"])
    assert list(out["shard"]) == list(exp["shard"])
    assert list(out["pos"]) == list(exp["pos"])
    # every shard's positions are dense 0..k-1
    sizes = out.groupby("shard")["pos"].max() + 1
    assert int(sizes.sum()) == len(ids)


def test_training_shards_partition_invariance(ray_session):
    from rastertiler_rs_ray.pipelines.curation import training_shards

    ids = np.arange(120, dtype=np.int64)
    a = (
        training_shards(
            ray.data.from_pandas(pd.DataFrame({"doc_id": ids})), num_shards=4
        )
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    b = (
        training_shards(
            ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(11),
            num_shards=4,
        )
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_mix_to_weights_quotas_and_membership(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.curation import _mix64_i64, mix_to_weights

    # sources a(30 docs), b(20), c(5), d(10); d absent from the recipe
    sizes = {"a": 30, "b": 20, "c": 5, "d": 10}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])

    weights = {"a": 2.0, "b": 1.0, "c": 1.0}  # quotas over target 24: 12, 6, 6→cap 5
    got = mix_to_weights(
        ray.data.from_pandas(df).repartition(5), weights, target_n=24, salt_shards=4
    ).to_pandas()

    by_src = got.groupby("source").size().to_dict()
    assert by_src == {"a": 12, "b": 6, "c": 5}  # c capped at its size; d absent

    # membership = k smallest splitmix64(doc_id) per source
    for s, k in [("a", 12), ("b", 6), ("c", 5)]:
        ids = df[df["source"] == s]["doc_id"].to_numpy()
        h = _mix64_i64(ids).view(np.uint64)
        want = set(ids[np.lexsort((ids, h))][:k].tolist())
        assert set(got[got["source"] == s]["doc_id"]) == want


def test_source_overlap_matrix_brute_force(ray_session):
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.curation import source_overlap_matrix

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b", "c"],
            "text": [
                "w x y z q",          # grams: 'w x y z', 'x y z q'
                "w x y z",            # dup gram within a → counted once
                "w x y z extra",      # shares 'w x y z' with a
                "totally different gram stream here",
            ],
        }
    )
    got = (
        source_overlap_matrix(
            ray.data.from_pandas(df).repartition(3), n=4, num_shards=4
        )
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    # brute force: distinct grams a={wxyz, xyzq}, b={wxyz, xyz extra}, c={...}
    assert got[["src_a", "src_b"]].values.tolist() == [["a", "b"]]
    assert got["shared"].tolist() == [1]


def test_source_overlap_matrix_hot_gram_cap(ray_session):
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.curation import source_overlap_matrix

    # one stopword-like gram shared by ALL 4 sources + one pair-private gram
    df = pd.DataFrame(
        {
            "source": ["a", "b", "c", "d", "a", "b"],
            "text": ["the end of file"] * 4 + ["rare gram only here"] * 2,
        }
    )
    full = source_overlap_matrix(
        ray.data.from_pandas(df), n=4, num_shards=2
    ).to_pandas()
    assert full["shared"].sum() == 6 + 1  # C(4,2) hot + 1 rare

    capped = source_overlap_matrix(
        ray.data.from_pandas(df), n=4, num_shards=2, max_sources_per_gram=2
    ).to_pandas()
    assert capped["shared"].sum() == 1  # hot gram dropped, rare pair kept
