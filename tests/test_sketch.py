"""HLL approximate distinct: accuracy vs exact, determinism, merge law."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_vs_exact(ray_session):
    from rastertiler_rs_ray.pipelines.sketch import approx_distinct

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    est = approx_distinct(ev, "user_id", p=12)
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # event_id is unique -> cardinality == row count (larger domain)
    ei = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    n = ei.count()
    est2 = approx_distinct(ei, "event_id", p=12)
    assert abs(est2 - n) / n < 0.05, (est2, n)


def test_hll_deterministic_and_merge_invariant(ray_session):
    from rastertiler_rs_ray.pipelines.sketch import approx_distinct

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    a = approx_distinct(ev, "user_id", p=12)
    b = approx_distinct(ev.repartition(7), "user_id", p=12)  # different block split
    assert a == b  # register-max merge is associative/commutative


def test_hll_estimate_registers_roundtrip():
    from rastertiler_rs_ray.pipelines.sketch import _mix64, hll_estimate

    # tiny exact case: all registers zero -> linear counting -> 0-ish
    empty = pa.table({"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())})
    assert hll_estimate(empty, p=12) == 0.0
    # avalanche sanity: sequential ints spread across buckets
    h = _mix64(np.arange(10000, dtype=np.uint64))
    buckets = h >> np.uint64(52)
    assert len(np.unique(buckets)) > 3500


def test_cms_heavy_hitters_match_exact_topk(ray_session):
    """On skewed data with ample width, heavy_hitters returns the exact
    top-k with exact counts, invariant to partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from rastertiler_rs_ray.pipelines.sketch import heavy_hitters

    rng = np.random.RandomState(3)
    words = [f"w{i:03d}" for i in range(200)]
    # zipf-ish frequencies
    freqs = (2000 / (np.arange(200) + 1)).astype(int) + 1
    vals = np.repeat(words, freqs)
    rng.shuffle(vals)
    tbl = pa.table({"word": pa.array(vals, pa.string())})
    exact = (
        pd.Series(vals).value_counts().reset_index()
        .rename(columns={"index": "word", 0: "n"})
    )
    for parts in (1, 7):
        out = heavy_hitters(
            ray.data.from_arrow(tbl).repartition(parts), "word", k=10, width_log2=14
        ).to_pandas()
        assert list(out["word"]) == list(exact["word"].head(10))
        assert list(out["n"]) == list(exact.iloc[:, 1].head(10))


def test_cms_overcounts_only_and_merges(ray_session):
    import numpy as np

    from rastertiler_rs_ray.pipelines.sketch import CountMinSketch, _hash_keys

    keys = np.array([f"k{i}" for i in range(5000)], dtype=object)
    counts = np.arange(1, 5001, dtype=np.uint64)
    a = CountMinSketch(width_log2=10)  # deliberately tight -> collisions
    half = 2500
    a.add_many(_hash_keys(keys[:half]), counts[:half])
    b = CountMinSketch(width_log2=10)
    b.add_many(_hash_keys(keys[half:]), counts[half:])
    m = a.merge(b)
    est = m.estimate(_hash_keys(keys))
    assert (est >= counts.astype(np.int64)).all()  # never undercounts
    rt = CountMinSketch.from_bytes(m.to_bytes(), 10, 4)
    assert (rt.estimate(_hash_keys(keys)) == est).all()


def test_cms_heavy_hitters_integer_keys(ray_session):
    """Non-string key columns must rank correctly: candidate values keep
    their native type so final estimates hash the same keys the sketch
    counted (a stringified-candidate regression returned noise)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rastertiler_rs_ray.pipelines.sketch import heavy_hitters

    vals = np.concatenate([np.repeat(7, 500), np.repeat(42, 300), np.arange(1000, 1200)])
    rng = np.random.RandomState(1)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.int64())})).repartition(5)
    out = heavy_hitters(ds, "k", k=2).to_pandas()
    assert out["word"].dtype == np.int64
    assert list(out["word"]) == [7, 42] and list(out["n"]) == [500, 300]


def test_grouped_approx_distinct_accuracy_and_partition_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.sketch import grouped_approx_distinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 20000),
            "v": np.concatenate(
                [
                    rng.integers(0, 500, 20000),     # ~500 distinct
                    rng.integers(0, 5000, 20000),    # ~5000 distinct
                    np.arange(20000),                # exactly 20000 distinct
                ]
            ).astype(np.int64),
        }
    )
    exact = df.groupby("g")["v"].nunique()

    outs = []
    for parts in (2, 9):
        got = (
            grouped_approx_distinct(
                ray.data.from_pandas(df).repartition(parts), "g", "v", p=12
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        outs.append(got)
        for _, r in got.iterrows():
            rel = abs(r["estimate"] - exact[r["g"]]) / exact[r["g"]]
            assert rel < 0.05, (r["g"], r["estimate"], exact[r["g"]])
    # register merge is max-associative → estimates identical across splits
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hll_set_overlap(ray_session):
    from rastertiler_rs_ray.pipelines.sketch import hll_set_overlap

    rng = np.random.default_rng(6)
    a_keys = np.arange(0, 3000, dtype=np.int64)
    b_keys = np.arange(2000, 6000, dtype=np.int64)  # true overlap 1000
    a = ray.data.from_arrow(pa.table({"k": pa.array(rng.permutation(a_keys))}))
    b = ray.data.from_arrow(pa.table({"k": pa.array(rng.permutation(b_keys))}))
    out = hll_set_overlap(a, b, "k", p=12).to_pandas().set_index("metric")
    # ~1.6% standard error at p=12; allow 10%
    assert abs(out.loc["a", "estimate"] - 3000) / 3000 < 0.1
    assert abs(out.loc["b", "estimate"] - 4000) / 4000 < 0.1
    assert abs(out.loc["union", "estimate"] - 6000) / 6000 < 0.1
    assert abs(out.loc["intersection", "estimate"] - 1000) / 1000 < 0.25
    # identity: a + b - union == intersection (exact by construction)
    assert np.isclose(
        out.loc["a", "estimate"]
        + out.loc["b", "estimate"]
        - out.loc["union", "estimate"],
        out.loc["intersection", "estimate"],
        atol=0.3,
    )
