"""numeric_profile / correlation_matrix vs numpy and DuckDB semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _table(n=500, seed=3):
    rng = np.random.RandomState(seed)
    a = rng.uniform(0, 100, n)
    b = 2.5 * a + rng.normal(0, 10, n)  # strongly correlated with a
    c = rng.uniform(-5, 5, n)  # independent
    return pa.table({"a": a, "b": b, "c": c})


def test_numeric_profile_matches_numpy(ray_session):
    from rastertiler_rs_ray.pipelines.profile import numeric_profile

    tbl = _table()
    out = numeric_profile(
        ray.data.from_arrow(tbl).repartition(7), ["a", "b", "c"]
    ).set_index("col")
    for c in ("a", "b", "c"):
        v = np.asarray(tbl.column(c))
        assert out.loc[c, "n"] == len(v) and out.loc[c, "n_null"] == 0
        assert np.isclose(out.loc[c, "mean"], v.mean(), rtol=1e-12)
        assert np.isclose(out.loc[c, "stddev"], v.std(ddof=1), rtol=1e-9)
        assert out.loc[c, "min"] == v.min() and out.loc[c, "max"] == v.max()


def test_numeric_profile_counts_nulls(ray_session):
    from rastertiler_rs_ray.pipelines.profile import numeric_profile

    tbl = pa.table({"x": pa.array([1.0, None, 3.0, None, 5.0])})
    out = numeric_profile(ray.data.from_arrow(tbl).repartition(2), ["x"])
    r = out.iloc[0]
    assert r["n"] == 3 and r["n_null"] == 2
    assert r["mean"] == 3.0 and r["min"] == 1.0 and r["max"] == 5.0


def test_correlation_matrix_matches_numpy(ray_session):
    from rastertiler_rs_ray.pipelines.profile import correlation_matrix

    tbl = _table()
    out = correlation_matrix(
        ray.data.from_arrow(tbl).repartition(7), ["a", "b", "c"]
    )
    x = np.column_stack([np.asarray(tbl.column(c)) for c in ("a", "b", "c")])
    ref = np.corrcoef(x, rowvar=False)
    got = {(r["col_a"], r["col_b"]): r["corr"] for _, r in out.iterrows()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert np.isclose(got[("a", "b")], ref[0, 1], rtol=1e-10)
    assert got[("a", "b")] > 0.9  # planted correlation is detected
    assert abs(got[("a", "c")]) < 0.2
    assert np.isclose(got[("a", "c")], ref[0, 2], rtol=1e-8)
    assert np.isclose(got[("b", "c")], ref[1, 2], rtol=1e-8)


def test_correlation_matrix_listwise_null_drop(ray_session):
    from rastertiler_rs_ray.pipelines.profile import correlation_matrix

    df = pd.DataFrame({"u": [1.0, 2.0, np.nan, 4.0, 5.0],
                       "v": [2.0, 4.0, 6.0, 8.0, np.nan]})
    out = correlation_matrix(ray.data.from_pandas(df).repartition(2), ["u", "v"])
    kept = df.dropna()
    ref = np.corrcoef(kept["u"], kept["v"])[0, 1]
    assert np.isclose(out.iloc[0]["corr"], ref, rtol=1e-12)


def test_group_zscore_matches_pandas(ray_session):
    from rastertiler_rs_ray.pipelines.profile import group_zscore

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 400),
            "v": rng.uniform(10, 1000, 400).round(2),
            "tag": np.arange(400),
        }
    )
    out = (
        group_zscore(ray.data.from_pandas(df).repartition(5), ["g"], "v")
        .to_pandas()
        .sort_values("tag")
        .reset_index(drop=True)
    )
    want = df.groupby("g")["v"].transform(lambda s: (s - s.mean()) / s.std(ddof=0))
    np.testing.assert_allclose(out["z"].to_numpy(), want.to_numpy(), rtol=1e-9)
    # non-z columns pass through untouched
    assert (out["v"].to_numpy() == df["v"].to_numpy()).all()


def test_group_zscore_zero_variance_group_is_null(ray_session):
    from rastertiler_rs_ray.pipelines.profile import group_zscore

    df = pd.DataFrame({"g": ["a", "a", "b", "b"], "v": [5.0, 5.0, 1.0, 3.0]})
    out = (
        group_zscore(ray.data.from_pandas(df), ["g"], "v")
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    assert out.loc[out["g"] == "a", "z"].isna().all()
    np.testing.assert_allclose(
        out.loc[out["g"] == "b", "z"].to_numpy(), [-1.0, 1.0]
    )


def test_validate_expectations(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.profile import validate_expectations

    df = pd.DataFrame(
        {
            "a": [1.0, None, 3.0, None, 5.0, 6.0],
            "b": [0.0, 5.0, -1.0, 11.0, 10.0, 3.0],
            "c": ["x", "y", "z", "x", None, "x"],
            "k": [1, 2, 2, 3, 3, 3],
        }
    )
    got = (
        validate_expectations(
            ray.data.from_pandas(df).repartition(3),
            [
                {"kind": "not_null", "col": "a"},              # 2 nulls
                {"kind": "in_range", "col": "b", "lo": 0.0, "hi": 10.0},  # -1, 11
                {"kind": "accepted_values", "col": "c", "values": ["x", "y"]},  # z
                {"kind": "matches", "col": "c", "pattern": "[xy]"},  # z fails
                {"kind": "unique", "col": "k"},                # 1 + 2 excess
            ],
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    assert got["rule"].tolist() == [
        "not_null", "in_range", "accepted_values", "matches", "unique",
    ]
    assert got["violations"].tolist() == [2, 2, 1, 1, 3]
    assert got["col"].tolist() == ["a", "b", "c", "c", "k"]


def test_validate_expectations_clean_data_zero_violations(ray_session):
    import pandas as pd
    import ray.data

    from rastertiler_rs_ray.pipelines.profile import validate_expectations

    df = pd.DataFrame({"k": [1, 2, 3], "v": [0.5, 0.6, 0.7]})
    got = validate_expectations(
        ray.data.from_pandas(df),
        [
            {"kind": "unique", "col": "k"},
            {"kind": "in_range", "col": "v", "lo": 0.0, "hi": 1.0},
        ],
    ).to_pandas()
    assert got["violations"].tolist() == [0, 0]
