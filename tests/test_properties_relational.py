"""Property tests: window/sample/as-of operators vs in-memory references
on randomized inputs (small frames, few examples — each example runs
real Ray Data jobs)."""

import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st


def _frames(draw, n_max=40, keys=4):
    n = draw(st.integers(min_value=1, max_value=n_max))
    k = draw(st.lists(st.integers(0, keys - 1), min_size=n, max_size=n))
    t = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    v = draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n))
    return pd.DataFrame(
        {"k": k, "t": t, "v": [float(x) for x in v], "rid": range(n)}
    )


@st.composite
def frames(draw):
    return _frames(draw)


@settings(max_examples=5, deadline=None)
@given(frames())
def test_sessionize_matches_reference(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import sessionize

    df = df.copy()
    df["ts"] = pd.to_datetime(df["t"], unit="s")
    got = (
        sessionize(ray.data.from_pandas(df), ["k"], ["ts", "rid"], "ts", gap_seconds=5)
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    ref = df.sort_values(["ts", "rid"]).copy()
    out = {}
    for _, g in ref.groupby("k"):
        d = g["ts"].diff()
        sid = (d.isna() | (d > pd.Timedelta(seconds=5))).cumsum()
        out.update(dict(zip(g["rid"], sid)))
    assert got["session_id"].tolist() == [int(out[r]) for r in got["rid"]]


@settings(max_examples=5, deadline=None)
@given(frames())
def test_grouped_top_n_matches_reference(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import grouped_top_n

    got = (
        grouped_top_n(ray.data.from_pandas(df), ["k"], order_col="v", n=3,
                      tiebreak_cols=["rid"])
        .to_pandas().sort_values(["k", "rnk"]).reset_index(drop=True)
    )
    ref = (
        df.sort_values(["v", "rid"], ascending=[False, True])
        .groupby("k").head(3)
    )
    ref = ref.sort_values(["k", "v", "rid"], ascending=[True, False, True])
    assert got["rid"].tolist() == ref["rid"].tolist()
    # ranks contiguous from 1 within each group
    assert all((g["rnk"] == range(1, len(g) + 1)).all()
               for _, g in got.groupby("k"))


@settings(max_examples=5, deadline=None)
@given(frames())
def test_asof_join_matches_linear_scan(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import asof_join

    half = len(df) // 2
    left, right = df.iloc[:half], df.iloc[half:]
    if len(left) == 0 or len(right) == 0:
        return
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", left_ts="t", right_ts="t", out_col="m",
    ).to_pandas()
    expect = {}
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["t"] <= lr["t"])]["t"]
        if len(cand):
            expect[lr["rid"]] = cand.max()
    if not expect:
        assert len(got) == 0  # all-empty groups lose schema; rows must be 0
        return
    got = got.sort_values("rid").reset_index(drop=True)
    assert sorted(got["rid"]) == sorted(expect)
    for _, r in got.iterrows():
        assert r["m"] == expect[r["rid"]]


@settings(max_examples=5, deadline=None)
@given(frames())
def test_discrete_quantiles_matches_rank_rule(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import discrete_quantiles

    qs = [0.1, 0.5, 0.9]
    out = discrete_quantiles(ray.data.from_pandas(df), "v", qs).to_pandas()
    vals = np.sort(df["v"].to_numpy())
    n = len(vals)
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        want = vals[rank - 1]
        assert out[out["q"] == q]["value"].iloc[0] == want


@settings(max_examples=5, deadline=None)
@given(frames())
def test_windowed_rank_matches_pandas_reference(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import windowed_rank

    got = (
        windowed_rank(
            ray.data.from_pandas(df).repartition(3), ["k"],
            order_col="v", method="dense", keep_rank_le=2,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = df.copy()
    ref["rnk"] = (
        ref.groupby("k")["v"].rank(method="dense", ascending=False).astype(np.int64)
    )
    ref = ref[ref["rnk"] <= 2].sort_values("rid").reset_index(drop=True)
    assert got["rid"].tolist() == ref["rid"].tolist()
    assert got["rnk"].tolist() == ref["rnk"].tolist()


@settings(max_examples=5, deadline=None)
@given(frames(), frames())
def test_set_ops_match_pandas_reference(ray_session, dl, dr):
    from rastertiler_rs_ray.pipelines.relational import (
        dataset_except,
        dataset_intersect,
    )

    keys = ["k", "t"]
    ld = ray.data.from_pandas(dl).repartition(2)
    rd = ray.data.from_pandas(dr).repartition(3)
    lt = set(map(tuple, dl[keys].values.tolist()))
    rt = set(map(tuple, dr[keys].values.tolist()))

    inter = dataset_intersect(ld, rd, keys).to_pandas()
    assert set(map(tuple, inter.values.tolist())) == (lt & rt)
    assert len(inter) == len(inter.drop_duplicates())

    exc = dataset_except(ld, rd, keys).to_pandas()
    assert set(map(tuple, exc.values.tolist())) == (lt - rt)
    assert len(exc) == len(exc.drop_duplicates())


@settings(max_examples=5, deadline=None)
@given(frames())
def test_latest_by_key_matches_pandas_reference(ray_session, df):
    from rastertiler_rs_ray.pipelines.relational import latest_by_key

    got = latest_by_key(
        ray.data.from_pandas(df).repartition(3), "k", ["t", "rid"], num_shards=4
    ).to_pandas()
    ref = (
        df.sort_values(["k", "t", "rid"], ascending=[True, False, False])
        .drop_duplicates("k", keep="first")
    )
    assert sorted(got["rid"].tolist()) == sorted(ref["rid"].tolist())


@settings(max_examples=5, deadline=None)
@given(frames(), st.integers(2, 5))
def test_upsert_latest_matches_pandas_reference(ray_session, df, mod):
    from rastertiler_rs_ray.pipelines.relational import upsert_latest

    base = df[["k", "v"]].drop_duplicates("k").copy()
    base["version"] = 0
    base["deleted"] = False
    chg = base[base["k"] % mod == 0].copy()
    chg["v"] = chg["v"] + 1000
    chg["version"] = 1
    chg["deleted"] = chg["k"] % (mod * 2) == 0
    got = upsert_latest(
        ray.data.from_pandas(base).repartition(2),
        ray.data.from_pandas(chg).repartition(2),
        key_col="k", version_col="version", deleted_col="deleted",
        num_shards=4,
    ).to_pandas()
    u = pd.concat([base.assign(__s=0), chg.assign(__s=1)])
    win = (
        u.sort_values(["k", "version", "__s"], ascending=[True, False, False])
        .drop_duplicates("k", keep="first")
    )
    win = win[~win["deleted"]].sort_values("k")
    if not len(win):
        # every key tombstoned → empty result (schema-less empty Dataset)
        assert len(got) == 0
        return
    got = got.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == win["k"].tolist()
    assert got["v"].tolist() == win["v"].tolist()
