"""Relational surface vs DuckDB oracle on the driver's sf0.001 tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.relational import (
    anti_join,
    broadcast_hash_join,
    distinct,
    filter_project,
    grouped_aggregate,
    grouped_top_n,
    hash_sample,
    lag_within_groups,
    semi_join,
    top_k,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def db():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "region", "documents", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_grouped_aggregate_matches_duckdb(ray_session, db):
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    got = (
        grouped_aggregate(
            li,
            ["l_returnflag", "l_linestatus"],
            [
                ("sum_qty", "l_quantity", "sum"),
                ("min_price", "l_extendedprice", "min"),
                ("max_price", "l_extendedprice", "max"),
                ("avg_price", "l_extendedprice", "mean"),
                ("count_order", "l_quantity", "count"),
            ],
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    want = db.execute(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
                  min(l_extendedprice) min_price, max(l_extendedprice) max_price,
                  avg(l_extendedprice) avg_price, count(*) count_order
           FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    assert len(got) == len(want)
    assert (got["sum_qty"] - want["sum_qty"]).abs().max() < 1e-6
    assert (got["avg_price"] - want["avg_price"]).abs().max() < 1e-6
    assert (got["count_order"] == want["count_order"]).all()
    assert (got["min_price"] == want["min_price"]).all()


def test_broadcast_join_matches_duckdb(ray_session, db):
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet")
    j = broadcast_hash_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey", right_cols=["c_mktsegment"]
    )
    got = (
        grouped_aggregate(j, ["c_mktsegment"], [("total", "o_totalprice", "sum"), ("n", "o_orderkey", "count")])
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    want = db.execute(
        """SELECT c_mktsegment, sum(o_totalprice) total, count(*) n
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1 ORDER BY 1"""
    ).df()
    assert (got["n"] == want["n"]).all()
    assert (got["total"] - want["total"]).abs().max() < 1e-6


def test_top_k_matches_duckdb(ray_session, db):
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = top_k(orders, 10, "o_totalprice", columns=["o_orderkey", "o_totalprice"])
    want = db.execute(
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 10"
    ).df()
    assert got.column("o_orderkey").to_pylist() == want["o_orderkey"].tolist()


def test_distinct_matches_duckdb(ray_session, db):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = distinct(docs, ["lang", "source"]).to_pandas().sort_values(["lang", "source"])
    want = db.execute("SELECT DISTINCT lang, source FROM documents ORDER BY 1,2").df()
    assert got.reset_index(drop=True).equals(want)


def test_semi_anti_join_partition(ray_session, db):
    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    okeys = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"]).rename_columns(
        ["c_custkey"]
    )
    n_semi = semi_join(cust, okeys, on="c_custkey").count()
    n_anti = anti_join(cust, okeys, on="c_custkey").count()
    assert n_semi + n_anti == cust.count()
    want = db.execute(
        "SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ).fetchone()[0]
    assert n_semi == want


def test_filter_project(ray_session, db):
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    got = filter_project(
        li,
        predicate=lambda b: pc.greater(b.column("l_quantity"), 45.0),
        columns=["l_orderkey", "l_quantity"],
    )
    want = db.execute("SELECT count(*) FROM lineitem WHERE l_quantity > 45").fetchone()[0]
    assert got.count() == want
    assert got.schema().names == ["l_orderkey", "l_quantity"]


def test_hash_sample_deterministic(ray_session, db):
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = sorted(
        hash_sample(ev, key="event_id", percent=5)
        .to_pandas()["event_id"]
        .tolist()
    )
    want = db.execute(
        "SELECT event_id FROM events WHERE (event_id * 2654435761) % 100 < 5 ORDER BY 1"
    ).df()["event_id"].tolist()
    assert got == want
    # same rows on a second run (resumability of the sample)
    again = sorted(
        hash_sample(ev, key="event_id", percent=5).to_pandas()["event_id"].tolist()
    )
    assert again == got


def test_grouped_top_n_matches_window_sql(ray_session, db):
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = (
        grouped_top_n(
            ev.select_columns(["event_id", "user_id", "value"]),
            ["user_id"], order_col="value", n=3, tiebreak_cols=["event_id"],
        )
        .to_pandas()
        .sort_values(["user_id", "rnk"])
        .reset_index(drop=True)
    )
    want = db.execute(
        """SELECT event_id, user_id, value,
                  CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS BIGINT) AS rnk
           FROM events QUALIFY rnk <= 3 ORDER BY user_id, rnk"""
    ).df()
    assert got[["event_id", "user_id", "rnk"]].equals(want[["event_id", "user_id", "rnk"]])
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()


def test_lag_within_groups_matches_window_sql(ray_session, db):
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = (
        lag_within_groups(
            ev.select_columns(["event_id", "user_id", "ts", "value"]),
            ["user_id"], ["ts", "event_id"], "value",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = db.execute(
        """SELECT event_id, user_id, value,
                  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS prev_value
           FROM events ORDER BY event_id"""
    ).df()
    import numpy as np

    g, w = got["prev_value"].to_numpy(), want["prev_value"].to_numpy()
    assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()
    # exactly one NULL (group head) per user
    heads = got[got["prev_value"].isna()]["user_id"].value_counts()
    assert (heads == 1).all()


def test_sessionize_matches_window_sql(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import sessionize

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = (
        sessionize(
            ev.select_columns(["event_id", "user_id", "ts"]),
            ["user_id"], ["ts", "event_id"], "ts", gap_seconds=1800,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = db.execute(
        """WITH lagged AS (
             SELECT event_id, user_id, ts,
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             FROM events)
           SELECT event_id,
                  CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM lagged ORDER BY event_id"""
    ).df()
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()
    # sessions are 1-based and contiguous per user
    per_user = got.groupby("user_id")["session_id"]
    assert (per_user.min() == 1).all()


def test_bloom_prefilter_no_false_negatives(ray_session, db):
    import numpy as np

    from rastertiler_rs_ray.functions.bloom import Bloom
    from rastertiler_rs_ray.pipelines.relational import bloom_semi_prefilter

    cust = ray.data.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    okeys = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    pre = set(
        bloom_semi_prefilter(cust, okeys, on="c_custkey", key_col="o_custkey",
                             bits_log2=14)
        .to_pandas()["c_custkey"]
    )
    exact = set(
        r[0] for r in db.execute("SELECT DISTINCT o_custkey FROM orders").fetchall()
    ) & set(
        r[0] for r in db.execute("SELECT c_custkey FROM customer").fetchall()
    )
    assert exact <= pre  # zero false negatives, ever

    # direct FP-rate sanity on disjoint keys (theory: (1-e^{-kn/m})^k)
    b = Bloom(bits_log2=14, k=4)
    b.add_many(np.arange(1000, dtype=np.int64))
    fp = b.contains(np.arange(10**6, 10**6 + 20000, dtype=np.int64)).mean()
    n, m, k = 1000, 1 << 14, 4
    theory = (1 - np.exp(-k * n / m)) ** k
    assert fp < 3 * theory + 1e-3, (fp, theory)

    # serialization round-trip preserves membership
    b2 = Bloom.from_bytes(b.to_bytes(), 14, 4)
    assert b2.contains(np.arange(1000, dtype=np.int64)).all()


def test_word_counts_matches_unnest_sql(ray_session, db):
    from rastertiler_rs_ray.pipelines.textstats import word_counts

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = (
        word_counts(docs).to_pandas().sort_values("word").reset_index(drop=True)
    )
    want = db.execute(
        r"""SELECT w AS word, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents)
            GROUP BY w ORDER BY w"""
    ).df()
    assert got.equals(want)


def test_asof_join_interleaved_times(ray_session):
    import numpy as np
    import pandas as pd

    from rastertiler_rs_ray.pipelines.relational import asof_join

    # interleaved left/right times per key, incl. a key with no right rows
    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "t": [5, 10, 15, 3, 9, 7],
        "lid": [0, 1, 2, 3, 4, 5],
    })
    right = pd.DataFrame({"rk": [1, 1, 2, 2], "rt": [4, 12, 9, 20]})
    got = (
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", right_on="rk", left_ts="t", right_ts="rt", out_col="m",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # expected backward matches: t=5->4, 10->4, 15->12, 3->none, 9->9; k=3 none
    assert got["lid"].tolist() == [0, 1, 2, 4]
    assert got["m"].tolist() == [4, 4, 12, 9]

    con = duckdb.connect()
    con.register("left_df", left)
    con.register("right_df", right)
    want = con.execute(
        """SELECT lid, rt AS m FROM left_df ASOF JOIN right_df
           ON left_df.k = right_df.rk AND left_df.t >= right_df.rt ORDER BY lid"""
    ).df()
    assert got["m"].tolist() == want["m"].tolist()


def test_pivot_counts_matches_filter_sql(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import pivot_counts

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    got = (
        pivot_counts(ev, "user_id", "event_type",
                     ["click", "error", "purchase", "signup", "view"])
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want = db.execute(
        """SELECT user_id,
                  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
                  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
                  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
                  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
                  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
           FROM events GROUP BY user_id ORDER BY user_id"""
    ).df()
    assert got.equals(want)
    # row sums partition the events
    assert got[["click", "error", "purchase", "signup", "view"]].to_numpy().sum() == ev.count()


def test_range_join_matches_sql(ray_session, db):
    """Interval join vs DuckDB: same-user purchase within (click, +1h]."""
    from rastertiler_rs_ray.pipelines.relational import range_join

    HOUR = 3_600_000_000
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def pick(kind):
        def f(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind)).select(
                ["event_id", "user_id", "ts"]
            )
        return f

    out = range_join(
        ev.map_batches(pick("click"), batch_format="pyarrow"),
        ev.map_batches(pick("purchase"), batch_format="pyarrow"),
        on="user_id", left_ts="ts", right_ts="ts", lo=1, hi=HOUR,
        left_cols=["event_id"], right_cols=["event_id"],
    ).to_pandas()
    got = sorted(
        (int(a), int(b)) for a, b in zip(out["event_id"], out["event_id_r"])
    )
    want = db.execute(
        """SELECT a.event_id, b.event_id FROM events a JOIN events b
           ON a.user_id = b.user_id
           AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) + 1 AND epoch_us(a.ts) + 3600000000
           WHERE a.event_type = 'click' AND b.event_type = 'purchase'
           ORDER BY 1, 2"""
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]
    assert len(got) > 0, "fixture produced no in-range pairs — widen the window"


def test_range_join_bucket_boundaries(ray_session):
    """Pairs spanning a bucket boundary are found exactly once; out-of-
    range and cross-key pairs are excluded (hand-built oracle)."""
    from rastertiler_rs_ray.pipelines.relational import range_join

    left = pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([7, 7, 7, 8], pa.int64()),
        "t": pa.array([0, 95, 200, 95], pa.int64()),
    })
    right = pa.table({
        "rid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "k": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "t": pa.array([5, 100, 104, 106, 100], pa.int64()),
    })
    out = range_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        on="k", left_ts="t", right_ts="t", lo=0, hi=10,
        left_cols=["lid"], right_cols=["rid"],
    ).to_pandas()
    got = sorted((int(a), int(b)) for a, b in zip(out["lid"], out["rid"]))
    # lid1@0:[0,10]→rid10@5; lid2@95:[95,105]→rid11@100,rid12@104 (106 out);
    # lid3@200: none; lid4(k=8)@95:[95,105]→rid14@100
    assert got == [(1, 10), (2, 11), (2, 12), (4, 14)]


def test_hopping_window_aggregate(ray_session, db):
    """2h/1h hopping windows: every event in exactly 2 windows; counts
    match the shifted-tumbling SQL mirror; tumbling = size==hop case."""
    from rastertiler_rs_ray.pipelines.relational import hopping_window_aggregate

    HOP = 3_600_000_000
    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    got = (
        hopping_window_aggregate(
            ev, ts_col="ts", size=2 * HOP, hop=HOP,
            keys=["event_type"], aggs=[("n", "event_type", "count")],
        )
        .to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    want = db.execute(
        """WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
           x AS (SELECT ((t // 3600000000) - s.i) * 3600000000 AS window_start, event_type
                 FROM e CROSS JOIN (VALUES (0), (1)) s(i))
           SELECT window_start, event_type, count(*) AS n
           FROM x GROUP BY window_start, event_type ORDER BY window_start, event_type"""
    ).df()
    assert got["n"].to_numpy().tolist() == want["n"].to_numpy().tolist()
    assert got["window_start"].to_numpy().tolist() == want["window_start"].to_numpy().tolist()
    # total window memberships = 2 x events
    assert int(got["n"].sum()) == 2 * ev.count()


def test_continuous_percentiles_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rastertiler_rs_ray.pipelines.relational import continuous_percentiles

    rng = np.random.default_rng(3)
    v = rng.normal(1000.0, 250.0, 20_000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    out = continuous_percentiles(ds, "x", qs)
    sv = np.sort(v)
    for q in qs:
        rank = max(int(np.ceil(q * len(v))), 1) - 1
        name = "p" + ("%g" % (q * 100)).replace(".", "_")
        assert out[name].iloc[0] == sv[rank], (q, out[name].iloc[0], sv[rank])


def test_continuous_percentiles_multi_round(ray_session):
    # force the refinement loop: collect budget far below n
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rastertiler_rs_ray.pipelines.relational import continuous_percentiles

    rng = np.random.default_rng(5)
    v = rng.exponential(10.0, 30_000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(6)
    out = continuous_percentiles(
        ds, "x", [0.5, 0.999], sample_per_block=256, collect_budget=500
    )
    sv = np.sort(v)
    assert out["p50"].iloc[0] == sv[max(int(np.ceil(0.5 * len(v))), 1) - 1]
    assert out["p99_9"].iloc[0] == sv[max(int(np.ceil(0.999 * len(v))), 1) - 1]


def test_partial_agg_schema_stable_on_empty_batch():
    # a zero-row batch must carry the SAME key dtype as data batches —
    # null-typed keys destabilize Ray's aggregate exchange schema
    import pyarrow as pa

    from rastertiler_rs_ray.pipelines.relational import _partial_agg_fn

    fn = _partial_agg_fn(["lang"], [("n", "v", "count"), ("s", "v", "sum")])
    empty = pa.table({"lang": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    full = pa.table({"lang": pa.array(["en"]), "v": pa.array([3], pa.int64())})
    assert fn(empty).schema == fn(full).schema


def test_empty_schema_warning_filter_is_selective():
    import logging

    from rastertiler_rs_ray.raylog import (
        _EmptySchemaDivergenceFilter,
        install_empty_schema_warning_filter,
    )

    f = _EmptySchemaDivergenceFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg, None, None)

    benign = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: k: int64, new schema: . This may "
        "lead to unexpected behavior."
    )
    real = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: k: int64, new schema: k: string. "
        "This may lead to unexpected behavior."
    )
    assert not f.filter(rec(benign))  # dropped
    assert f.filter(rec(real))  # kept: real divergences must surface
    install_empty_schema_warning_filter()
    install_empty_schema_warning_filter()  # idempotent
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    assert sum(isinstance(x, _EmptySchemaDivergenceFilter) for x in lg.filters) == 1


def test_interval_contains_join_brute(ray_session):
    """Keyless range join vs a brute-force nested-loop oracle, with
    intervals spanning multiple buckets and values on exact bounds."""
    import numpy as np

    from rastertiler_rs_ray.pipelines.relational import interval_contains_join

    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(-50, 150, size=200), 3)
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array(range(200), pa.int64()),
                  "v": pa.array(vals, pa.float64())})
    )
    ivs = [(-10.0, 25.0, "a"), (20.0, 21.0, "b"), (25.0, 90.0, "c"),
           (100.0, 100.0, "point"), (140.0, 160.0, "edge"), (60.0, 55.0, "empty")]
    intervals = ray.data.from_arrow(
        pa.table({"lo": pa.array([i[0] for i in ivs], pa.float64()),
                  "hi": pa.array([i[1] for i in ivs], pa.float64()),
                  "tag": pa.array([i[2] for i in ivs], pa.string())})
    )
    out = interval_contains_join(
        left, intervals, val_col="v", lo_col="lo", hi_col="hi", bucket_width=13.0
    ).to_pandas()
    got = sorted(zip(out["pid"].astype(int), out["tag"]))
    exp = sorted(
        (pid, tag)
        for pid, v in enumerate(vals)
        for lo, hi, tag in ivs
        if lo <= v <= hi
    )
    assert got == exp


def test_rolling_time_aggregate_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd

    from rastertiler_rs_ray.pipelines.relational import rolling_time_aggregate

    rng = np.random.RandomState(9)
    n = 300
    base = pd.Timestamp("2024-01-01")
    # coarse grid so duplicate timestamps (RANGE peers) and exact
    # window-boundary hits both occur
    offs = rng.randint(0, 50, n) * 600  # 10-min grid, window = 1 h
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 7, n).astype(np.int64),
            "ts": base + pd.to_timedelta(offs, unit="s"),
            "v6": rng.randint(-1000, 1000, n).astype(np.int64),
        }
    )
    got = (
        rolling_time_aggregate(
            ray.data.from_pandas(df).repartition(4),
            ["user_id"], "ts",
            window_seconds=3600,
            sum_cols=[("sv", "v6")],
            carry_cols=["event_id"],
        )
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    for _, r in df.iterrows():
        grp = df[df["user_id"] == r["user_id"]]
        # RANGE semantics: peers (equal ts) included, boundary inclusive
        w = grp[(grp["ts"] >= r["ts"] - pd.Timedelta(hours=1)) & (grp["ts"] <= r["ts"])]
        assert got.loc[r["event_id"], "n_events"] == len(w)
        assert got.loc[r["event_id"], "sv"] == w["v6"].sum()


def test_snapshot_diff_classifies_all_three(ray_session):
    from rastertiler_rs_ray.pipelines.relational import snapshot_diff

    old = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a", "b", "c", "d"],
            "tag": ["x", "x", "y", "y"],
        }
    )
    new = pa.table(
        {
            "k": pa.array([2, 3, 4, 5], pa.int64()),
            "text": ["b", "c2", "d", "e"],
            "tag": ["x", "y", "z", "y"],
        }
    )
    out = snapshot_diff(
        ray.data.from_arrow(old).repartition(2),
        ray.data.from_arrow(new).repartition(3),
        ["k"],
        ["text", "tag"],
    ).to_pandas()
    got = dict(zip(out["k"], out["change"]))
    # k=2 identical -> absent; k=3 text changed; k=4 tag changed
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_empty_and_identical(ray_session):
    from rastertiler_rs_ray.pipelines.relational import snapshot_diff

    t = pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["a", "b"]})
    out = snapshot_diff(
        ray.data.from_arrow(t), ray.data.from_arrow(t), ["k"], ["v"]
    ).to_pandas()
    assert len(out) == 0


def _funnel_brute(df, stages):
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        prev, reached, ts_out = None, 0, []
        for s in stages:
            c = g[(g["event_type"] == s) & ((g["ts"] >= prev) if prev is not None else True)]
            if len(c) == 0:
                ts_out.extend([pd.NaT] * (len(stages) - len(ts_out)))
                break
            prev = c["ts"].iloc[0]
            ts_out.append(prev)
            reached += 1
        if ts_out and not pd.isna(ts_out[0]):
            rows.append((uid, reached, *ts_out))
    return sorted(rows, key=lambda r: r[0])


def test_funnel_stages_matches_brute_force(ray_session):
    from rastertiler_rs_ray.pipelines.relational import funnel_stages

    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n), unit="s").astype("datetime64[us]"),
            "event_type": rng.choice(["view", "click", "purchase", "error"], n),
        }
    )
    # force duplicate-ts peers: a click exactly at a view's timestamp
    df.loc[0, ["user_id", "event_type"]] = [999, "view"]
    df.loc[1, ["user_id", "event_type"]] = [999, "click"]
    df.loc[1, "ts"] = df.loc[0, "ts"]
    stages = ["view", "click", "purchase"]
    out = (
        funnel_stages(ray.data.from_pandas(df).repartition(5), stages)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _funnel_brute(df, stages)
    assert len(out) == len(want)
    for i, (uid, reached, t1, t2, t3) in enumerate(want):
        r = out.iloc[i]
        assert r["user_id"] == uid and r["stages_reached"] == reached
        for col, t in zip(["t_1", "t_2", "t_3"], [t1, t2, t3]):
            assert (pd.isna(r[col]) and pd.isna(t)) or r[col] == t
    # the planted equal-ts user converts view->click at the same instant
    planted = out[out["user_id"] == 999].iloc[0]
    assert planted["t_1"] == planted["t_2"]


def test_grouped_percentiles_matches_duckdb(ray_session):
    from rastertiler_rs_ray.pipelines.relational import grouped_percentiles

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 300),
            "v": rng.uniform(0, 1000, 300).round(3),
        }
    )
    qs = (0.1, 0.25, 0.5, 0.9)
    out = (
        grouped_percentiles(ray.data.from_pandas(df).repartition(5), ["g"], "v", qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    # DuckDB requires a constant quantile parameter — one SELECT per q
    want = duckdb.sql(
        " UNION ALL ".join(
            f"SELECT g, {q} AS q, percentile_disc({q}) "
            f"WITHIN GROUP (ORDER BY v) AS value FROM df GROUP BY g"
            for q in qs
        )
        + " ORDER BY g, q"
    ).df()
    assert len(out) == 12
    for i in range(len(out)):
        assert out.loc[i, "g"] == want.loc[i, "g"]
        assert float(out.loc[i, "q"]) == float(want.loc[i, "q"])
        assert out.loc[i, "value"] == want.loc[i, "value"]


def test_shuffle_hash_join_sparse_keys_empty_blocks(ray_session):
    """Ray 2.49.2's hash join crashes on zero-column empty blocks
    (repartition/aggregate outputs on sparse inputs); shuffle_hash_join
    must wash them.  Three keys across four partitions + an aggregate
    build side is exactly the poison shape."""
    from rastertiler_rs_ray.pipelines.relational import (
        grouped_aggregate,
        shuffle_hash_join,
    )

    edges = pa.table(
        {"u": pa.array([0, 2, 3], pa.int64()), "v": pa.array([1, 1, 1], pa.int64())}
    )
    eds = ray.data.from_arrow(edges).repartition(4)
    deg = grouped_aggregate(eds, ["u"], [("d", "v", "count")])
    out = shuffle_hash_join(eds, deg, on="u", num_partitions=8).to_pandas()
    assert len(out) == 3
    assert dict(zip(out["u"], out["d"])) == {0: 1, 2: 1, 3: 1}


def test_equi_depth_buckets_matches_threshold_rule(ray_session):
    from rastertiler_rs_ray.pipelines.relational import equi_depth_buckets

    rng = np.random.default_rng(11)
    v = rng.normal(100.0, 25.0, size=500)
    t = pa.table({"k": pa.array(np.arange(500), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    out = (
        equi_depth_buckets(
            ray.data.from_arrow(t).repartition(6), "v",
            num_buckets=4, keep_cols=["k"],
        )
        .to_pandas()
        .sort_values("k")
    )
    s = np.sort(v)
    n = len(s)
    bounds = [s[max(int(np.ceil(q * n)), 1) - 1] for q in (0.25, 0.5, 0.75)]
    want = np.sum(v[:, None] > np.asarray(bounds)[None, :], axis=1)
    assert list(out["bucket"]) == list(want)
    # equi-depth: each bucket holds ~n/4 rows (exactly, distinct values)
    sizes = out["bucket"].value_counts().sort_index().to_numpy()
    assert sizes.tolist() == [125, 125, 125, 125]


def test_equi_depth_buckets_duplicate_values_deterministic(ray_session):
    from rastertiler_rs_ray.pipelines.relational import equi_depth_buckets

    # heavy ties: all duplicates of a boundary value share one bucket
    v = np.repeat([1.0, 2.0, 3.0, 4.0], 25)
    t = pa.table({"k": pa.array(np.arange(100), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    out = (
        equi_depth_buckets(
            ray.data.from_arrow(t).repartition(4), "v",
            num_buckets=4, keep_cols=["k"],
        )
        .to_pandas()
        .sort_values("k")
    )
    got = out.groupby(out["k"] // 25)["bucket"].nunique()
    assert (got == 1).all()  # each tie-class maps to exactly one bucket


# ---------------------------------------------------------- round 3 additions


def test_skew_hybrid_join_matches_plain_join(ray_session):
    from rastertiler_rs_ray.pipelines.relational import skew_hybrid_join

    rng = np.random.default_rng(7)
    # one pathological hot key (0) owning half the probe side + a cold tail
    keys = np.concatenate(
        [np.zeros(5000, np.int64), rng.integers(1, 200, 5000)]
    )
    left_df = pd.DataFrame(
        {"k": keys, "v": np.arange(len(keys), dtype=np.int64)}
    )
    right_df = pd.DataFrame(
        {"rk": np.arange(200, dtype=np.int64), "attr": np.arange(200) * 10}
    )
    left = ray.data.from_pandas(left_df).repartition(8)
    right = ray.data.from_pandas(right_df).repartition(4)

    stats = {}
    got = (
        skew_hybrid_join(
            left, right, on="k", right_on="rk",
            hot_min_count=1000, partial_topk=16, stats=stats,
        )
        .to_pandas()
        .sort_values(["v"])
        .reset_index(drop=True)
    )
    want = (
        left_df.merge(right_df, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["v"])
        .reset_index(drop=True)
    )
    assert stats["hot_keys"] >= 1  # the hot branch actually engaged
    assert stats["hot_rows"] >= 5000
    pd.testing.assert_frame_equal(got[["k", "v", "attr"]], want[["k", "v", "attr"]])


def test_skew_hybrid_join_all_cold_falls_back_to_shuffle(ray_session):
    from rastertiler_rs_ray.pipelines.relational import skew_hybrid_join

    left_df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100)})
    right_df = pd.DataFrame({"k": np.arange(0, 100, 2, dtype=np.int64), "w": np.arange(50)})
    stats = {}
    got = (
        skew_hybrid_join(
            ray.data.from_pandas(left_df).repartition(4),
            ray.data.from_pandas(right_df),
            on="k", hot_min_count=10_000, stats=stats,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert stats["hot_keys"] == 0
    want = left_df.merge(right_df, on="k").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "w"]].astype("int64"), want.astype("int64")
    )


def test_windowed_rank_dense_matches_duckdb(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import windowed_rank

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    ).repartition(6)
    got = (
        windowed_rank(ev, ["user_id"], order_col="value", method="dense", keep_rank_le=4)
        .to_pandas()
        .sort_values(["user_id", "value", "event_id"])
        .reset_index(drop=True)
    )
    want = db.execute(
        """
        SELECT event_id, user_id, value,
               dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk
        FROM events QUALIFY rnk <= 4
        ORDER BY user_id, value, event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value", "rnk"]],
        want.astype({"rnk": "int64"}),
        check_dtype=False,
    )


def test_windowed_rank_ties_share_rank(ray_session):
    from rastertiler_rs_ray.pipelines.relational import windowed_rank

    df = pd.DataFrame(
        {"g": [0] * 6, "x": [5.0, 5.0, 3.0, 3.0, 3.0, 1.0], "i": range(6)}
    )
    got = (
        windowed_rank(
            ray.data.from_pandas(df).repartition(3), ["g"], order_col="x",
            method="dense", keep_rank_le=2,
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # dense: 5.0→1, 3.0→2 (all three ties kept), 1.0→3 pruned
    assert got["i"].tolist() == [0, 1, 2, 3, 4]
    assert got["rnk"].tolist() == [1, 1, 2, 2, 2]


def test_upsert_latest_semantics(ray_session):
    from rastertiler_rs_ray.pipelines.relational import upsert_latest

    base = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "val": ["a", "b", "c", "d"],
            "version": [0, 0, 0, 0],
            "deleted": [False] * 4,
        }
    )
    # k=1 updated (v1 wins), k=2 tombstoned, k=3 change at EQUAL version
    # (change must beat base), k=4 untouched, k=5 inserted
    changes = pd.DataFrame(
        {
            "k": [1, 2, 3, 5],
            "val": ["a2", "b2", "c2", "e"],
            "version": [1, 1, 0, 0],
            "deleted": [False, True, False, False],
        }
    )
    got = (
        upsert_latest(
            ray.data.from_pandas(base).repartition(2),
            ray.data.from_pandas(changes).repartition(2),
            key_col="k", version_col="version", deleted_col="deleted",
            num_shards=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 3, 4, 5]
    assert got["val"].tolist() == ["a2", "c2", "d", "e"]
    assert got["version"].tolist() == [1, 0, 0, 0]
    assert "deleted" not in got.columns


def test_grouped_concat_ordered(ray_session):
    from rastertiler_rs_ray.pipelines.relational import grouped_concat

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2],
            "seq": [3, 1, 2, 2, 1],
            "v": ["c", "a", "b", "y", "x"],
        }
    )
    got = (
        grouped_concat(
            ray.data.from_pandas(df).repartition(3), ["g"],
            value_col="v", order_cols=["seq"], sep=">", out_col="path",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got["g"].tolist() == [1, 2]
    assert got["path"].tolist() == ["a>b>c", "x>y"]
    assert list(got.columns) == ["g", "path"]


def test_unpivot_melt(ray_session):
    from rastertiler_rs_ray.pipelines.relational import unpivot

    df = pd.DataFrame(
        {"id": [1, 2], "extra": ["p", "q"], "m1": [10.0, 20.0], "m2": [0.5, 0.25]}
    )
    got = (
        unpivot(
            ray.data.from_pandas(df).repartition(2), ["id"], ["m1", "m2"]
        )
        .to_pandas()
        .sort_values(["id", "measure"])
        .reset_index(drop=True)
    )
    want = df.melt(
        id_vars=["id"], value_vars=["m1", "m2"], var_name="measure", value_name="value"
    ).sort_values(["id", "measure"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert "extra" not in got.columns  # only id + value cols survive


def test_cumsum_within_groups_matches_duckdb(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import cumsum_within_groups

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).repartition(5)

    def quant(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100.0 + 0.5).astype(np.int64)
        return t.drop_columns(["value"]).append_column("v", pa.array(v))

    got = (
        cumsum_within_groups(
            ev.map_batches(quant, batch_format="pyarrow"),
            ["user_id"], ["ts", "event_id"], "v", out_col="run",
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    want = db.execute(
        """
        SELECT event_id, ts, user_id,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS run
        FROM events ORDER BY user_id, ts, event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "run"]].astype("int64"),
        want[["event_id", "user_id", "run"]].astype("int64"),
    )


def test_latest_by_key_matches_duckdb(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import latest_by_key

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).repartition(6)
    got = (
        latest_by_key(ev, "user_id", ["ts", "event_id"], num_shards=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = db.execute(
        """
        SELECT event_id, ts, user_id, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "value"]].reset_index(drop=True),
        want[["event_id", "user_id", "value"]],
        check_dtype=False,
    )


def test_set_ops_intersect_except(ray_session):
    from rastertiler_rs_ray.pipelines.relational import (
        dataset_except,
        dataset_intersect,
    )

    l = pd.DataFrame({"k": [1, 1, 2, 3, 5], "g": ["a", "a", "a", "b", "b"]})
    r = pd.DataFrame({"k": [2, 3, 3, 4], "g": ["a", "b", "b", "b"]})
    ld = ray.data.from_pandas(l).repartition(3)
    rd = ray.data.from_pandas(r).repartition(2)

    inter = (
        dataset_intersect(ld, rd, ["k", "g"]).to_pandas()
        .sort_values(["k", "g"]).reset_index(drop=True)
    )
    assert inter.values.tolist() == [[2, "a"], [3, "b"]]

    exc = (
        dataset_except(ld, rd, ["k", "g"]).to_pandas()
        .sort_values(["k", "g"]).reset_index(drop=True)
    )
    assert exc.values.tolist() == [[1, "a"], [5, "b"]]
    # distinctness: duplicated left tuples appear once
    assert len(exc) == len(exc.drop_duplicates())


def test_interpolated_percentiles_matches_numpy(ray_session):
    from rastertiler_rs_ray.pipelines.relational import interpolated_percentiles

    rng = np.random.default_rng(5)
    v = rng.normal(100.0, 15.0, 3001)
    df = pd.DataFrame({"x": v})
    got = interpolated_percentiles(
        ray.data.from_pandas(df).repartition(7), "x", [0.0, 0.25, 0.5, 0.777, 1.0],
        collect_budget=500,
    )
    for q, colname in zip(
        [0.0, 0.25, 0.5, 0.777, 1.0], ["p0_e6", "p25_e6", "p50_e6", "p77_7_e6", "p100_e6"]
    ):
        want = np.quantile(v, q)  # numpy 'linear' == SQL percentile_cont
        assert abs(got[colname].iloc[0] / 1e6 - want) < 2e-6, (q, colname)


def test_mode_by_group_ties_and_partitions(ray_session):
    from rastertiler_rs_ray.pipelines.relational import mode_by_group

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 2, 2, 2],
            "v": ["b", "a", "b", "a", "z", "z", "y"],  # g=1 tie a/b → 'a'
        }
    )
    got = (
        mode_by_group(
            ray.data.from_pandas(df).repartition(4), "g", "v", num_shards=4
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got["g"].tolist() == [1, 2]
    assert got["mode_value"].tolist() == ["a", "z"]
    assert got["cnt"].tolist() == [2, 2]


def test_scd2_history_intervals(ray_session):
    from rastertiler_rs_ray.pipelines.relational import scd2_history

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-02", "2024-06-01"]
            ),
            "rid": [0, 1, 2, 3],
        }
    )
    got = (
        scd2_history(
            ray.data.from_pandas(df).repartition(2), "k", "ts",
            order_tiebreak=["rid"],
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    # k=1 ordered: 01-01 → 01-02 → 01-03; valid_to chains, last open
    assert got["valid_from"].tolist() == got["ts"].tolist()
    assert got["valid_to"].iloc[0] == got["ts"].iloc[1]
    assert got["valid_to"].iloc[1] == got["ts"].iloc[2]
    assert pd.isna(got["valid_to"].iloc[2]) and pd.isna(got["valid_to"].iloc[3])
    assert got["is_current"].tolist() == [False, False, True, True]


def test_rank_fractions_matches_duckdb(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import rank_fractions_in_groups

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    ).repartition(4)
    got = (
        rank_fractions_in_groups(ev, ["user_id"], order_col="value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = db.execute(
        """
        SELECT event_id,
               CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr,
               CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value)
        ORDER BY event_id
        """
    ).df()
    assert got["pct_rank_e6"].tolist() == want["pr"].tolist()
    assert got["cume_dist_e6"].tolist() == want["cd"].tolist()


def test_fill_forward_in_groups(ray_session):
    from rastertiler_rs_ray.pipelines.relational import fill_forward_in_groups

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "t": [0, 1, 2, 3, 0, 1],
            "v": [np.nan, 5.0, np.nan, np.nan, np.nan, 7.0],
        }
    )
    got = (
        fill_forward_in_groups(
            ray.data.from_pandas(df).repartition(3), ["k"], ["t"], "v",
            out_col="f",
        )
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # leading null stays; 5.0 carries through the gap; k=2 leading null stays
    assert pd.isna(got["f"].iloc[0])
    assert got["f"].iloc[1:4].tolist() == [5.0, 5.0, 5.0]
    assert pd.isna(got["f"].iloc[4]) and got["f"].iloc[5] == 7.0


def test_grouping_sets_matches_duckdb(ray_session, db):
    from rastertiler_rs_ray.pipelines.relational import grouping_sets_aggregate

    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    ).repartition(4)

    def quant(t: pa.Table) -> pa.Table:
        q = np.floor(np.asarray(t.column("l_quantity"), np.float64) * 100 + 0.5)
        return t.drop_columns(["l_quantity"]).append_column(
            "q", pa.array(q.astype(np.int64))
        )

    got = (
        grouping_sets_aggregate(
            li.map_batches(quant, batch_format="pyarrow"),
            [["l_returnflag"], []],
            [("q", "q", "sum")],
            null_label="ALL",
        )
        .to_pandas()
        .sort_values(["l_returnflag"])
        .reset_index(drop=True)
    )
    want = db.execute(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS q
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), ())
        ORDER BY l_returnflag
        """
    ).df()
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["q"].astype("int64").tolist() == want["q"].astype("int64").tolist()


def test_ntile_sql_size_rule(ray_session):
    from rastertiler_rs_ray.pipelines.relational import ntile_in_groups

    # n=7, k=4 → sizes 2,2,2,1 ; n=2, k=4 → tiles 1,2
    df = pd.DataFrame(
        {"g": [0] * 7 + [1] * 2, "o": list(range(7)) + [0, 1]}
    )
    got = (
        ntile_in_groups(
            ray.data.from_pandas(df).repartition(3), ["g"], ["o"], 4
        )
        .to_pandas()
        .sort_values(["g", "o"])
        .reset_index(drop=True)
    )
    assert got[got["g"] == 0]["tile"].tolist() == [1, 1, 2, 2, 3, 3, 4]
    assert got[got["g"] == 1]["tile"].tolist() == [1, 2]


def test_upsert_latest_null_tombstone_means_live(ray_session):
    # CDC streams often set the deleted flag only on deletes; a NULL
    # flag must mean "not deleted" (NaN is truthy under astype(bool))
    from rastertiler_rs_ray.pipelines.relational import upsert_latest

    base = pd.DataFrame(
        {
            "k": [1, 2],
            "val": ["a", "b"],
            "version": [0, 0],
            "deleted": pd.array([False, False], dtype="boolean"),
        }
    )
    changes = pd.DataFrame(
        {
            "k": [1, 2],
            "val": ["a2", "b2"],
            "version": [1, 1],
            "deleted": pd.array([None, True], dtype="boolean"),
        }
    )
    got = (
        upsert_latest(
            ray.data.from_pandas(base),
            ray.data.from_pandas(changes),
            key_col="k", version_col="version", deleted_col="deleted",
            num_shards=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1]  # null flag kept k=1 live, k=2 tombstoned
    assert got["val"].tolist() == ["a2"]


def test_grouping_sets_null_label_none_types(ray_session, db):
    # null_label=None must fill missing keys with typed nulls so the
    # unioned parts agree on column types
    from rastertiler_rs_ray.pipelines.relational import grouping_sets_aggregate

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y"],
            "b": [1, 2, 1, 2],
            "v": [10.0, 20.0, 30.0, 40.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    got = (
        grouping_sets_aggregate(
            ds, [["a", "b"], ["a"], []], [("sum_v", "v", "sum")],
            null_label=None,
        )
        .to_pandas()
        .sort_values(["a", "b", "sum_v"], na_position="first")
        .reset_index(drop=True)
    )
    want = (
        db.execute(
            "SELECT a, b, sum(v) AS sum_v FROM df "
            "GROUP BY GROUPING SETS ((a, b), (a), ()) "
            "ORDER BY a NULLS FIRST, b NULLS FIRST, sum_v"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["sum_v"].tolist() == want["sum_v"].tolist()
    assert got["a"].isna().tolist() == want["a"].isna().tolist()
    # b column must carry the real int type, not arrow null-type → object
    assert str(got["b"].dtype) != "object"


def test_skew_hybrid_join_filtered_empty_right_raises_clearly(ray_session):
    # a row-filter that drops everything leaves only zero-COLUMN blocks
    # AND erases the plan schema (Ray limitation) — the join must raise
    # a clear error, not the cryptic Acero FieldRef crash
    from rastertiler_rs_ray.pipelines.relational import skew_hybrid_join

    left_df = pd.DataFrame(
        {"k": np.zeros(500, np.int64), "v": np.arange(500, dtype=np.int64)}
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([0, 1], pa.int64()), "w": pa.array([5, 6], pa.int64())})
    ).filter(lambda row: False)
    with pytest.raises(ValueError, match="no recoverable schema"):
        skew_hybrid_join(
            ray.data.from_pandas(left_df).repartition(4),
            right,
            on="k", hot_min_count=100, partial_topk=4,
        )


def test_skew_hybrid_join_zero_block_right(ray_session):
    # limit(0) materializes to ZERO blocks (not even empty ones); the
    # plan-captured schema rebuilds a typed empty build side instead of
    # the cryptic Acero FieldRef crash Ray's join would raise
    from rastertiler_rs_ray.pipelines.relational import skew_hybrid_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": np.zeros(10, np.int64), "v": np.arange(10, dtype=np.int64)})
    )
    right = ray.data.from_pandas(pd.DataFrame({"k": [1], "w": [2]})).limit(0)
    out = skew_hybrid_join(left, right, on="k", hot_min_count=5)
    # Ray 2.49 cannot carry a typed empty block through from_arrow, so
    # the contract is: no crash, zero rows
    assert out.count() == 0


# ------------------------------------------------------ moment_profile


def test_moment_profile_matches_numpy_population_moments(ray_session):
    from rastertiler_rs_ray.pipelines.relational import moment_profile

    rng = np.random.default_rng(11)
    g = np.repeat(["a", "b", "c"], 400)
    x = np.concatenate([
        rng.normal(10, 2, 400),          # near-symmetric
        rng.exponential(3.0, 400) + 1,   # right-skewed
        rng.uniform(-5, 5, 400),         # platykurtic
    ])
    t = pa.table({"g": pa.array(g), "x": pa.array(x)})
    out = (
        moment_profile(ray.data.from_arrow(t).repartition(5), ["g"], "x")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for key, vals in (("a", x[:400]), ("b", x[400:800]), ("c", x[800:])):
        m = vals.mean()
        m2 = ((vals - m) ** 2).mean()
        m3 = ((vals - m) ** 3).mean()
        m4 = ((vals - m) ** 4).mean()
        row = out.loc[key]
        assert row["n"] == 400
        assert row["mean_e4"] == int(np.floor(m * 1e4 + 0.5))
        assert abs(row["var_e4"] - int(np.floor(m2 * 1e4 + 0.5))) <= 1
        assert abs(row["skew_e4"] - int(np.floor(m3 / m2**1.5 * 1e4 + 0.5))) <= 1
        assert abs(row["kurt_e4"] - int(np.floor((m4 / m2**2 - 3) * 1e4 + 0.5))) <= 1


# --------------------------------------------------- global_row_number


def test_global_row_number_total_order(ray_session):
    from rastertiler_rs_ray.pipelines.relational import global_row_number

    rng = np.random.default_rng(5)
    vals = rng.permutation(500).astype(np.int64)
    t = pa.table({"k": pa.array(np.arange(500, dtype=np.int64)),
                  "v": pa.array(vals)})
    out = (
        global_row_number(ray.data.from_arrow(t).repartition(7), ["v"])
        .to_pandas()
        .sort_values("v")
    )
    assert (out["rn"].to_numpy() == np.arange(1, 501)).all()


def test_global_row_number_desc_with_tiebreak(ray_session):
    from rastertiler_rs_ray.pipelines.relational import global_row_number

    # heavy ties: v has only 3 distinct values; k breaks them
    t = pa.table({"k": pa.array(np.arange(90, dtype=np.int64)),
                  "v": pa.array(np.tile([7, 3, 5], 30).astype(np.int64))})
    out = (
        global_row_number(
            ray.data.from_arrow(t).repartition(4), ["v", "k"],
            descending=[True, False],
        )
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    df = out[["v", "k"]].to_records(index=False).tolist()
    assert df == sorted(df, key=lambda r: (-r[0], r[1]))
    assert out["rn"].tolist() == list(range(1, 91))


def test_grouped_linear_regression(ray_session):
    from rastertiler_rs_ray.pipelines.relational import grouped_linear_regression

    rng = np.random.default_rng(5)
    n = 3000
    g = rng.integers(0, 3, n)
    x = rng.uniform(0.0, 50.0, n)
    y = np.where(g == 2, 7.5, 2.0 + g) * x + 10.0 * g + rng.normal(0.0, 3.0, n)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g, pa.int64()), "x": x, "y": y})
    )
    out = (
        grouped_linear_regression(ds, ["g"], "x", "y")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for i in range(3):
        sl, ic, r, _ = np.linalg.lstsq(
            np.stack([x[g == i], np.ones((g == i).sum())], 1), y[g == i],
            rcond=None,
        )[0][0], None, None, None
        want_slope = sl
        got = out.loc[i, "slope_e4"] / 1e4
        assert abs(got - want_slope) < 2e-4
        # r2 close to 1 for strong linear signal
        assert out.loc[i, "r2_e4"] / 1e4 > 0.9
    assert (out["n"].to_numpy() == np.bincount(g)).all()


def test_grouped_linear_regression_degenerate(ray_session):
    from rastertiler_rs_ray.pipelines.relational import grouped_linear_regression

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": ["a"] * 4 + ["b"] * 4,
                "x": [1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 4.0],
                "y": [1.0, 2.0, 3.0, 4.0, 2.0, 4.0, 6.0, 8.0],
            }
        )
    )
    out = (
        grouped_linear_regression(ds, ["g"], "x", "y")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert pd.isna(out.loc[0, "slope_e4"])  # zero x-variance group
    assert out.loc[1, "slope_e4"] == 20000  # exact y = 2x
    assert out.loc[1, "intercept_e4"] == 0
    assert out.loc[1, "r2_e4"] == 10000


def test_weighted_sample_without_replacement(ray_session):
    from rastertiler_rs_ray.pipelines.relational import (
        weighted_sample_without_replacement,
    )

    n, k = 5000, 50
    ids = np.arange(n, dtype=np.int64)
    # two weight tiers: heavy rows 100x likelier
    w = np.where(ids % 50 == 0, 100.0, 1.0)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "w": pa.array(w)})
    ).repartition(8)
    out = weighted_sample_without_replacement(
        ds, k=k, id_col="id", weight_col="w", seed=7
    )
    assert len(out) == k
    sel = out.column("id").to_numpy()
    assert len(np.unique(sel)) == k  # without replacement
    # heavy rows are 2% of rows but carry ~67% of total weight;
    # their expected share of the sample is large
    heavy = (sel % 50 == 0).sum()
    assert heavy >= k // 4
    # deterministic across block layouts
    out2 = weighted_sample_without_replacement(
        ds.repartition(3), k=k, id_col="id", weight_col="w", seed=7
    )
    assert sorted(sel) == sorted(out2.column("id").to_numpy())
    # different seed -> (almost surely) different selection
    out3 = weighted_sample_without_replacement(
        ds, k=k, id_col="id", weight_col="w", seed=8
    )
    assert sorted(sel) != sorted(out3.column("id").to_numpy())


class TestGroupedPeakConcurrency:
    def _run(self, grp, start, end, nparts=7):
        from rastertiler_rs_ray.pipelines.relational import grouped_peak_concurrency

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": pa.array(grp),
                    "s": pa.array(start, pa.int64()),
                    "e": pa.array(end, pa.int64()),
                }
            )
        ).repartition(nparts)
        df = grouped_peak_concurrency(ds, "s", "e", ["g"]).to_pandas()
        return dict(zip(df.g, df.peak))

    @staticmethod
    def _brute(grp, start, end):
        out = {}
        for g in set(grp):
            bounds = []
            for gg, s, e in zip(grp, start, end):
                if gg == g:
                    bounds.append((s, 1))
                    bounds.append((e, -1))
            bounds.sort()  # (-1 before +1 at ties: half-open)
            c = peak = 0
            for _, d in bounds:
                c += d
                peak = max(peak, c)
            out[g] = peak
        return out

    def test_half_open_ties(self, ray_session):
        # back-to-back intervals never overlap; nested ones do
        grp = ["a"] * 3 + ["b"] * 2
        start = [0, 10, 5, 0, 0]
        end = [10, 20, 15, 5, 5]
        got = self._run(grp, start, end)
        assert got == {"a": 2, "b": 2}

    def test_matches_brute_force_many_blocks(self, ray_session):
        rng = np.random.default_rng(31)
        n = 5000
        grp = rng.choice(["x", "y", "z"], n).tolist()
        start = rng.integers(0, 10000, n).tolist()
        end = (np.array(start) + rng.integers(1, 500, n)).tolist()
        got = self._run(grp, start, end, nparts=23)
        assert got == self._brute(grp, start, end)


def test_winsorized_grouped_stats(ray_session):
    from rastertiler_rs_ray.pipelines.relational import winsorized_grouped_stats

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": np.round(rng.normal(100, 20, n), 2),
        }
    )
    # plant outliers that a plain mean would absorb
    df.loc[:5, "v"] = 10_000.0
    got = (
        winsorized_grouped_stats(ray.data.from_pandas(df), ["g"], "v", lo_q=0.1, hi_q=0.9)
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        nn = len(v)
        lo = v[max(int(np.ceil(0.1 * nn)), 1) - 1]
        hi = v[max(int(np.ceil(0.9 * nn)), 1) - 1]
        inside = sub["v"][(sub["v"] >= lo) & (sub["v"] <= hi)]
        assert got.loc[g, "lo"] == lo and got.loc[g, "hi"] == hi
        assert got.loc[g, "trimmed_mean"] == pytest.approx(inside.mean())
        assert got.loc[g, "winsor_mean"] == pytest.approx(sub["v"].clip(lo, hi).mean())
        assert got.loc[g, "n"] == nn
        assert got.loc[g, "n_trimmed"] == nn - len(inside)
        # robustness: planted outliers clamped away
        assert got.loc[g, "winsor_mean"] < sub["v"].mean()


def test_interval_overlap_join_vs_brute_force(ray_session):
    from rastertiler_rs_ray.pipelines.relational import interval_overlap_join

    rng = np.random.default_rng(17)
    nl, nr = 80, 70
    keys_l = rng.integers(0, 4, nl)
    keys_r = rng.integers(0, 4, nr)
    ls = rng.integers(0, 1000, nl).astype(np.int64)
    le = ls + rng.integers(0, 120, nl)  # some long intervals span buckets
    rs = rng.integers(0, 1000, nr).astype(np.int64)
    re_ = rs + rng.integers(0, 120, nr)
    left = ray.data.from_arrow(
        pa.table({"k": keys_l, "s": ls, "e": le, "lid": np.arange(nl)})
    )
    right = ray.data.from_arrow(
        pa.table({"k": keys_r, "s": rs, "e": re_, "rid": np.arange(nr)})
    )
    got = {
        (r["k"], r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, key_cols=["k"],
            left_start="s", left_end="e", right_start="s", right_end="e",
            bucket_width=50, left_cols=["lid"], right_cols=["rid"],
        ).take_all()
    }
    want = {
        (int(keys_l[i]), i, j)
        for i in range(nl)
        for j in range(nr)
        if keys_l[i] == keys_r[j] and ls[i] <= re_[j] and rs[j] <= le[i]
    }
    assert got == want
    assert len(want) > 100  # non-trivial

    # no duplicates from multi-bucket replication: take_all gave a set,
    # re-check with a list
    rows = interval_overlap_join(
        left, right, key_cols=["k"],
        left_start="s", left_end="e", right_start="s", right_end="e",
        bucket_width=50, left_cols=["lid"], right_cols=["rid"],
    ).take_all()
    assert len(rows) == len(want)


def test_decayed_grouped_sum(ray_session):
    from rastertiler_rs_ray.pipelines.relational import decayed_grouped_sum

    rng = np.random.default_rng(29)
    n = 300
    now = 1_700_000_000_000_000
    ts = now - rng.integers(0, 30 * 86400_000_000, n)
    g = rng.choice(["a", "b"], n)
    val = rng.uniform(0, 5, n)
    df = pd.DataFrame({"g": g, "ts": ts, "v": val})
    for vc in (None, "v"):
        got = (
            decayed_grouped_sum(
                ray.data.from_pandas(df), ["g"], ts_col="ts", now_us=now,
                half_life_s=7 * 86400, value_col=vc,
            )
            .to_pandas()
            .set_index("g")
            .sort_index()
        )
        w = np.exp2(-(now - ts).astype(float) / (7 * 86400 * 1e6))
        if vc:
            w = w * val
        want = pd.DataFrame({"g": g, "w": w}).groupby("g")["w"].sum()
        for k in ("a", "b"):
            assert got.loc[k, "decayed"] == pytest.approx(want[k])
            assert got.loc[k, "n"] == int((g == k).sum())
    # an event exactly one half-life old weighs half of a now-event
    one = pd.DataFrame({"g": ["x", "x"], "ts": [now, now - 7 * 86400_000_000]})
    got = decayed_grouped_sum(
        ray.data.from_pandas(one), ["g"], ts_col="ts", now_us=now, half_life_s=7 * 86400
    ).to_pandas()
    assert got["decayed"].iloc[0] == pytest.approx(1.5)
