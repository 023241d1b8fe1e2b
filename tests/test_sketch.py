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
