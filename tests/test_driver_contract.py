"""The __ray_entry__ driver contract: entry() smoke + a fast oracle subset.

The full gate (every query at sf0.01 vs DuckDB) is
``python scripts/check_oracle.py``; here we keep a quick always-green
subset so `pytest -x -q` guards the contract.
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def db():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "documents", "embeddings", "part", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "Int64":  # nullable int ↔ DuckDB NULL-able BIGINT
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(ray_session):
    out = E.entry()
    df = out.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "zoom", "x", "y", "raster_value"}


def test_every_query_has_callable(ray_session):
    qs, sqls = E.queries(), E.oracle_sql()
    assert len(qs) >= 25
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 15


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "tile_assign_z10", "cell_index_z12", "exact_dedup_docs",
     "knn_docs_k5", "text_stats", "raster_vector_join_z8"],
)
def test_oracle_subset(ray_session, db, name):
    qs, sqls = E.queries(), E.oracle_sql()
    got = qs[name](SF)
    import pyarrow as pa
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    want = db.execute(sqls[name]).df()
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if str(got[c].dtype).startswith("float"):
            both_na = got[c].isna() & want[c].isna()
            assert (both_na | ((got[c] - want[c]).abs() < 1e-6)).all(), c
        else:
            assert (got[c].astype(str) == want[c].astype(str)).all(), c


def test_sql_mix64_matches_numpy_hash(db):
    """The 32-bit-split wrapping-multiply SQL evaluation of the
    synthetic pixel hash (driver_queries._sql_mix64) is bit-identical
    to raster/synthetic._mix — the primitive that makes the raster
    join SQL-oracle-able at all."""
    import numpy as np

    from rastertiler_rs_ray.pipelines.driver_queries import _sql_mix64
    from rastertiler_rs_ray.raster.synthetic import _mix

    rng = np.random.RandomState(3)
    gx = rng.randint(0, 1 << 20, 64).astype(np.int64)
    gy = rng.randint(0, 1 << 20, 64).astype(np.int64)
    for seed in (42, 43):
        stages = _sql_mix64("gx", "gy", seed, "h")
        vals = ",".join(f"({int(a)},{int(b)})" for a, b in zip(gx, gy))
        sql = f"WITH g(gx, gy) AS (VALUES {vals}), " + ",".join(
            f"m{i} AS (SELECT *, {s} FROM {p})"
            for i, (s, p) in enumerate(zip(stages, ["g", "m0", "m1", "m2"]))
        ) + " SELECT gx, gy, h FROM m3 ORDER BY gx, gy"
        out = db.execute(sql).df().sort_values(["gx", "gy"])
        order = np.lexsort((gy, gx))
        exp = _mix(gx[order], gy[order], seed)
        assert (out["h"].to_numpy().astype(np.uint64) == exp).all()
