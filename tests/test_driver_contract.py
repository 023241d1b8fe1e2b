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
    df = df[sorted(df.columns)]
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
     "knn_docs_k5", "text_stats"],
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
            assert (got[c] - want[c]).abs().max() < 1e-6, c
        else:
            assert (got[c].astype(str) == want[c].astype(str)).all(), c
