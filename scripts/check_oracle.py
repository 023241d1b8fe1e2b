"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 plus the matching
``oracle_sql()`` in DuckDB and compares row count, sorted-column-name
schema, and an order-insensitive value hash (rows sorted by all
columns, values stringified with repr).  Usage::

    python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        if str(df[c].dtype) in ("Int64",):
            df[c] = df[c].astype("float64").round(9)  # nullable int → comparable
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(df.to_csv(index=False, float_format="%.9g").encode())
    return h.hexdigest()[:16]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, sqls = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw = to_pandas(fn(sf))
            # rows-only queries (no oracle) may carry array/list columns
            # the sort-normalize can't order — the driver only counts
            # their rows, so do the same
            got = normalize(raw) if name in sqls else raw
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s) [rows-only]")
            continue
        want = normalize(con.execute(sqls[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA {list(got.columns)} != {list(want.columns)}")
        if not status and value_hash(got) != value_hash(want):
            status.append("VALUE-HASH mismatch")
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(got[bad].head(3))
            print(want[bad].head(3))
        if status:
            print(f"FAIL {name}: {'; '.join(status)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
