"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 plus the matching
``oracle_sql()`` in DuckDB and compares row count, sorted-column-name
schema, and an order-insensitive value hash (rows sorted by all
columns, values stringified with repr).  Usage::

    python scripts/check_oracle.py [--json OUT.json] [sf_dir] [name ...]

With ``--json`` the per-query results are written in the driver's
CORRECTNESS_r{N}.json schema (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err per query) so a committed artifact exists
even if the driver-side gate fails to record one (round-3 lesson).
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

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    qs, sqls = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    failures = 0
    report: dict[str, dict] = {}
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
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {str(e)[:200]}",
            }
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s) [rows-only]")
            report[name] = {
                "rows_match": True,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": int(len(got)),
                "oracle_rows": None,
                "err": None,
            }
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
        report[name] = {
            "rows_match": len(got) == len(want),
            "schema_match": list(got.columns) == list(want.columns),
            "hash_match": not status,
            "spark_rows": int(len(got)),
            "oracle_rows": int(len(want)),
            "err": "; ".join(status) or None,
        }
        if status:
            print(f"FAIL {name}: {'; '.join(status)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
    print("FAILURES:", failures)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
