"""Distributed dataset profiling: per-column numeric summaries and a
pairwise Pearson correlation matrix.

The "what is in this table" primitives every ingest pipeline runs
before training: schema-level sanity (null counts, ranges) and
feature-redundancy screening (correlations).  Both are ONE streaming
pass of per-block partials tree-combined by Ray's native aggregate —
driver state is O(columns) / O(columns²), never O(rows).

No reference counterpart (the reference is a tiler); these belong to
the large-scale-training-pipeline surface alongside sketch.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from .relational import grouped_aggregate


def numeric_profile(
    ds: ray.data.Dataset, cols: Sequence[str]
) -> pd.DataFrame:
    """Per-column profile of ``cols``: non-null count, null count,
    mean, sample stddev, min, max — one row per column.

    Scale contract: each block reduces to ONE partial row of
    ``6 × len(cols)`` scalars (count / null-count / sum / sum-of-
    squares / min / max); Ray's native ``aggregate`` tree-combines the
    partials, so the exchange and the driver result are O(columns),
    independent of row count.  Sums run in float64 — relative error
    ~n_blocks·ε, far inside the 9-significant-digit compare grid.
    """
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        row: dict = {}
        for c in cols:
            a = batch.column(c)
            v = a.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            row[f"{c}__n"] = [np.int64(len(v))]
            row[f"{c}__nn"] = [np.int64(a.null_count)]
            row[f"{c}__s"] = [v.sum() if len(v) else 0.0]
            row[f"{c}__ss"] = [float(v @ v) if len(v) else 0.0]
            row[f"{c}__mn"] = [v.min() if len(v) else math.inf]
            row[f"{c}__mx"] = [v.max() if len(v) else -math.inf]
        return pa.table(row)

    aggs = []
    for c in cols:
        aggs += [
            Sum(f"{c}__n"), Sum(f"{c}__nn"), Sum(f"{c}__s"), Sum(f"{c}__ss"),
            Min(f"{c}__mn"), Max(f"{c}__mx"),
        ]
    tot = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)

    out = []
    for c in cols:
        n = int(tot[f"sum({c}__n)"])
        s = float(tot[f"sum({c}__s)"])
        ss = float(tot[f"sum({c}__ss)"])
        mean = s / n if n else None
        var = (ss - n * mean * mean) / (n - 1) if n >= 2 else None
        out.append(
            {
                "col": c,
                "n": np.int64(n),
                "n_null": np.int64(tot[f"sum({c}__nn)"]),
                "mean": mean,
                "stddev": math.sqrt(max(var, 0.0)) if var is not None else None,
                "min": float(tot[f"min({c}__mn)"]) if n else None,
                "max": float(tot[f"max({c}__mx)"]) if n else None,
            }
        )
    return pd.DataFrame(out)


def correlation_matrix(
    ds: ray.data.Dataset, cols: Sequence[str]
) -> pd.DataFrame:
    """Pairwise Pearson correlation over ``cols`` — one output row per
    unordered pair ``(col_a, col_b, corr)``, ``col_a`` before ``col_b``
    in the input order.  Rows with a null in ANY of ``cols`` are
    dropped (listwise deletion) — pass a null-free projection for
    pairwise-deletion semantics.

    Scale contract: the PCA scatter topology (`ann.pca_train`) —
    each block reduces to (n, Σx, XᵀX) partials, O(d²) scalars,
    tree-combined by Ray's native sum; the driver solves only the
    d×d normalization.  One streaming pass, zero shuffle.
    """
    cols = list(cols)
    d = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        x = np.column_stack(
            [
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in cols
            ]
        ) if len(batch) else np.empty((0, d))
        if len(x):
            x = x[~np.isnan(x).any(axis=1)]
        row: dict = {"__cn": [np.int64(len(x))]}
        s = x.sum(axis=0) if len(x) else np.zeros(d)
        m = x.T @ x if len(x) else np.zeros((d, d))
        for i in range(d):
            row[f"__cs_{i}"] = [float(s[i])]
            for j in range(i, d):
                row[f"__cm_{i}_{j}"] = [float(m[i, j])]
        return pa.table(row)

    tot = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["__cn"]
        + [f"__cs_{i}" for i in range(d)]
        + [f"__cm_{i}_{j}" for i in range(d) for j in range(i, d)]
    )
    n = float(tot["sum(__cn)"])
    s = np.array([tot[f"sum(__cs_{i})"] for i in range(d)])
    var_num = np.array(
        [n * tot[f"sum(__cm_{i}_{i})"] - s[i] * s[i] for i in range(d)]
    )
    out = []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * tot[f"sum(__cm_{i}_{j})"] - s[i] * s[j]
            den = math.sqrt(max(var_num[i], 0.0)) * math.sqrt(max(var_num[j], 0.0))
            out.append(
                {
                    "col_a": cols[i],
                    "col_b": cols[j],
                    "corr": num / den if den > 0 else None,
                }
            )
    return pd.DataFrame(out)


def group_zscore(
    ds: ray.data.Dataset,
    by: Sequence[str],
    col: str,
    *,
    out_col: str = "z",
    ddof: int = 0,
) -> ray.data.Dataset:
    """Standardize ``col`` within each group: ``z = (v - mean_g) /
    std_g`` (population std by default, ``ddof=1`` for sample) — the
    per-source feature-normalization pass run before mixing corpora or
    training reward/quality models.  Groups with zero variance (or
    fewer than ``ddof + 1`` rows) get a null z.

    Scale contract: pass 1 reduces each block to per-group
    (count, Σv, Σv²) partials combined by the distributed
    ``grouped_aggregate`` — the exchange moves O(groups/block) rows.
    The group-stats table (O(groups): sources, languages, shards — a
    grouping column at 100 TB is low-cardinality by construction) is
    broadcast once via ``ray.put``; pass 2 is map-only.  For unbounded
    group counts, replace the broadcast with a co-shuffle join on
    ``by`` — exchange cost, same result.
    """
    by = list(by)

    def add_sq(batch: pa.Table) -> pa.Table:
        v = pa.compute.cast(batch.column(col), pa.float64())
        return batch.append_column("__v", v).append_column(
            "__v2", pa.compute.multiply(v, v)
        )

    stats = grouped_aggregate(
        ds.select_columns([*by, col]).map_batches(add_sq, batch_format="pyarrow"),
        by,
        [("__gn", "__v", "count"), ("__gs", "__v", "sum"), ("__gss", "__v2", "sum")],
    ).to_pandas()  # O(groups) — see the scale contract above
    key = (
        stats[by[0]].astype(str)
        if len(by) == 1
        else stats[by].astype(str).agg("\x1f".join, axis=1)
    )
    n = stats["__gn"].to_numpy(dtype=np.float64)
    mean = stats["__gs"].to_numpy() / n
    var = np.where(
        n > ddof, (stats["__gss"].to_numpy() - n * mean * mean) / (n - ddof), np.nan
    )
    std = np.sqrt(np.maximum(var, 0.0))
    stats_ref = ray.put(
        {k: (m, s) for k, m, s in zip(key, mean, std)}
    )

    def standardize(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(stats_ref)
        k = (
            df[by[0]].astype(str)
            if len(by) == 1
            else df[by].astype(str).agg("\x1f".join, axis=1)
        )
        ms = np.array([lut[x] for x in k], dtype=np.float64).reshape(-1, 2)
        v = df[col].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - ms[:, 0]) / ms[:, 1]
        df = df.copy()
        df[out_col] = np.where(np.isfinite(z), z, np.nan)
        return df

    return ds.map_batches(standardize, batch_format="pandas")


def validate_expectations(
    ds: ray.data.Dataset,
    rules: Sequence[dict],
) -> ray.data.Dataset:
    """Data-quality gate (the Great-Expectations / dbt-test primitive):
    evaluate declarative row-level rules over the full dataset and
    return one row per rule with its violation count — the contract
    check every 100-TB ingest runs before promoting a partition.

    Rule dicts (``kind``, ``col``, plus kind-specific fields):

    - ``{"kind": "not_null", "col": c}``
    - ``{"kind": "in_range", "col": c, "lo": x, "hi": y}`` (inclusive;
      nulls are NOT range violations — compose with not_null)
    - ``{"kind": "accepted_values", "col": c, "values": [...]}``
    - ``{"kind": "unique", "col": c}`` (violations = rows beyond the
      first per duplicated value)
    - ``{"kind": "matches", "col": c, "pattern": regex}`` (strings;
      nulls skipped)

    Scale contract: every rule except ``unique`` is map-ONLY — each
    block counts its own violations vectorized and one tiny Sum
    aggregate merges per-rule partials.  ``unique`` needs cross-block
    evidence: blocks emit per-block (value, count) partials for the
    rule's column ONLY (distinct-per-block sized), one groupby(value)
    sums them, and violations = Σ (count − 1) over duplicated values —
    keys shuffle once, rows never do.  Output: (rule, col, violations).
    """
    rules = list(rules)
    mapside = [(i, r) for i, r in enumerate(rules) if r["kind"] != "unique"]
    uniq = [(i, r) for i, r in enumerate(rules) if r["kind"] == "unique"]

    def rule_name(r: dict) -> str:
        return r["kind"]

    parts = []
    if mapside:

        def count_viol(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df.columns):  # zero-column empty block (see raylog.py)
                return pd.DataFrame(
                    {"__i": pd.Series([], dtype=np.int64),
                     "rule": pd.Series([], dtype=object),
                     "col": pd.Series([], dtype=object),
                     "violations": pd.Series([], dtype=np.int64)}
                )
            out = []
            for i, r in mapside:
                c = df[r["col"]]
                k = r["kind"]
                if k == "not_null":
                    v = int(c.isna().sum())
                elif k == "in_range":
                    v = int(((c < r["lo"]) | (c > r["hi"])).sum())
                elif k == "accepted_values":
                    v = int((~c.isin(r["values"]) & c.notna()).sum())
                elif k == "matches":
                    s = c.dropna().astype(str)
                    v = int((~s.str.fullmatch(r["pattern"])).sum())
                else:
                    raise ValueError(k)
                out.append((i, rule_name(r), r["col"], v))
            return pd.DataFrame(
                out, columns=["__i", "rule", "col", "violations"]
            )

        parts.append(
            grouped_aggregate(
                ds.map_batches(count_viol, batch_format="pandas"),
                ["__i", "rule", "col"],
                [("violations", "violations", "sum")],
            )
        )

    for i, r in uniq:
        col = r["col"]

        def val_counts(df: pd.DataFrame, col=col) -> pd.DataFrame:
            vc = df[col].value_counts(dropna=False)
            return pd.DataFrame({"__v": vc.index, "n": vc.to_numpy()})

        merged = grouped_aggregate(
            ds.select_columns([col]).map_batches(val_counts, batch_format="pandas"),
            ["__v"],
            [("n", "n", "sum")],
        )

        # dup-excess partial per merged block, tiny driver sum: the value
        # table is distinct-sized and the per-block scalar is O(1)
        def excess(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n"].to_numpy()
            return pd.DataFrame({"x": [int(n[n > 1].sum() - (n > 1).sum())]})

        tot = merged.map_batches(excess, batch_format="pandas").to_pandas()["x"].sum()
        parts.append(
            ray.data.from_arrow(
                pa.table(
                    {
                        "__i": pa.array([i], pa.int64()),
                        "rule": pa.array(["unique"], pa.string()),
                        "col": pa.array([col], pa.string()),
                        "violations": pa.array([int(tot)], pa.int64()),
                    }
                )
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return df[["rule", "col", "violations"]].astype({"violations": np.int64})

    # rows = one per rule: the sort is O(rules), it just pins the output
    # to the caller's rule order
    return out.sort("__i").map_batches(strip, batch_format="pandas")
