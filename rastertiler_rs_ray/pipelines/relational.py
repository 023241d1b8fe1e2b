"""Relational operator surface, Ray-Data-first.

The reference has one physical join and a handful of aggregations
(SURVEY.md §2.4/§2.5 — ``tiles`` view join /root/reference/src/mbtiles.rs:27-29,
histogram /root/reference/src/array.rs:20-29, merge keep-first
/root/reference/src/mbtiles.rs:168-177).  This module generalizes them
into the relational primitives a user of the engine composes pipelines
from, each expressed with the shuffle-minimizing pattern that survives
100 TB:

- ``grouped_aggregate``  map-side PARTIAL aggregation inside
  ``map_batches`` (pandas groupby per Arrow block) → tiny final
  ``groupby`` over per-block partials.  The all-to-all exchange moves
  one row per (block, key) instead of one row per input row — for
  low-cardinality keys (the common analytics case) the shuffle is
  ~block_count × key_count rows regardless of input size.
- ``broadcast_hash_join``  small side is ``ray.put`` ONCE as a pandas
  frame; every map task reads the shared object-store copy (zero per
  batch re-shipping) and merges vectorized.  No shuffle at all.
- ``semi_join`` / ``anti_join``  broadcast key-set membership filter
  (``pyarrow.compute.is_in``) — the Ray translation of J5.
- ``top_k``  per-block partial top-k then a driver-side k-way merge of
  the tiny partials; never a global sort shuffle.
- ``distinct``  per-block dedup partial → final groupby keep-first —
  same shape as the tileset content dedup (G5).

Every function takes and returns ``ray.data.Dataset`` (or a small
``pyarrow.Table`` for provably-small results) so stages splice.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# agg spec: (out_name, in_col, kind) with kind ∈ sum|count|min|max|mean
_PARTIAL_OF = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def _arrow_schema_of(ds: ray.data.Dataset) -> pa.Schema | None:
    """Arrow schema of a Dataset, converting Ray's pandas-block schema
    types (numpy dtypes / ``object``) to arrow types; None if the
    dataset has no recoverable schema (e.g. materialized to zero
    blocks)."""
    sch = ds.schema(fetch_if_missing=True)
    if sch is None:
        return None

    def conv(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # pandas object dtype: string columns

    return pa.schema([(n, conv(t)) for n, t in zip(sch.names, sch.types)])


def _partial_agg_fn(keys: list[str], aggs: list[tuple[str, str, str]]):
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(list(keys), sort=False, observed=True, dropna=False)
        cols = {}
        for out, col, kind in aggs:
            if kind == "count":
                s = g[col].count() if col else g.size()
            elif kind == "mean":
                cols[f"__{out}__sum"] = g[col].sum()
                cols[f"__{out}__cnt"] = g[col].count()
                continue
            else:
                s = getattr(g[col], kind)()
            cols[f"__{out}__{kind}"] = s
        out_df = pd.DataFrame(cols).reset_index()
        # strip the pandas schema metadata from_pandas attaches: it makes
        # the schema unhashable and trips Ray's shuffle-sampling schema
        # dedup into warnings
        out = pa.Table.from_pandas(out_df, preserve_index=False).replace_schema_metadata(
            None
        )
        # a zero-row batch infers null-typed key columns; pin them to the
        # input dtype so every partial block carries ONE stable schema
        # (Ray's aggregate emits schema-less empty bundles otherwise)
        for k in keys:
            idx = out.schema.get_field_index(k)
            want = batch.schema.field(k).type
            if out.schema.field(idx).type != want:
                out = out.set_column(idx, k, pc.cast(out.column(k), want))
        return out

    return partial


def grouped_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    *,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Hash aggregation with map-side combine.

    ``aggs``: list of (output_name, input_col, kind) where kind is one
    of sum/count/min/max/mean.  Output columns carry ``output_name``
    exactly (oracle-SQL naming contract).
    """
    keys = list(keys)
    partial = ds.map_batches(
        _partial_agg_fn(keys, list(aggs)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    # final merge: sum the partial sums/counts, min the mins, max the maxes
    from ray.data.aggregate import Max, Min, Sum

    ray_aggs = []
    for out, col, kind in aggs:
        if kind in ("sum", "count"):
            ray_aggs.append(Sum(f"__{out}__{kind}", alias_name=f"__{out}__{kind}"))
        elif kind == "mean":
            ray_aggs.append(Sum(f"__{out}__sum", alias_name=f"__{out}__sum"))
            ray_aggs.append(Sum(f"__{out}__cnt", alias_name=f"__{out}__cnt"))
        elif kind == "min":
            ray_aggs.append(Min(f"__{out}__min", alias_name=f"__{out}__min"))
        elif kind == "max":
            ray_aggs.append(Max(f"__{out}__max", alias_name=f"__{out}__max"))
        else:
            raise ValueError(kind)
    merged = partial.groupby(keys).aggregate(*ray_aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        out = {k: batch.column(k) for k in keys}
        for name, col, kind in aggs:
            if kind == "mean":
                s = batch.column(f"__{name}__sum").to_numpy(zero_copy_only=False)
                c = batch.column(f"__{name}__cnt").to_numpy(zero_copy_only=False)
                out[name] = pa.array(s / c)
            else:
                out[name] = batch.column(f"__{name}__{kind}")
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")


def broadcast_hash_join(
    big: ray.data.Dataset,
    small: pa.Table,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    right_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table, shuffle-free.

    The small side is placed in the object store ONCE (``ray.put``);
    each map task reads the shared copy zero-copy and runs a vectorized
    pandas merge.  Correct replacement for a shuffle join whenever one
    side fits in a worker heap (dimension tables, manifests).
    """
    if right_cols is not None:
        small = small.select(list(dict.fromkeys([right_on, *right_cols])))
    small_ref = ray.put(small.to_pandas())

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        left = batch.to_pandas()
        out = left.merge(right, how=how, left_on=left_on, right_on=right_on)
        if right_on != left_on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return big.map_batches(merge, batch_format="pyarrow")


def _key_set_ref(small: pa.Table, on: str):
    return ray.put(small.column(on).combine_chunks())


def semi_join(big: ray.data.Dataset, small: pa.Table, *, on: str) -> ray.data.Dataset:
    """Rows of ``big`` whose ``on`` appears in ``small`` (broadcast set)."""
    ref = _key_set_ref(small, on)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column(on), value_set=ray.get(ref)))

    return big.map_batches(f, batch_format="pyarrow")


def anti_join(big: ray.data.Dataset, small: pa.Table, *, on: str) -> ray.data.Dataset:
    """Rows of ``big`` whose ``on`` does NOT appear in ``small``."""
    ref = _key_set_ref(small, on)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column(on), value_set=ray.get(ref))
        return batch.filter(pc.invert(mask))

    return big.map_batches(f, batch_format="pyarrow")


def top_k(
    ds: ray.data.Dataset,
    k: int,
    by: str,
    *,
    descending: bool = True,
    columns: Sequence[str] | None = None,
) -> pa.Table:
    """Global top-k without a global sort: per-block partial top-k
    (numpy argpartition) → tiny final merge on the driver.

    Shuffle cost is k rows per block instead of the whole dataset.
    """
    cols = list(columns) if columns else None

    def partial(batch: pa.Table) -> pa.Table:
        if cols:
            batch = batch.select(list(dict.fromkeys([*cols, by])))
        v = batch.column(by).to_numpy(zero_copy_only=False)
        if len(v) > k:
            idx = np.argpartition(-v if descending else v, k - 1)[:k]
            batch = batch.take(pa.array(np.sort(idx)))
        return batch

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()  # ≤ k×blocks rows
    merged = pa.Table.from_pylist(partials) if partials else pa.table({})
    if not len(merged):
        return merged
    import pyarrow.compute as pc

    order = pc.sort_indices(
        merged, sort_keys=[(by, "descending" if descending else "ascending")]
    )[:k]
    out = merged.take(order)
    return out.select(cols) if cols else out


def distinct(ds: ray.data.Dataset, keys: Sequence[str]) -> ray.data.Dataset:
    """Distinct key combinations: per-block partial dedup → final groupby.

    Identical shuffle shape to the tileset content dedup (SURVEY §2.6 G5):
    the exchange only moves already-deduped partials.
    """
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


def filter_project(
    ds: ray.data.Dataset,
    *,
    predicate,
    columns: Sequence[str],
) -> ray.data.Dataset:
    """Vectorized filter + projection in one pass (no row loop).

    ``predicate``: callable pa.Table → pa.BooleanArray.
    """
    cols = list(columns)

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch)).select(cols)

    return ds.map_batches(f, batch_format="pyarrow")

def discrete_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
    *,
    by: Sequence[str] = (),
) -> pa.Table:
    """Exact quantiles for discrete-valued columns (percentile_disc
    semantics: smallest value whose cumulative count reaches ``ceil(q·n)``).

    Shuffle shape: map-side (group, value) COUNT partials → tiny groupby
    merge; only distinct values travel, never rows — exact global
    quantiles for a counting cost, the scale path when the value domain
    is bounded (ids, grades, bucketed measures).  Result is provably
    small (groups × qs) and returned as a pyarrow Table.
    """
    by = list(by)
    counts = grouped_aggregate(ds, [*by, col], [("n", col, "count")]).to_pandas()
    out_rows = []
    group_iter = counts.groupby(by) if by else [((), counts)]
    for gkey, gdf in group_iter:
        gdf = gdf.sort_values(col)
        vals = gdf[col].to_numpy()
        cum = gdf["n"].to_numpy().cumsum()
        n = cum[-1]
        for q in qs:
            rank = int(np.ceil(q * n)) if q > 0 else 1
            idx = int(np.searchsorted(cum, rank))
            key = gkey if isinstance(gkey, tuple) else (gkey,)
            out_rows.append({**dict(zip(by, key)), "q": float(q), "value": vals[idx]})
    return pa.Table.from_pylist(out_rows)


def hash_sample(
    ds: ray.data.Dataset, *, key: str, percent: int, mult: int = 2654435761
) -> ray.data.Dataset:
    """Deterministic hash sample: keep rows where ``(key*mult) % 100 <
    percent``.  Map-only (no shuffle), reproducible across runs and
    resumable — at 100 TB this is the sane sampling primitive; a
    ``random_shuffle().limit()`` would be an all-to-all exchange for a
    filter's worth of work.

    ``key * mult`` must stay inside int64 (key < ~3.4e9 with the default
    multiplier) so the numpy and SQL sides agree exactly.
    """

    def f(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy().astype(np.int64, copy=False)
        keep = (k * np.int64(mult)) % np.int64(100) < np.int64(percent)
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_top_n(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    *,
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak_cols: Sequence[str] = (),
    rank_col: str = "rnk",
) -> ray.data.Dataset:
    """Per-group top-N with a rank column (windowed ``row_number()``).

    Map-side partial prune — each block keeps at most ``n`` rows per
    group it sees — so the ``groupby`` exchange moves ≤ n rows per
    (block, group) instead of every row.  The final per-group sort runs
    over ≤ n × block_count candidates.  ``tiebreak_cols`` must make the
    order total (e.g. a unique id) or ranks are nondeterministic.
    """
    part_keys = list(part_keys)
    by = [order_col, *tiebreak_cols]
    asc = [not descending] + [True] * len(tiebreak_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(part_keys, sort=False).head(n)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort").head(n).copy()
        df[rank_col] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(part_keys)
        .map_groups(final, batch_format="pandas")
    )


def lag_within_groups(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "prev_value",
) -> ray.data.Dataset:
    """Previous-row value per group (window ``LAG`` / as-of self-join).

    Unlike ``grouped_top_n`` there is no map-side prune — LAG needs the
    whole ordered group, so this is one ``groupby`` exchange with an
    in-group vectorized sort + shift.  Partitioning assumption: a single
    group (one user's history) fits in a worker heap; salt or
    time-bucket the key upstream if a group can be unbounded.
    """
    order_cols = list(order_cols)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort").copy()
        df[out_col] = df[value_col].shift(1)
        return df

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def sessionize(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str,
    *,
    gap_seconds: float,
    out_col: str = "session_id",
) -> ray.data.Dataset:
    """Gap-based session windows: a new session starts whenever the gap
    to the key's previous event is strictly greater than ``gap_seconds``.
    Session ids are 1-based and ordered by time within each key.

    Same shape as ``lag_within_groups``: one groupby exchange, then an
    in-group sort + vectorized diff/cumsum — the streaming-window
    operator expressed batch-first (SURVEY §2.9).  Timestamp arithmetic
    is integer microseconds, so results are engine-exact.
    """
    order_cols = list(order_cols)
    gap = pd.Timedelta(seconds=gap_seconds)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort").copy()
        d = df[ts_col].diff()
        df[out_col] = (d.isna() | (d > gap)).cumsum().astype(np.int64)
        return df

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def hopping_window_aggregate(
    ds: ray.data.Dataset,
    *,
    ts_col: str,
    size: int,
    hop: int,
    keys: Sequence[str] = (),
    aggs: Sequence[tuple[str, str, str]],
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Hopping (sliding) windowed aggregate: windows of ``size`` ticks
    starting every ``hop`` ticks (``size % hop == 0``); each row lands
    in exactly ``size // hop`` windows.

    Map-side explode to (window_start, row) — a k-fold fan-out of only
    the columns the aggregate needs — then the same partial-combined
    ``grouped_aggregate`` as tumbling windows: the shuffle moves one
    row per (block, window, key), never per event.  Tumbling windows
    are the ``size == hop`` special case.
    """
    if size % hop != 0:
        raise ValueError("hopping_window_aggregate requires size % hop == 0")
    k = size // hop
    need = list(
        dict.fromkeys([*keys, *(col for _, col, _ in aggs if col)])
    )

    def explode(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column(ts_col), pa.int64()).to_numpy()
        base = np.floor_divide(ts, hop)
        outs = []
        for i in range(k):
            cols = {c: batch.column(c) for c in need}
            cols[window_col] = pa.array((base - i) * hop)
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return grouped_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        [window_col, *keys],
        aggs,
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lo: int,
    hi: int,
    right_on: str | None = None,
    left_cols: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Interval/range join: every (left, right) pair with equal key and
    ``left_ts + lo <= right_ts <= left_ts + hi`` (integer timestamps,
    inclusive bounds).

    Scale shape — time-bucketed co-partition, one shuffle, no
    quadratic blow-up outside a bucket: the time axis is cut into
    buckets of width ``hi - lo + 1``; each RIGHT row lands in exactly
    its own bucket, each LEFT row is replicated to the ≤2 buckets its
    window can reach, and a ``groupby(key, bucket)`` co-locates them.
    The in-group match is two vectorized ``searchsorted`` calls over
    the bucket's sorted right timestamps.  Every qualifying pair is
    emitted exactly once (right rows are never replicated).  This is
    the windowed generalization of ``asof_join``'s tag-union single
    co-shuffle.

    Returns ``left_cols`` + ``right_cols`` (right names suffixed on
    collision).  Like asof_join, carried integer columns may come back
    float64 via the union's typed nulls — cast downstream if needed.
    """
    if hi < lo:
        raise ValueError("range_join requires lo <= hi")
    right_on = right_on or on
    width = int(hi - lo + 1)

    lcols = list(left_cols) if left_cols else [c for c in left.schema().names]
    rcols = list(right_cols) if right_cols else [c for c in right.schema().names]
    rout = {c: (c + right_suffix if c in lcols else c) for c in rcols}

    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ts = pc.cast(batch.column(left_ts), pa.int64()).to_numpy()
        b0 = np.floor_divide(ts + lo, width)
        b1 = np.floor_divide(ts + hi, width)
        cols = {c: batch.column(c) for c in lcols}
        out0 = dict(cols)
        out0["__key"] = pc.cast(batch.column(on), pa.int64())
        out0["__ts"] = pa.array(ts)
        out0["__bucket"] = pa.array(b0)
        out0["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        for c in rcols:
            out0[rout[c]] = pa.nulls(n, rtypes[c])
        t0 = pa.table(out0)
        dup = b1 != b0
        if not dup.any():
            return t0
        t1 = t0.filter(pa.array(dup)).set_column(
            t0.schema.get_field_index("__bucket"), "__bucket", pa.array(b1[dup])
        )
        return pa.concat_tables([t0, t1])

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ts = pc.cast(batch.column(right_ts), pa.int64()).to_numpy()
        out = {c: pa.nulls(n, ltypes[c]) for c in lcols}
        out["__key"] = pc.cast(batch.column(right_on), pa.int64())
        out["__ts"] = pa.array(ts)
        out["__bucket"] = pa.array(np.floor_divide(ts, width))
        out["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for c in rcols:
            out[rout[c]] = batch.column(c)
        return pa.table(out)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    rnames = [rout[c] for c in rcols]

    def match(df: pd.DataFrame) -> pd.DataFrame:
        lrows = df[df["__side"] == 0]
        rrows = df[df["__side"] == 1].sort_values("__ts", kind="stable")
        if not len(lrows) or not len(rrows):
            return df.iloc[0:0][lcols + rnames]
        rts = rrows["__ts"].to_numpy()
        lts = lrows["__ts"].to_numpy()
        a = np.searchsorted(rts, lts + lo, side="left")
        b = np.searchsorted(rts, lts + hi, side="right")
        counts = b - a
        li = np.repeat(np.arange(len(lts)), counts)
        offs = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ri = np.repeat(a, counts) + offs
        out = lrows.iloc[li][lcols].reset_index(drop=True)
        for c in rnames:
            out[c] = rrows.iloc[ri][c].to_numpy()
        return out

    return unioned.groupby(["__key", "__bucket"]).map_groups(
        match, batch_format="pandas"
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_ts",
) -> ray.data.Dataset:
    """Backward as-of join: each left row gets the largest ``right_ts``
    of the same key with ``right_ts <= left_ts`` (DuckDB ``ASOF JOIN``
    semantics, inner — unmatched left rows drop).

    Single co-shuffle: both sides are tagged and unioned (aligned
    schemas), one ``groupby(key)`` moves each key's rows to one task,
    and the in-group match is a vectorized ``searchsorted`` of left
    timestamps into the key's sorted right timestamps.  No broadcast, no
    second exchange; the payload carried is the matched timestamp itself
    (carrying arbitrary right columns would need a tie rule on equal
    timestamps — keep the operator deterministic).

    Caveat: left integer columns come back float64 (right rows fill
    them with nulls through the union, and the group's pandas
    conversion promotes) — cast back downstream if exact integer types
    matter.
    """
    right_on = right_on or on

    # carry all left columns through; right rows fill them with typed nulls
    lschema = left.schema()
    left_cols = list(lschema.names)
    left_types = dict(zip(lschema.names, lschema.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        out = {c: batch.column(c) for c in left_cols}
        out["__key"] = pc.cast(batch.column(on), pa.int64())
        out["__ts"] = pc.cast(batch.column(left_ts), pa.int64())
        out["__side"] = pa.array(np.zeros(len(batch), dtype=np.int8))
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        out = {c: pa.nulls(n, left_types[c]) for c in left_cols}
        out["__key"] = pc.cast(batch.column(right_on), pa.int64())
        out["__ts"] = pc.cast(batch.column(right_ts), pa.int64())
        out["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(out)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        lmask = df["__side"] == 0
        lrows = df[lmask]
        rts = np.sort(df.loc[~lmask, "__ts"].to_numpy())
        if len(rts) == 0 or len(lrows) == 0:
            return lrows.iloc[0:0][left_cols]
        lts = lrows["__ts"].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        out = lrows[ok][left_cols].copy()
        out[out_col] = rts[idx[ok]]
        return out

    return unioned.groupby("__key").map_groups(match, batch_format="pandas")


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    pivot_col: str,
    categories: Sequence[str],
) -> ray.data.Dataset:
    """Pivot a categorical column into per-category count columns (wide
    conditional aggregation).  One 0/1 indicator column per category is
    added map-side, then the standard partial-sum ``grouped_aggregate``
    — the shuffle moves one row per (block, key) whatever the category
    count."""
    cats = list(categories)

    def indicators(batch: pa.Table) -> pa.Table:
        col = batch.column(pivot_col)
        out = {key: batch.column(key)}
        for c in cats:
            out[c] = pc.cast(pc.equal(col, c), pa.int64())
        return pa.table(out)

    return grouped_aggregate(
        ds.map_batches(indicators, batch_format="pyarrow"),
        [key],
        [(c, c, "sum") for c in cats],
    )


def bloom_semi_prefilter(
    big: ray.data.Dataset,
    keys: ray.data.Dataset,
    *,
    on: str,
    key_col: str | None = None,
    bits_log2: int = 20,
    k: int = 4,
) -> ray.data.Dataset:
    """Map-side Bloom prefilter of ``big`` against a build side too large
    to broadcast exactly.

    Build: per-block partial Bloom filters over ``keys`` (one 2^bits/8-
    byte row per block), OR-merged driver-side (associative), broadcast
    ONCE via ray.put.  Probe: map-only membership filter.  False
    negatives are impossible; false positives (~(1-e^{-kn/m})^k) pass
    through for the downstream exact join to remove — the point is to
    shrink the probe side's shuffle volume, not to be exact.
    """
    from ..functions.bloom import Bloom

    key_col = key_col or on

    def partial(batch: pa.Table) -> pa.Table:
        b = Bloom(bits_log2, k)
        b.add_many(batch.column(key_col).to_numpy())
        return pa.table({"bloom": pa.array([b.to_bytes()], pa.binary())})

    parts = keys.map_batches(partial, batch_format="pyarrow").take_all()
    merged = Bloom(bits_log2, k)
    for row in parts:
        merged = merged.merge(Bloom.from_bytes(row["bloom"], bits_log2, k))
    ref = ray.put(merged.to_bytes())

    def probe(batch: pa.Table) -> pa.Table:
        b = Bloom.from_bytes(ray.get(ref), bits_log2, k)
        return batch.filter(pa.array(b.contains(batch.column(on).to_numpy())))

    return big.map_batches(probe, batch_format="pyarrow")


def shuffle_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Big-big hash join via Ray's partitioned join (J5).

    Both sides hash-partition on the key — an all-to-all exchange; use
    ``broadcast_hash_join`` whenever one side fits in a worker heap.
    ``num_partitions`` defaults to ~2 per CPU.

    Both inputs pass through a batched identity map first: Ray 2.49.2's
    hash-join aggregator crashes (`ArrowInvalid: No match ... FieldRef`)
    when a side carries zero-COLUMN empty blocks (emitted by
    repartition/aggregate on sparse inputs); whole-block maps skip
    empty blocks untouched, but a concrete ``batch_size`` coalesces
    them into schema-ful neighbors.  Remove once Ray's join tolerates
    schema-less empties.
    """
    ncpu = float(ray.cluster_resources().get("CPU", 8))
    if num_partitions is None:
        num_partitions = max(int(ncpu) * 2, 8)

    def _ident(b: pa.Table) -> pa.Table:
        return b

    # Cap each join's aggregator-actor pool at ~1/4 of cluster CPUs.
    # Ray 2.49's default reserves min(num_partitions, CPU/2) cores per
    # JoinOperator; a plan with two cascaded joins (e.g. orders⋈customer
    # then lineitem⋈that) then reserves EVERY core for aggregators on a
    # small session and the feeding map tasks starve — a scheduling
    # deadlock.  1/4 per join keeps two concurrent joins + their
    # producers runnable everywhere, and on ≥32-CPU sessions this
    # matches Ray's own 8-core default budget.
    n_agg = min(num_partitions, 64)
    agg_cpus = min(1.0, max(0.05, (ncpu / 4.0) / n_agg))

    left = left.map_batches(_ident, batch_format="pyarrow", batch_size=1 << 20)
    right = right.map_batches(_ident, batch_format="pyarrow", batch_size=1 << 20)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        aggregator_ray_remote_args={
            "num_cpus": agg_cpus,
            "scheduling_strategy": "SPREAD",
        },
    )


def _values_at_ranks(
    ds: ray.data.Dataset,
    col: str,
    rank_fn,
    *,
    sample_per_block: int = 4096,
    collect_budget: int = 200_000,
    max_rounds: int = 8,
) -> "tuple[int, list[float]]":
    """Distributed exact order-statistic selection: ``rank_fn(n)`` maps
    the (discovered) non-null count to a list of 0-based target ranks;
    returns ``(n, values)`` with one exact data element per rank.  The
    iterative range-refinement engine shared by
    ``continuous_percentiles`` (percentile_disc ranks) and
    ``interpolated_percentiles`` (the two quantile_cont neighbor ranks).
    Driver state stays bounded (per-block partials + capped samples) —
    see ``continuous_percentiles`` for the round structure."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()),
                 "lo": pa.array([np.inf]), "hi": pa.array([-np.inf]),
                 "sample": pa.array([np.empty(0, np.float64).tobytes()], pa.binary())}
            )
        if len(v) > sample_per_block:
            h = pd.util.hash_array(v.view(np.uint64).copy())
            keep = np.argsort(h, kind="stable")[:sample_per_block]
            samp = v[keep]
        else:
            samp = v
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()),
             "lo": pa.array([float(v.min())]), "hi": pa.array([float(v.max())]),
             "sample": pa.array([samp.tobytes()], pa.binary())}
        )

    part = ds.select_columns([col]).map_batches(partials, batch_format="pyarrow").to_pandas()
    n = int(part["n"].sum())
    if n == 0:
        raise ValueError(f"continuous_percentiles: no non-null values in {col!r}")
    gmin, gmax = float(part["lo"].min()), float(part["hi"].max())
    sample = np.sort(np.concatenate(
        [np.frombuffer(b, np.float64) for b in part["sample"]]
    ))
    ranks = list(rank_fn(n))  # 0-based

    def bracket(rank, s):
        if len(s) == 0:
            return gmin, gmax
        est = rank / n * len(s)
        d = 3.0 * np.sqrt(len(s)) + 2
        lo_i = int(np.clip(np.floor(est - d), 0, len(s) - 1))
        hi_i = int(np.clip(np.ceil(est + d), 0, len(s) - 1))
        return float(s[lo_i]), float(s[hi_i])

    brackets = [bracket(r, sample) for r in ranks]
    answers: dict[int, float] = {}

    for _ in range(max_rounds):
        live = [i for i in range(len(ranks)) if i not in answers]
        if not live:
            break
        los = np.array([brackets[i][0] for i in live])
        his = np.array([brackets[i][1] for i in live])
        los_ref, his_ref = ray.put(los), ray.put(his)

        def scan(batch: pa.Table, _lo=los_ref, _hi=his_ref) -> pa.Table:
            lo, hi = ray.get(_lo), ray.get(_hi)
            v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = np.array([(v < l).sum() for l in lo], np.int64)
            cols = {"below": pa.array([below.tobytes()], pa.binary())}
            mids, nin = [], []
            for l, h in zip(lo, hi):
                m = v[(v >= l) & (v <= h)]
                nin.append(len(m))
                if len(m) > sample_per_block:
                    hh = pd.util.hash_array(m.view(np.uint64).copy())
                    m = m[np.argsort(hh, kind="stable")[:sample_per_block]]
                mids.append(m)
            cols["nin"] = pa.array([np.array(nin, np.int64).tobytes()], pa.binary())
            cols["mids"] = pa.array([np.concatenate(mids).tobytes() if mids else b""], pa.binary())
            cols["midlens"] = pa.array(
                [np.array([len(m) for m in mids], np.int64).tobytes()], pa.binary()
            )
            return pa.table(cols)

        res = ds.select_columns([col]).map_batches(scan, batch_format="pyarrow").to_pandas()
        below_tot = sum(np.frombuffer(b, np.int64) for b in res["below"])
        nin_tot = sum(np.frombuffer(b, np.int64) for b in res["nin"])
        mid_vals: list[np.ndarray] = [np.empty(0)] * len(live)
        for _, row in res.iterrows():
            lens = np.frombuffer(row["midlens"], np.int64)
            vals = np.frombuffer(row["mids"], np.float64)
            off = 0
            for j, L in enumerate(lens):
                mid_vals[j] = np.concatenate([mid_vals[j], vals[off:off + L]])
                off += L

        for j, i in enumerate(live):
            rank, nb, ni = ranks[i], int(below_tot[j]), int(nin_tot[j])
            if not (nb <= rank < nb + ni):
                # sample misbracketed (vanishing probability): widen fully
                brackets[i] = (gmin, gmax)
                continue
            if ni <= collect_budget and ni == len(mid_vals[j]):
                answers[i] = float(np.sort(mid_vals[j])[rank - nb])
            elif len(mid_vals[j]):
                # rank within range maps through the in-range sample
                s = np.sort(mid_vals[j])
                est = (rank - nb) / max(ni, 1) * len(s)
                d = 3.0 * np.sqrt(len(s)) + 2
                lo_i = int(np.clip(np.floor(est - d), 0, len(s) - 1))
                hi_i = int(np.clip(np.ceil(est + d), 0, len(s) - 1))
                brackets[i] = (float(s[lo_i]), float(s[hi_i]))
            else:
                brackets[i] = (gmin, gmax)

    missing = [ranks[i] for i in range(len(ranks)) if i not in answers]
    if missing:
        raise RuntimeError(
            f"_values_at_ranks: ranks {missing} unresolved after {max_rounds} rounds"
        )
    return n, [answers[i] for i in range(len(ranks))]


def continuous_percentiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
    *,
    sample_per_block: int = 4096,
    collect_budget: int = 200_000,
    max_rounds: int = 8,
) -> "pd.DataFrame":
    """EXACT percentile_disc over a continuous (all-distinct) column via
    distributed iterative range-refinement selection — the selection
    counterpart of ``discrete_quantiles`` (whose value-counting shuffle
    degenerates when every value is distinct).

    Round 0 scans once for per-block ``(count, min, max, hash-picked
    sample)`` partials; the driver brackets each target rank
    ``ceil(q*n)`` with a DKW-style sample-rank margin.  Each later
    round scans once, counting ``x < lo`` exactly and sampling inside
    each bracket; a bracket whose exact member count fits
    ``collect_budget`` is collected and answered exactly
    (``sorted(members)[rank - count_below]``), otherwise the in-range
    sample re-brackets it.  Every round's driver state is bounded:
    per-block partials + capped samples — never O(n).  Typically 2
    scans end-to-end; raises after ``max_rounds`` (never silently
    approximate).

    Returns a one-row pandas DataFrame with a float64 column per q
    (``p{q*100:g}`` with '.' -> '_'); values are actual data elements,
    so they compare bit-exactly against DuckDB's percentile_disc.
    """
    import pandas as pd

    qs = list(qs)

    # NOTE: the float np.ceil(q * n) rank INTENTIONALLY mirrors DuckDB's
    # percentile_disc float rank arithmetic (the correctness oracle) —
    # e.g. q=0.1, n=30 yields 0-based index 3 where exact rational ceil
    # gives 2.  Do not "fix" this to Fraction math without changing the
    # oracle in lockstep; the convention is float-rank by design.
    def rank_fn(n: int) -> list[int]:
        return [max(int(np.ceil(q * n)), 1) - 1 for q in qs]

    _, vals = _values_at_ranks(
        ds, col, rank_fn,
        sample_per_block=sample_per_block,
        collect_budget=collect_budget,
        max_rounds=max_rounds,
    )

    def name(q):
        s = ("%g" % (q * 100)).replace(".", "_")
        return f"p{s}"

    return pd.DataFrame({name(q): [vals[i]] for i, q in enumerate(qs)})


def interpolated_percentiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
    *,
    sample_per_block: int = 4096,
    collect_budget: int = 200_000,
    max_rounds: int = 8,
) -> "pd.DataFrame":
    """EXACT quantile_cont (linear interpolation between order
    statistics): ``h = (n-1)·q``, answer = ``v[⌊h⌋] + (h-⌊h⌋)·(v[⌊h⌋+1]
    - v[⌊h⌋])`` — the SQL-standard percentile_cont convention, mirrored
    float-for-float.  Needs only the (at most) 2·len(qs) neighbor order
    statistics, fetched by the same bounded range-refinement engine as
    ``continuous_percentiles`` — never a global sort.

    Returns a one-row DataFrame with an int64 ``p..._e6`` column per q
    (result × 1e6, floor(x+0.5)): the interpolation multiply is spelled
    identically in the SQL oracle, and the e6 quantization absorbs the
    last-ulp difference DuckDB's fused ops could introduce.
    """
    import pandas as pd

    qs = list(qs)
    state: dict = {}

    def rank_fn(n: int) -> list[int]:
        ranks: list[int] = []
        idx = []
        for q in qs:
            h = (n - 1) * float(q)
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            ranks.append(lo)
            ranks.append(hi)
            idx.append((h, lo, hi))
        state["idx"] = idx
        # dedupe while preserving a stable order; remember positions
        uniq = sorted(set(ranks))
        state["pos"] = {r: i for i, r in enumerate(uniq)}
        return uniq

    _, vals = _values_at_ranks(
        ds, col, rank_fn,
        sample_per_block=sample_per_block,
        collect_budget=collect_budget,
        max_rounds=max_rounds,
    )
    pos = state["pos"]

    def name(q):
        s = ("%g" % (q * 100)).replace(".", "_")
        return f"p{s}_e6"

    out = {}
    for q, (h, lo, hi) in zip(qs, state["idx"]):
        vlo, vhi = vals[pos[lo]], vals[pos[hi]]
        frac = h - np.floor(h)
        res = vlo + frac * (vhi - vlo)
        out[name(q)] = [np.int64(np.floor(res * 1e6 + 0.5))]
    return pd.DataFrame(out)


def interval_contains_join(
    left: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    val_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    left_cols: Sequence[str] | None = None,
    interval_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """KEYLESS interval-containment join: every (left, interval) pair
    with ``lo <= left.val <= hi`` (inclusive), no equi-key — the classic
    range join Ray Data has no native operator for.

    Scale shape: the value axis is cut into buckets of ``bucket_width``;
    each left row lands in exactly ONE bucket (val // width), each
    interval is replicated to every bucket its [lo, hi] span overlaps,
    and a single ``groupby(bucket)`` co-locates them.  Because a left
    row exists in only one bucket, each qualifying pair is emitted
    exactly once — interval replication cannot duplicate output.  The
    in-group match sorts the bucket's intervals by ``lo`` once and uses
    searchsorted to bound candidates before the hi-filter.

    Partitioning assumption (document per call site): replication factor
    is ~interval_span / bucket_width, and per-bucket work is
    O(L_b · R_b) worst case — pick ``bucket_width`` near the typical
    interval span so R_b stays small; skewed value clusters land in one
    bucket and should be salted upstream if a bucket outgrows a task.
    """
    lcols = list(left_cols) if left_cols else list(left.schema().names)
    rcols = list(interval_cols) if interval_cols else list(intervals.schema().names)
    lschema, rschema = left.schema(), intervals.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    width = float(bucket_width)
    if width <= 0:
        raise ValueError("bucket_width must be positive")

    def tag_left(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(val_col), pa.float64()).to_numpy(zero_copy_only=False)
        out = {c: batch.column(c) for c in lcols}
        out["__bucket"] = pa.array(np.floor_divide(v, width).astype(np.int64))
        out["__side"] = pa.array(np.zeros(len(batch), dtype=np.int8))
        for c in rcols:
            out[c] = pa.nulls(len(batch), rtypes[c])
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        lo = pc.cast(batch.column(lo_col), pa.float64()).to_numpy(zero_copy_only=False)
        hi = pc.cast(batch.column(hi_col), pa.float64()).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(lo, width).astype(np.int64)
        b1 = np.floor_divide(hi, width).astype(np.int64)
        reps = np.maximum(b1 - b0 + 1, 0)
        idx = np.repeat(np.arange(len(batch)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        buckets = b0[idx] + offs
        t = batch.select([c for c in rcols]).take(pa.array(idx))
        out = {c: pa.nulls(len(idx), ltypes[c]) for c in lcols}
        out["__bucket"] = pa.array(buckets)
        out["__side"] = pa.array(np.ones(len(idx), dtype=np.int8))
        for c in rcols:
            out[c] = t.column(c)
        return pa.table(out)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        intervals.map_batches(tag_right, batch_format="pyarrow")
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        lrows = df[df["__side"] == 0]
        rrows = df[df["__side"] == 1]
        if not len(lrows) or not len(rrows):
            return df.iloc[0:0][lcols + rcols]
        rrows = rrows.sort_values(lo_col, kind="stable")
        rlo = rrows[lo_col].to_numpy(dtype=np.float64)
        rhi = rrows[hi_col].to_numpy(dtype=np.float64)
        v = lrows[val_col].to_numpy(dtype=np.float64)
        end = np.searchsorted(rlo, v, side="right")  # intervals with lo <= v
        li = np.repeat(np.arange(len(v)), end)
        offs = np.arange(int(end.sum())) - np.repeat(np.cumsum(end) - end, end)
        ok = rhi[offs] >= v[li]
        li, ri = li[ok], offs[ok]
        out = lrows.iloc[li][lcols].reset_index(drop=True)
        for c in rcols:
            out[c] = rrows.iloc[ri][c].to_numpy()
        return out

    return unioned.groupby("__bucket").map_groups(match, batch_format="pandas")


def rolling_time_aggregate(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    ts_col: str,
    *,
    window_seconds: float,
    sum_cols: Sequence[tuple[str, str]] = (),
    count_col: str = "n_events",
    carry_cols: Sequence[str] = (),
) -> ray.data.Dataset:
    """Per-key trailing time-window aggregate: for every row, the count
    and sums over all of the key's rows with ``ts`` in
    ``[row.ts - window_seconds, row.ts]`` — SQL's ``RANGE BETWEEN
    INTERVAL x PRECEDING AND CURRENT ROW`` (peers with equal ``ts``
    included, boundary inclusive).  The event-rate / trailing-volume
    feature of a behavioral pipeline, expressed batch-first.

    ``sum_cols`` is (out_name, src_col) pairs; pass pre-scaled int64
    columns for engine-exact sums (prefix-sum differencing is exact in
    integers, order-fuzzy in floats).

    Scale contract: ONE groupby exchange on ``part_keys``; in-group
    work is a sort + two ``np.searchsorted`` + prefix-sum differencing
    — O(n log n) vectorized, no per-row Python.  Same partitioning
    assumption as ``sessionize``: one key's rows fit a worker (salt or
    time-split keys hotter than that upstream).
    """
    W = int(round(window_seconds * 1_000_000))
    sum_cols = list(sum_cols)
    out_cols = [*carry_cols, *part_keys, count_col, *[o for o, _ in sum_cols]]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="mergesort").copy()
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        left = np.searchsorted(ts, ts - W, side="left")
        right = np.searchsorted(ts, ts, side="right")
        df[count_col] = (right - left).astype(np.int64)
        for out, src in sum_cols:
            cs = np.concatenate(
                [[0], np.cumsum(df[src].to_numpy(dtype=np.int64))]
            )
            df[out] = cs[right] - cs[left]
        return df[out_cols]

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> ray.data.Dataset:
    """Diff two corpus snapshots keyed by ``key_cols``: one output row
    per key whose content changed, with ``change`` in
    {'added', 'removed', 'changed'} (identical rows are dropped).  The
    incremental-ingest primitive — "what moved between yesterday's crawl
    and today's" — assuming keys are unique within each snapshot.

    Scale contract: payloads NEVER shuffle.  Each side maps to one
    narrow row per input row — (key…, side-tagged presence counters and
    64-bit content hashes of ``compare_cols``) — so the single
    ``groupby`` exchange moves ~40 B/row regardless of document size;
    the grouped sum is Ray's native aggregate (no per-group Python) and
    classification is one vectorized map over the aggregate.  Content
    equality is blake2b-64 hash equality (collision odds ~2⁻⁶⁴ per
    pair, the same contract as tile dedup G5).
    """
    from ..functions.hashing import content_hash64

    key_cols = list(key_cols)
    compare_cols = list(compare_cols)

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if n == 0:
                cols = {k: batch.column(k) for k in key_cols}
                cols.update(
                    {
                        "old_n": pa.array([], pa.int64()),
                        "new_n": pa.array([], pa.int64()),
                        "old_h": pa.array([], pa.int64()),
                        "new_h": pa.array([], pa.int64()),
                    }
                )
                return pa.table(cols)
            parts = [
                pa.compute.cast(batch.column(c), pa.string()).to_pylist()
                for c in compare_cols
            ]
            h = np.fromiter(
                (
                    content_hash64("\x1f".join("" if v is None else v for v in row).encode())
                    for row in zip(*parts)
                ),
                dtype=np.int64,
                count=n,
            )
            one = np.ones(n, dtype=np.int64)
            zero = np.zeros(n, dtype=np.int64)
            cols = {k: batch.column(k) for k in key_cols}
            cols["old_n"] = pa.array(one if side == "old" else zero)
            cols["new_n"] = pa.array(zero if side == "old" else one)
            cols["old_h"] = pa.array(h if side == "old" else zero)
            cols["new_h"] = pa.array(zero if side == "old" else h)
            return pa.table(cols)

        return f

    tagged = old.map_batches(tag("old"), batch_format="pyarrow").union(
        new.map_batches(tag("new"), batch_format="pyarrow")
    )
    agg = tagged.groupby(key_cols).sum(["old_n", "new_n", "old_h", "new_h"])

    def classify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {k: batch.column(k) for k in key_cols}
            cols["change"] = pa.array([], pa.string())
            return pa.table(cols)
        o = np.asarray(batch.column("sum(old_n)"))
        n_ = np.asarray(batch.column("sum(new_n)"))
        oh = np.asarray(batch.column("sum(old_h)"))
        nh = np.asarray(batch.column("sum(new_h)"))
        change = np.where(
            o == 0, "added", np.where(n_ == 0, "removed", np.where(oh != nh, "changed", ""))
        )
        keep = change != ""
        cols = {k: batch.column(k).filter(pa.array(keep)) for k in key_cols}
        cols["change"] = pa.array(change[keep].astype(object), pa.string())
        return pa.table(cols)

    return agg.map_batches(classify, batch_format="pyarrow")


def funnel_stages(
    events: ray.data.Dataset,
    stages: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """Ordered-funnel analysis: for each user who performed
    ``stages[0]``, the earliest time of each successive stage at-or-
    after the previous stage's time (boundary-inclusive: an equal
    timestamp counts as "after").  Output: (user, stages_reached,
    t_1 … t_k nullable timestamps) — the conversion-funnel primitive.

    Scale contract: the read is filtered to the stage types (map-side
    pushdown drops every other event before the exchange), then ONE
    ``groupby(user)`` exchange; in-group work is a mergesort + one
    ``searchsorted`` per stage (stages are few and fixed) — no per-row
    Python.  Same per-key-fits-a-worker assumption as ``sessionize``.
    """
    stages = list(stages)
    stage_set = set(stages)
    t_cols = [f"t_{i + 1}" for i in range(len(stages))]

    stage_arr = pa.array(stages)
    filtered = events.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column(type_col), stage_arr)),
        batch_format="pyarrow",
    )

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="mergesort")
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        typ = df[type_col].to_numpy()
        out_ts: list = []
        prev = None
        for s in stages:
            mask = typ == s if prev is None else (typ == s) & (ts >= prev)
            cand = ts[mask]
            if len(cand) == 0:
                # once a stage is missed, later stages can't be reached
                out_ts.extend([None] * (len(stages) - len(out_ts)))
                break
            prev = cand[0]
            out_ts.append(prev)
        if out_ts[0] is None:  # user never did stage 1: no funnel row
            return pd.DataFrame(
                {user_col: pd.Series([], dtype=df[user_col].dtype),
                 "stages_reached": pd.Series([], dtype=np.int64),
                 **{c: pd.Series([], dtype="datetime64[us]") for c in t_cols}}
            )
        reached = sum(1 for t in out_ts if t is not None)
        row = {user_col: [df[user_col].iloc[0]], "stages_reached": [np.int64(reached)]}
        for c, t in zip(t_cols, out_ts):
            row[c] = pd.Series(
                [pd.NaT if t is None else np.datetime64(int(t), "us")],
                dtype="datetime64[us]",
            )
        return pd.DataFrame(row)

    return filtered.groupby(user_col).map_groups(funnel, batch_format="pandas")


def grouped_percentiles(
    ds: ray.data.Dataset,
    by: Sequence[str],
    col: str,
    qs: Sequence[float],
) -> ray.data.Dataset:
    """Exact per-group percentile_disc over a CONTINUOUS column — one
    output row per (group, q).  The complement of
    ``discrete_quantiles`` (count-partial merge, right when the value
    domain is bounded) and ``continuous_percentiles`` (global,
    iterative bracketing): here the domain is unbounded but the
    per-GROUP row count fits a worker, so one ``groupby`` exchange of
    narrow (key, value) rows + an in-group sort is both exact and
    fully distributed — no driver state at all.

    Rank convention: ``ceil(q·n)`` computed in float, deliberately
    mirroring DuckDB's arithmetic (see the note at
    ``continuous_percentiles``).
    """
    by = list(by)
    qs = [float(q) for q in qs]

    def pct(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].to_numpy())
        n = len(v)
        idxs = [max(int(np.ceil(q * n)), 1) - 1 for q in qs]
        out = {k: [df[k].iloc[0]] * len(qs) for k in by}
        out["q"] = qs
        out["value"] = v[idxs]
        return pd.DataFrame(out)

    return (
        ds.select_columns([*by, col])
        .groupby(by)
        .map_groups(pct, batch_format="pandas")
    )


def equi_depth_buckets(
    ds: ray.data.Dataset,
    col: str,
    *,
    num_buckets: int = 4,
    keep_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Equi-depth (quantile) bucketing of a continuous column: assign
    each row ``bucket = #{boundaries < value}`` ∈ [0, num_buckets-1]
    where the boundaries are the EXACT percentile_disc values at
    q = i/num_buckets — the standard feature-binning / stratification
    pass before sampling or skew-aware repartitioning.

    Unlike NTILE (which splits ties arbitrarily by row order), the
    value-threshold rule is a pure function of the value, so the
    assignment is deterministic and SQL-reproducible even with
    duplicate values (all duplicates of a boundary land in the same
    bucket, making bucket sizes approximate exactly when values repeat
    — documented, matches the oracle by construction).

    Scale contract: boundary discovery is ``continuous_percentiles``
    (bounded driver state, ~2 scans); assignment is one map-only pass
    comparing against the O(num_buckets) broadcast boundary vector —
    no shuffle anywhere.
    """
    qs = [i / num_buckets for i in range(1, num_buckets)]
    row = continuous_percentiles(ds, col, qs)
    bounds = np.asarray([float(row.iloc[0][c]) for c in row.columns], np.float64)
    cols = list(keep_cols) if keep_cols is not None else None

    def assign(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = (v[:, None] > bounds[None, :]).sum(axis=1).astype(np.int64)
        base = t.select(cols) if cols is not None else t
        return base.append_column("bucket", pa.array(b, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def skew_hybrid_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    hot_min_count: int = 10_000,
    partial_topk: int = 64,
    stats: dict | None = None,
) -> ray.data.Dataset:
    """Skew-aware inner join: hot probe keys join by BROADCAST, the
    cold remainder by partitioned shuffle — the standard fix for the
    straggler a plain hash join develops when one key owns a large
    fraction of the probe side (the relational analog of the salted
    dense-zoom tile shuffle, SURVEY.md §2; reference's single physical
    join is /root/reference/src/mbtiles.rs:27-29).

    Hot-key detection is a bounded two-level pass: each probe block
    emits its ``partial_topk`` most frequent keys with counts (a key
    owning ≥ hot_min_count of N rows must appear in the top-k of at
    least one of the ~N/block blocks it dominates); the driver sums the
    tiny partials and declares keys with summed count ≥ ``hot_min_count``
    hot.  Driver state is O(partial_topk × blocks) — bounded, never
    proportional to distinct keys.  A partial top-k can only UNDER-count
    a key, so a borderline key may be classified cold — that changes
    the execution plan, never the join result.

    Plan: build rows for hot keys are collected (assumed dimension-like:
    few rows per key — documented assumption, same as
    ``broadcast_hash_join``'s) and broadcast once via ``ray.put``; probe
    rows split by a broadcast membership filter; the cold sides flow
    through Ray's partitioned hash join, which the hot keys — the rows
    that would have made one partition a straggler — never enter.
    Output schema is pinned identical across both branches.

    ``stats`` (optional dict) receives {"hot_keys": int, "hot_rows":
    int} for tests and telemetry.
    """
    rkey = right_on or on
    # capture the right schema from the LAZY plan: a dataset that
    # materializes to zero blocks (e.g. limit(0)) loses its schema, and
    # both Ray's hash join and the hot-branch concat crash on a
    # schema-less side
    rsch = _arrow_schema_of(right)
    # the detection pass re-executes `left` and both split branches
    # re-execute each input — pin both lineages once so upstream work
    # (reads, transforms) runs a single time
    left = left.materialize()
    right = right.materialize()
    if right.count() == 0:
        # empty build side ⇒ empty inner join; Ray's hash join (and the
        # hot-branch concat) crash on schema-less/zero-column empties,
        # so emit the typed empty result directly
        if rsch is None:
            raise ValueError(
                "skew_hybrid_join: right side is empty and has no "
                "recoverable schema"
            )
        lsch = _arrow_schema_of(left)
        fields = list(lsch) + [
            rsch.field(n) for n in rsch.names if n != rkey and n not in lsch.names
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())

    def block_topk(t: pa.Table) -> pa.Table:
        s = t.column(on).to_pandas().value_counts()
        s = s.iloc[:partial_topk]
        # pin the key type even for empty blocks — a null-typed empty
        # partial would poison the cross-block schema unification
        return pa.table(
            {
                on: pa.array(s.index.to_numpy(), type=t.schema.field(on).type),
                "__cnt": pa.array(s.to_numpy(), pa.int64()),
            }
        )

    partials = left.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    totals = partials.groupby(on)["__cnt"].sum()
    hot = totals[totals >= hot_min_count]
    hot_keys = pa.array(hot.index.to_numpy())
    if stats is not None:
        stats["hot_keys"] = len(hot)
        stats["hot_rows"] = int(hot.sum())

    join_type = "inner"
    if len(hot) == 0:
        return shuffle_hash_join(left, right, on=on, right_on=rkey, join_type=join_type)

    hot_ref = ray.put(hot_keys)

    def split(keep_hot: bool, col: str):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(col), value_set=ray.get(hot_ref))
            return batch.filter(mask if keep_hot else pc.invert(mask))

        return f

    hot_blocks = ray.get(
        list(
            right.map_batches(
                split(True, rkey), batch_format="pyarrow"
            ).to_arrow_refs()
        )
    )
    # Ray emits zero-COLUMN blocks for empty map outputs — they would
    # poison the concat (and the build side would lose the key column)
    hot_blocks = [b for b in hot_blocks if rkey in b.schema.names]
    if hot_blocks:
        right_hot_tbl = pa.concat_tables(hot_blocks)
    elif rsch is not None:
        right_hot_tbl = rsch.empty_table()
    else:
        raise ValueError(
            "skew_hybrid_join: right side produced no schema-ful blocks "
            "and has no recoverable schema"
        )
    broadcast = broadcast_hash_join(
        left.map_batches(split(True, on), batch_format="pyarrow"),
        right_hot_tbl,
        left_on=on,
        right_on=rkey,
        how="inner",
    )
    cold = shuffle_hash_join(
        left.map_batches(split(False, on), batch_format="pyarrow"),
        right.map_batches(split(False, rkey), batch_format="pyarrow"),
        on=on,
        right_on=rkey,
        join_type=join_type,
    )
    # a right side whose blocks are all empty reports schema None after
    # materialize — use the plan-captured arrow schema (rsch), falling
    # back to the collected hot build table
    right_names = rsch.names if rsch is not None else right_hot_tbl.schema.names
    out_cols = list(
        dict.fromkeys(
            list(left.schema().names) + [c for c in right_names if c != rkey]
        )
    )
    return broadcast.select_columns(out_cols).union(cold.select_columns(out_cols))


def windowed_rank(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    *,
    order_col: str,
    method: str = "dense",
    descending: bool = True,
    rank_col: str = "rnk",
    keep_rank_le: int | None = None,
) -> ray.data.Dataset:
    """Full windowed rank per group — ``dense_rank()`` / ``rank()`` over
    PARTITION BY part_keys ORDER BY order_col (the general window-rank
    operator; ``grouped_top_n`` covers only the row_number-top-N case).

    Unlike row_number, dense/rank are pure functions of the VALUE, so
    no tiebreak column is needed for determinism — equal values get
    equal ranks whatever order the shuffle delivers them in.

    One groupby exchange; ranking inside each group is a vectorized
    pandas ``Series.rank``.  With ``keep_rank_le`` a map-side partial
    prune bounds the exchange: a row can only rank ≤ K within its group
    if its value is among the K largest DISTINCT values its block saw
    for that group, so each block forwards at most K distinct-value
    classes per (block, group) — the dense-rank analog of
    ``grouped_top_n``'s head(n) prune.
    """
    part_keys = list(part_keys)
    pd_method = {"dense": "dense", "rank": "min"}[method]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if keep_rank_le is None or not len(df):
            return df
        r = df.groupby(part_keys, sort=False)[order_col].rank(
            method="dense", ascending=not descending
        )
        return df[r <= keep_rank_le]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.copy()
        df[rank_col] = (
            df.groupby(part_keys, sort=False)[order_col]
            .rank(method=pd_method, ascending=not descending)
            .astype(np.int64)
        )
        if keep_rank_le is not None:
            df = df[df[rank_col] <= keep_rank_le]
        return df

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(part_keys)
        .map_groups(final, batch_format="pandas")
    )


def upsert_latest(
    base: ray.data.Dataset,
    changes: ray.data.Dataset,
    *,
    key_col: str,
    version_col: str,
    deleted_col: str | None = None,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """CDC merge (Delta/Iceberg MERGE semantics, latest-wins): apply a
    change stream onto a base snapshot — per key keep the row with the
    highest ``version_col`` (changes beat base on equal version), and
    drop keys whose winning row carries ``deleted_col`` = true (the
    tombstone).  The table-maintenance primitive every periodically
    re-crawled 100-TB corpus needs.

    Topology mirrors ``exact_dedup``: rows of both inputs are tagged
    with a source priority and co-located by hash(key) into COARSE
    shards (equal keys always land together), and each shard elects
    winners in one vectorized sort + drop_duplicates pass — one
    exchange of the union, zero driver state, no per-key Python call.
    """

    def tag(src: int):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pandas()
            h = pd.util.hash_array(keys.to_numpy()).astype(np.int64)
            return batch.append_column(
                "__src", pa.array(np.full(len(batch), src, np.int64))
            ).append_column("__ushard", pa.array(h % num_shards))

        return f

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(
            [key_col, version_col, "__src"],
            ascending=[True, False, False],
            kind="mergesort",
        ).drop_duplicates(key_col, keep="first")
        if deleted_col is not None:
            # null tombstone flag means "not deleted" — CDC streams often
            # only set the flag on deletes (NaN is truthy under astype(bool))
            df = df[~df[deleted_col].fillna(False).astype(bool)]
            df = df.drop(columns=[deleted_col])
        return df.drop(columns=["__src", "__ushard"])

    both = base.map_batches(tag(0), batch_format="pyarrow").union(
        changes.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("__ushard").map_groups(elect, batch_format="pandas")


def grouped_concat(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    *,
    value_col: str,
    order_cols: Sequence[str],
    sep: str = ",",
    out_col: str = "concat",
) -> ray.data.Dataset:
    """Ordered string aggregation per group (``string_agg(value ORDER
    BY ...)``) — the path/sequence materializer behind clickstream
    mining, prompt assembly, and per-key event journals.

    ``order_cols`` must totally order each group (include a unique id)
    or the concatenation is nondeterministic.  One groupby exchange;
    inside a group the join is ONE vectorized ``str.cat`` per group via
    pandas ``groupby.agg`` — but groups arrive one ``map_groups`` call
    each, so the per-group Python cost is a single C-level join.  Group
    size is the scale bound (same contract as ``sessionize``): a key's
    full event history must fit a worker heap — cap upstream when keys
    are unbounded journals.
    """
    part_keys = list(part_keys)
    order_cols = list(order_cols)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(order_cols, kind="mergesort")
        head = df.iloc[:1][part_keys].reset_index(drop=True)
        head[out_col] = sep.join(df[value_col].astype(str).tolist())
        return head

    return ds.groupby(part_keys).map_groups(f, batch_format="pandas")


def unpivot(
    ds: ray.data.Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    name_col: str = "measure",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Wide → long reshape (melt / UNPIVOT): one output row per (input
    row, value column), carrying ``id_cols`` plus (name, value) — the
    inverse of ``pivot_counts`` and the standard feed into per-measure
    grouped aggregation.  Values are cast to float64 (the usual
    measures-melt contract; heterogeneous types must be pre-cast).

    Map-ONLY and allocation-tight: one numpy column stack + repeat per
    block, no shuffle, k× row multiplication happens inside the block
    so the streaming executor's backpressure sees the true output size.
    """
    id_cols, value_cols = list(id_cols), list(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        k, nr = len(value_cols), len(t)
        vals = np.concatenate(
            [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in value_cols]
        )
        names = np.repeat(np.array(value_cols, dtype=object), nr)
        out = {c: pa.concat_arrays([t.column(c).combine_chunks()] * k)
               for c in id_cols}
        out[name_col] = pa.array(names, pa.string())
        out[value_col] = pa.array(vals, pa.float64())
        return pa.table(out)

    return ds.select_columns(
        list(dict.fromkeys([*id_cols, *value_cols]))
    ).map_batches(melt, batch_format="pyarrow")


def cumsum_within_groups(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "running",
) -> ray.data.Dataset:
    """Running total per group (``sum(v) OVER (PARTITION BY k ORDER BY
    o ROWS UNBOUNDED PRECEDING)``) — the balance/odometer window.  Same
    topology as ``lag_within_groups``: one groupby exchange, in-group
    mergesort + vectorized cumsum.  ``order_cols`` must totally order
    the group for a deterministic result.  Integer value columns
    accumulate exactly; for floats, pre-quantize if the consumer needs
    cross-engine bit equality (sequential float summation is
    order-defined but not guaranteed across engines).
    """
    order_cols = list(order_cols)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(order_cols, kind="mergesort").copy()
        df[out_col] = df[value_col].cumsum()
        return df

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def latest_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: Sequence[str],
    *,
    descending: bool = True,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Whole-row argmax per key — "the latest event per user", "the
    current state per entity": keep the single row with the greatest
    (or least) ``order_cols`` tuple per ``key_col``.  ``order_cols``
    must totally order rows within a key (end with a unique id).

    Two-stage, exact, and skew-proof: each block keeps ITS winner per
    key (vectorized sort + drop_duplicates — a block can only improve
    on another block's winner, never combine with it, so per-block
    pruning is lossless); survivors co-locate by hash(key) into COARSE
    shards and one more identical pass elects the global winner.  The
    exchange moves ≤ one row per (block, key), never the full history.
    """
    order_cols = list(order_cols)
    asc = [not descending] * len(order_cols)

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values([key_col, *order_cols],
                            ascending=[True, *asc], kind="mergesort")
        return df.drop_duplicates(key_col, keep="first")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = elect(df).copy()
        h = pd.util.hash_array(out[key_col].to_numpy()).astype(np.int64)
        out["__lshard"] = h % num_shards
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = elect(df)
        return out.drop(columns="__lshard") if len(out) else out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__lshard")
        .map_groups(final, batch_format="pandas")
    )


def dataset_intersect(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: Sequence[str],
    *,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Distinct-row INTERSECT on ``keys``: key tuples present on BOTH
    sides, each once.  Narrow co-shuffle: both sides reduce to per-block
    distinct key rows tagged with a side bit, co-locate by hash into
    coarse shards, and a vectorized per-shard groupby keeps tuples whose
    side set is {0, 1}.  Only key columns ever move."""
    return _set_op(left, right, list(keys), num_shards=num_shards, op="intersect")


def dataset_except(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: Sequence[str],
    *,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Distinct-row EXCEPT on ``keys``: key tuples of ``left`` absent
    from ``right``, each once.  Same narrow co-shuffle as
    ``dataset_intersect``."""
    return _set_op(left, right, list(keys), num_shards=num_shards, op="except")


def _set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: list[str],
    *,
    num_shards: int,
    op: str,
) -> ray.data.Dataset:
    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keys].drop_duplicates().copy()
            h = pd.util.hash_pandas_object(out[keys], index=False).astype(np.int64)
            out["__side"] = np.int64(side)
            out["__sshard"] = h.to_numpy() % num_shards
            return out

        return f

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        g = df.groupby(keys, sort=False)["__side"]
        mn, mx = g.transform("min"), g.transform("max")
        if op == "intersect":
            keep = (mn == 0) & (mx == 1)
        else:  # except: left-only tuples
            keep = (mn == 0) & (mx == 0)
        out = df[keep & (df["__side"] == 0)]
        return out.drop(columns=["__side", "__sshard"]).drop_duplicates()

    both = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )
    return both.groupby("__sshard").map_groups(resolve, batch_format="pandas")


def mode_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Exact per-group mode: the most frequent ``value_col`` per
    ``group_col`` with its count (ties → smallest value) — the label
    summary / dominant-category profile (``heavy_hitters`` is its
    approximate GLOBAL cousin).

    One exchange: blocks emit their distinct (group, value, cnt)
    partials (vectorized two-level value_counts), co-located by
    hash(group) into coarse shards; each shard finishes all its groups
    with one vectorized sum + sort + drop_duplicates pass.  Rows moved
    = per-block distinct pairs — the information-theoretic minimum for
    an exact answer.  Output: (group_col, mode_value, cnt).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        h = pd.util.hash_array(out[group_col].to_numpy()).astype(np.int64)
        return out.assign(__mshard=h % num_shards)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        tot = (
            df.groupby([group_col, value_col], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        tot = tot.sort_values(
            [group_col, "cnt", value_col], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(group_col, keep="first")
        return tot.rename(columns={value_col: "mode_value"})

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__mshard")
        .map_groups(final, batch_format="pandas")
    )


def scd2_history(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    *,
    order_tiebreak: Sequence[str] = (),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 history from a change stream:
    each (key, version) row gets a validity interval — ``valid_from`` =
    its own timestamp, ``valid_to`` = the key's NEXT change (null for
    the open, current version) — turning an upsert log into the
    point-in-time dimension an as-of join consumes.

    Same topology as ``lag_within_groups`` (one groupby exchange,
    in-group mergesort + vectorized shift); per-key history must fit a
    worker heap — the standard dimension-table contract.
    """
    order_cols = [ts_col, *order_tiebreak]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(order_cols, kind="mergesort").copy()
        df[from_col] = df[ts_col]
        df[to_col] = df[ts_col].shift(-1)
        df[current_col] = df[to_col].isna()
        return df

    return ds.groupby(key_col).map_groups(f, batch_format="pandas")


def rank_fractions_in_groups(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    *,
    order_col: str,
    descending: bool = False,
    pr_col: str = "pct_rank",
    cd_col: str = "cume_dist",
    quantize: int = 1_000_000,
) -> ray.data.Dataset:
    """``percent_rank()`` and ``cume_dist()`` per group — the relative-
    standing windows feeding score normalization and percentile
    cutoffs.  percent_rank = (rank_min − 1)/(n − 1) (0 for a singleton
    group, the SQL convention); cume_dist = rank_max/n.  Both are pure
    functions of the VALUE, deterministic under ties without a
    tiebreak.

    One groupby exchange; in-group vectorized pandas ranks.  Output
    fractions are integer-quantized (``floor(x·quantize + 0.5)``,
    ``*_e6`` columns) so the driver's value-hash compare never rides a
    float division's last ulp.
    """
    part_keys = list(part_keys)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.copy()
        g = df.groupby(part_keys, sort=False)[order_col]
        rmin = g.rank(method="min", ascending=not descending)
        rmax = g.rank(method="max", ascending=not descending)
        n = g.transform("size").astype(np.float64)
        pr = np.where(n > 1, (rmin - 1.0) / (n - 1.0), 0.0)
        cd = rmax / n
        df[f"{pr_col}_e6"] = np.floor(pr * quantize + 0.5).astype(np.int64)
        df[f"{cd_col}_e6"] = np.floor(cd * quantize + 0.5).astype(np.int64)
        return df

    return ds.groupby(part_keys).map_groups(f, batch_format="pandas")


def fill_forward_in_groups(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """LOCF imputation (last observation carried forward) per group:
    nulls in ``value_col`` take the most recent non-null value in
    ``order_cols`` order; leading nulls stay null — the sensor-gap /
    sparse-attribute filler (SQL: ``last_value(x IGNORE NULLS) OVER
    (... ROWS UNBOUNDED PRECEDING)``).

    One groupby exchange, in-group mergesort + vectorized pandas
    ``ffill`` — no Python per row.
    """
    order_cols = list(order_cols)
    out = out_col or value_col

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(order_cols, kind="mergesort").copy()
        df[out] = df[value_col].ffill()
        return df

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def grouping_sets_aggregate(
    ds: ray.data.Dataset,
    sets: Sequence[Sequence[str]],
    aggs: list[tuple[str, str, str]],
    *,
    null_label: str | None = None,
) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS: one aggregate per key-set, unioned with
    the missing key columns null-filled (or ``null_label`` for string
    keys — use it when the consumer can't hash mixed null/value
    columns).  ``lineitem_rollup`` is the prefix-chain special case;
    this is the general shape (e.g. [[a,b],[a],[b],[]]).

    Each set reuses ``grouped_aggregate``'s map-side partial topology —
    the input is scanned once PER SET (sets are few; a single-scan
    multi-set partial is possible but couples every set's exchange to
    the widest key — documented trade).
    """
    all_keys: list[str] = []
    for kset in sets:
        for k in kset:
            if k not in all_keys:
                all_keys.append(k)

    # with null_label=None the missing-key fill must carry each key's
    # REAL arrow type (pa.nulls defaults to null-type, and unioned parts
    # would then disagree on column types)
    key_types: dict[str, pa.DataType] = {}
    if null_label is None:
        sch = _arrow_schema_of(ds)
        key_types = {k: sch.field(k).type for k in all_keys}

    parts = []
    for kset in sets:
        kset = list(kset)
        if kset:
            agg = grouped_aggregate(ds, kset, aggs)
        else:
            # global set: constant key trick, dropped after
            def add_const(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "__g0", pa.array(np.zeros(len(b), np.int64))
                )

            agg = grouped_aggregate(
                ds.map_batches(add_const, batch_format="pyarrow"), ["__g0"], aggs
            ).drop_columns(["__g0"])

        missing = [k for k in all_keys if k not in kset]

        def fill(batch: pa.Table, _missing=tuple(missing)) -> pa.Table:
            for m in _missing:
                if null_label is not None:
                    col = pa.array([null_label] * len(batch), pa.string())
                else:
                    col = pa.nulls(len(batch), type=key_types[m])
                batch = batch.append_column(m, col)
            order = all_keys + [a[0] for a in aggs]
            return batch.select(order)

        parts.append(agg.map_batches(fill, batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def ntile_in_groups(
    ds: ray.data.Dataset,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    n_tiles: int,
    *,
    out_col: str = "tile",
) -> ray.data.Dataset:
    """Deterministic NTILE: rows of each group, in ``order_cols`` order
    (MUST be total — end with a unique id, or tile assignment of tied
    rows is arbitrary), split into ``n_tiles`` buckets with the SQL
    size rule (first ``n % n_tiles`` buckets get the extra row).
    ``equi_depth_buckets`` is the value-pure alternative when a total
    order isn't available.

    One groupby exchange + in-group vectorized arithmetic.
    """
    order_cols = list(order_cols)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        df = df.sort_values(order_cols, kind="mergesort").copy()
        n = len(df)
        base, extra = divmod(n, n_tiles)
        sizes = np.full(min(n_tiles, n), base, np.int64)
        sizes[:extra] += 1
        df[out_col] = np.repeat(
            np.arange(1, len(sizes) + 1, dtype=np.int64), sizes[: len(sizes)]
        )
        return df

    return ds.groupby(list(part_keys)).map_groups(f, batch_format="pandas")


def moment_profile(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    col: str,
    *,
    quantum: float = 1e4,
) -> ray.data.Dataset:
    """Grouped mean/variance/skewness/excess-kurtosis via distributed
    power sums: a map-side stage appends x², x³, x⁴ columns, the shared
    ``grouped_aggregate`` partial-combine topology sums them per group
    (one tiny exchange, O(groups) rows), and central moments are
    finalized closed-form on the merged sums.

    The cross-engine contract is the FORMULA (population moments from
    Σxᵏ, quantized with the repo's floor(x·q + 0.5) convention), not a
    library's bias-correction choice — the SQL mirror computes the same
    closed form from sum()/count().  Adequate for bounded, well-scaled
    columns (quantities, prices); a numerically-hardened variant would
    merge Welford/Chan partials instead of raw power sums.
    """
    keys = list(keys)

    def powers(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                **{k: b.column(k) for k in keys},
                col: pa.array(x),
                "__x2": pa.array(x * x),
                "__x3": pa.array(x * x * x),
                "__x4": pa.array(x * x * x * x),
            }
        )

    agg = grouped_aggregate(
        ds.map_batches(powers, batch_format="pyarrow"),
        keys,
        [
            ("n", col, "count"),
            ("s1", col, "sum"),
            ("s2", "__x2", "sum"),
            ("s3", "__x3", "sum"),
            ("s4", "__x4", "sum"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = b.column("s1").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        s3 = b.column("s3").to_numpy(zero_copy_only=False)
        s4 = b.column("s4").to_numpy(zero_copy_only=False)
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean**3
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean**4
        )
        skew = m3 / m2**1.5
        kurt = m4 / (m2 * m2) - 3.0

        def q(v: np.ndarray) -> pa.Array:
            return pa.array(np.floor(v * quantum + 0.5).astype(np.int64))

        out = {k: b.column(k) for k in keys}
        out["n"] = b.column("n")
        out["mean_e4"] = q(mean)
        out["var_e4"] = q(m2)
        out["skew_e4"] = q(skew)
        out["kurt_e4"] = q(kurt)
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


def global_row_number(
    ds: ray.data.Dataset,
    order_cols: Sequence[str],
    *,
    descending: "bool | list[bool]" = False,
    out_col: str = "rn",
) -> ray.data.Dataset:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY ...)`` (1-based).

    The zipWithIndex shape: Ray's sample-partition-merge sort
    range-partitions the rows in total order; per-block row counts come
    from block METADATA (O(blocks) ints on the driver, no block is
    fetched) and prefix-sum into block offsets; a per-block remote task
    appends ``offset + local_arange``.  ``order_cols`` must be a total
    order (end with a unique id) for a deterministic assignment.

    This is one of the few places raw ``@ray.remote`` tasks are the
    right tool: the Dataset API has no ordered-block-index hook, and
    the tasks here are trivially parallel per block.
    """
    sorted_ds = ds.sort(list(order_cols), descending=descending).materialize()

    refs: list = []
    counts: list[int] = []
    unknown: list[int] = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows if meta.num_rows is not None else -1)
            if meta.num_rows is None:
                unknown.append(len(refs) - 1)

    if unknown:  # metadata miss: count those blocks remotely

        @ray.remote
        def _count(t) -> int:
            return len(t)

        got = ray.get([_count.remote(refs[i]) for i in unknown])
        for i, c in zip(unknown, got):
            counts[i] = c

    offs = np.zeros(len(counts), np.int64)
    if len(counts) > 1:
        offs[1:] = np.cumsum(counts[:-1])

    @ray.remote
    def _assign(t, off: int):
        t = pa.Table.from_pandas(t, preserve_index=False) if not isinstance(t, pa.Table) else t
        return t.append_column(
            out_col, pa.array(off + 1 + np.arange(t.num_rows, dtype=np.int64))
        )

    return ray.data.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offs)]
    )


def grouped_linear_regression(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    quantum: float = 1e4,
) -> ray.data.Dataset:
    """Per-group simple linear regression (y = slope·x + intercept, plus
    r²) from distributed cross-moment sums: a map-side stage appends
    x², xy, y² columns, the shared ``grouped_aggregate`` partial-combine
    topology sums them (one O(groups) exchange), and the normal-equation
    closed form finalizes on the merged sums.

    Like ``moment_profile``, the cross-engine contract is the FORMULA
    (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n,
    r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)), quantized with
    floor(x·q + 0.5)), not a library's streaming-covariance algorithm —
    the SQL mirror computes the same closed form from sum()/count().
    Degenerate groups (zero x or y variance) emit NULL slope/r².
    """
    keys = list(keys)

    def cross(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                **{k: b.column(k) for k in keys},
                "__x": pa.array(x),
                "__y": pa.array(y),
                "__xx": pa.array(x * x),
                "__xy": pa.array(x * y),
                "__yy": pa.array(y * y),
            }
        )

    agg = grouped_aggregate(
        ds.map_batches(cross, batch_format="pyarrow"),
        keys,
        [
            ("n", "__x", "count"),
            ("sx", "__x", "sum"),
            ("sy", "__y", "sum"),
            ("sxx", "__xx", "sum"),
            ("sxy", "__xy", "sum"),
            ("syy", "__yy", "sum"),
        ],
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        syy = b.column("syy").to_numpy(zero_copy_only=False)
        cov_n = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = cov_n / var_x
            intercept = (sy - slope * sx) / n
            r2 = (cov_n * cov_n) / (var_x * var_y)
        ok = (var_x > 0.0) & (var_y > 0.0)

        def q(v: np.ndarray) -> pa.Array:
            out = np.where(ok, np.floor(v * quantum + 0.5), 0.0)
            return pa.array(out.astype(np.int64), pa.int64(), mask=~ok)

        return pa.table(
            {
                **{k: b.column(k) for k in keys},
                "n": pa.array(n.astype(np.int64)),
                "slope_e4": q(slope),
                "intercept_e4": q(intercept),
                "r2_e4": q(r2),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def weighted_sample_without_replacement(
    ds: ray.data.Dataset,
    *,
    k: int,
    id_col: str,
    weight_col: str,
    seed: int = 1234,
) -> pa.Table:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis exponential-jitter keys): each row gets
    key = -ln(u)/w with u a hash-derived uniform in (0,1) keyed on the
    row id, and the k SMALLEST keys win — exactly the distributed
    top-k shape (per-block argpartition partials, k x blocks driver
    merge), so selection needs no global sort and is reproducible
    across runs, block layouts, and engines (the SQL mirror computes
    the identical key).

    The hash → uniform path is exact cross-engine ((h mod 2^53 + 0.5)
    / 2^53 — all power-of-two float ops); ln() may differ by an ulp
    between libms, which can only matter on measure-zero key ties.
    Weights must be strictly positive.
    """
    from ..raster.synthetic import _mix

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = _mix(ids.astype(np.uint64), np.zeros(len(ids), np.uint64), seed)
        u = ((h % np.uint64(1 << 53)).astype(np.float64) + 0.5) / float(1 << 53)
        key = -np.log(u) / w
        return pa.table(
            {
                id_col: b.column(id_col),
                weight_col: b.column(weight_col),
                "__key": pa.array(key, pa.float64()),
            }
        )

    out = top_k(
        ds.map_batches(keyed, batch_format="pyarrow"),
        k,
        "__key",
        descending=False,
    )
    return out.select([id_col, weight_col])


def grouped_peak_concurrency(
    ds: ray.data.Dataset,
    start_col: str,
    end_col: str,
    keys: Sequence[str],
    *,
    out_col: str = "peak",
) -> ray.data.Dataset:
    """Per-group PEAK interval concurrency (sweep-line max overlap):
    for each key group, the maximum number of [start, end) intervals
    alive at any instant.  Half-open semantics: an interval ending
    exactly when another starts does NOT overlap it.

    The distributed segmented scan: intervals explode to ±1 boundary
    rows, ONE range-partition sort on (keys, t, d) puts each group's
    boundaries in sweep order with ends (-1) before starts (+1) at
    ties, then every sorted block reduces to per-group partials
    (delta total + max running prefix within the block) — a per-block
    remote task over block refs, the same zipWithIndex shape as
    ``global_row_number``.  The driver folds the O(blocks x
    groups-per-block) narrow partials in block order (each group spans
    contiguous blocks, so the fold is O(blocks + groups)); per-row data
    never returns to the driver.
    """
    boundary_keys = list(keys)

    def boundaries(b: pa.Table) -> pa.Table:
        n = b.num_rows
        starts = b.select(boundary_keys).append_column(
            "t", b.column(start_col)
        ).append_column("d", pa.array(np.ones(n, np.int8)))
        ends = b.select(boundary_keys).append_column(
            "t", b.column(end_col)
        ).append_column("d", pa.array(-np.ones(n, np.int8)))
        return pa.concat_tables([starts, ends]).combine_chunks()

    sorted_ds = (
        ds.map_batches(boundaries, batch_format="pyarrow")
        .sort(boundary_keys + ["t", "d"])
        .materialize()
    )

    refs: list = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)

    @ray.remote
    def _partials(t):
        t = pa.Table.from_pandas(t, preserve_index=False) if not isinstance(t, pa.Table) else t
        if t.num_rows == 0:
            return []
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        kcols = [
            t.column(k).to_numpy(zero_copy_only=False) for k in boundary_keys
        ]
        # segment boundaries within the sorted block
        change = np.zeros(len(d), bool)
        for kc in kcols:
            change[1:] |= kc[1:] != kc[:-1]
        seg_id = np.cumsum(change)
        c = np.cumsum(d)
        # per segment: total delta and max prefix RELATIVE to segment start
        out = []
        starts = np.flatnonzero(np.concatenate([[True], change[1:]]))
        ends = np.concatenate([starts[1:], [len(d)]])
        for s, e in zip(starts.tolist(), ends.tolist()):
            base = c[s - 1] if s > 0 else 0
            seg = c[s:e] - base
            out.append(
                (tuple(kc[s] for kc in kcols), int(seg[-1]), int(seg.max()))
            )
        return out

    parts = ray.get([_partials.remote(r) for r in refs])

    carry: dict = {}
    best: dict = {}
    for block in parts:  # block order == global sort order
        for key, total, maxpref in block:
            base = carry.get(key, 0)
            cand = base + maxpref
            if cand > best.get(key, -(1 << 62)):
                best[key] = cand
            carry[key] = base + total
    karrs = list(zip(*best.keys())) if best else [[] for _ in boundary_keys]
    out = {k: pa.array(list(v)) for k, v in zip(boundary_keys, karrs)}
    out[out_col] = pa.array([int(v) for v in best.values()], pa.int64())
    return ray.data.from_arrow(pa.table(out))


def winsorized_grouped_stats(
    ds: ray.data.Dataset,
    by: Sequence[str],
    col: str,
    *,
    lo_q: float = 0.1,
    hi_q: float = 0.9,
) -> ray.data.Dataset:
    """Robust per-group statistics: exact percentile_disc bounds at
    ``lo_q``/``hi_q``, then the TRIMMED mean (rows outside the bounds
    dropped) and the WINSORIZED mean (rows clamped to the bounds) —
    the outlier-resistant aggregates batch analytics reach for when a
    plain mean is skew-dominated.

    Two passes, both distributed: (1) per-group bounds via one narrow
    (key, value) groupby + in-group sort (same rank convention as
    ``grouped_percentiles``: ceil(q·n), DuckDB's quantile_disc); the
    bounds table is one row per group and is broadcast via ``ray.put``;
    (2) a map-side partial pass computes per-batch per-group
    (clamped/filtered) sums and counts, so the second exchange moves
    only ~5 numbers per (batch, group).  Values never shuffle twice.
    """
    by = list(by)

    bounds = (
        grouped_percentiles(ds, by, col, [float(lo_q), float(hi_q)])
        .to_pandas()
        .pivot_table(index=by, columns="q", values="value")
    )
    lo_map = {k: v for k, v in zip(bounds.index, bounds[float(lo_q)])}
    hi_map = {k: v for k, v in zip(bounds.index, bounds[float(hi_q)])}
    bref = ray.put((lo_map, hi_map))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = ray.get(bref)
        key = df[by[0]] if len(by) == 1 else pd.MultiIndex.from_frame(df[by])
        lo = key.map(lo_m).to_numpy(dtype=np.float64)
        hi = key.map(hi_m).to_numpy(dtype=np.float64)
        v = df[col].to_numpy(dtype=np.float64)
        inside = (v >= lo) & (v <= hi)
        g = pd.DataFrame(
            {
                **{k: df[k] for k in by},
                "t_sum": np.where(inside, v, 0.0),
                "t_n": inside.astype(np.int64),
                "w_sum": np.clip(v, lo, hi),
                "n": np.ones(len(df), dtype=np.int64),
            }
        )
        return g.groupby(by, as_index=False).sum()

    agg = (
        ds.select_columns([*by, col])
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .sum(["t_sum", "t_n", "w_sum", "n"])
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = ray.get(bref)
        key = df[by[0]] if len(by) == 1 else pd.MultiIndex.from_frame(df[by])
        out = df[by].copy()
        out["lo"] = key.map(lo_m).to_numpy(dtype=np.float64)
        out["hi"] = key.map(hi_m).to_numpy(dtype=np.float64)
        out["trimmed_mean"] = df["sum(t_sum)"] / df["sum(t_n)"].replace(0, np.nan)
        out["winsor_mean"] = df["sum(w_sum)"] / df["sum(n)"]
        out["n"] = df["sum(n)"].astype(np.int64)
        out["n_trimmed"] = (df["sum(n)"] - df["sum(t_n)"]).astype(np.int64)
        return out

    return agg.map_batches(finalize, batch_format="pandas")


def interval_overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_cols: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
) -> ray.data.Dataset:
    """Interval × interval OVERLAP join: one output row per (left,
    right) pair with equal ``key_cols`` whose CLOSED intervals
    intersect (``ls <= re AND rs <= le``).  The two-sided sibling of
    ``range_join`` (point-in-window) and ``interval_contains_join``
    (value-in-interval): both inputs are interval sets — session ×
    campaign overlap, downtime × deploy windows, gene ranges.

    Plan: 1-D PBSM, the same filter-and-refine shape as the spatial box
    join.  Each interval replicates to every ``bucket_width`` bucket it
    touches (replication ≈ 1 + length/width — pick width near the
    median interval length); ONE groupby on (key…, bucket) co-locates
    candidates; in-group a vectorized pandas merge applies the exact
    predicate.  A pair spanning several buckets would be reported once
    per shared bucket, so each pair reports only in its canonical
    bucket — the one containing ``max(ls, rs)`` — the standard PBSM
    duplicate-elimination rule (no post-hoc distinct pass needed).

    Output: key cols + ``left_cols`` + ``right_cols`` (caller keeps
    names disjoint).  Intervals are int64 (e.g. epoch micros).
    """
    key_cols = list(key_cols)
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    w = int(bucket_width)

    # the union pads each side with the OTHER side's payload columns —
    # typed nulls from the real schemas, so the unioned parts agree
    lsch = _arrow_schema_of(left)
    rsch = _arrow_schema_of(right)
    pad_types = {c: lsch.field(c).type for c in left_cols}
    pad_types.update({c: rsch.field(c).type for c in right_cols})

    def replicate(start_col: str, end_col: str, cols: list[str], side: int):
        def f(batch: pa.Table) -> pa.Table:
            s = batch.column(start_col).to_numpy().astype(np.int64)
            e = batch.column(end_col).to_numpy().astype(np.int64)
            b0 = s // w
            b1 = e // w
            counts = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(batch)), counts)
            # bucket sequence per row: b0[i] + (position within the run)
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            buckets = b0[idx] + (np.arange(len(idx)) - offs[idx])
            out = {k: batch.column(k).take(pa.array(idx)) for k in key_cols}
            out["bucket"] = pa.array(buckets)
            out["side"] = pa.array(np.full(len(idx), side, dtype=np.int8))
            out["_s"] = pa.array(s[idx])
            out["_e"] = pa.array(e[idx])
            for c in cols:
                out[c] = batch.column(c).take(pa.array(idx))
            # pad the other side's payload columns so the union schema aligns
            other = right_cols if side == 0 else left_cols
            for c in other:
                out[c] = pa.nulls(len(idx), pad_types[c])
            return pa.table(out)

        return f

    lrep = left.map_batches(
        replicate(left_start, left_end, left_cols, 0), batch_format="pyarrow"
    )
    rrep = right.map_batches(
        replicate(right_start, right_end, right_cols, 1), batch_format="pyarrow"
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["side"] == 0]
        rg = g[g["side"] == 1]
        empty = pd.DataFrame(
            {
                **{k: pd.Series([], dtype=g[k].dtype) for k in key_cols},
                **{c: pd.Series([], dtype=g[c].dtype) for c in left_cols},
                **{c: pd.Series([], dtype=g[c].dtype) for c in right_cols},
            }
        )
        if lg.empty or rg.empty:
            return empty
        bucket = int(g["bucket"].iloc[0])
        m = lg[["_s", "_e", *left_cols]].merge(
            rg[["_s", "_e", *right_cols]], how="cross", suffixes=("_l", "_r")
        )
        ov = (m["_s_l"] <= m["_e_r"]) & (m["_s_r"] <= m["_e_l"])
        canon = np.maximum(m["_s_l"].to_numpy(), m["_s_r"].to_numpy()) // w == bucket
        m = m[ov & canon]
        if m.empty:
            return empty
        out = pd.DataFrame({k: np.repeat(g[k].iloc[0], len(m)) for k in key_cols})
        for c in left_cols:
            out[c] = m[c].to_numpy()
        for c in right_cols:
            out[c] = m[c].to_numpy()
        return out

    return (
        lrep.union(rrep)
        .groupby([*key_cols, "bucket"])
        .map_groups(join_bucket, batch_format="pandas")
    )


def decayed_grouped_sum(
    ds: ray.data.Dataset,
    by: Sequence[str],
    *,
    ts_col: str,
    now_us: int,
    half_life_s: float,
    value_col: str | None = None,
) -> ray.data.Dataset:
    """Exponentially time-decayed aggregate — the "trending" primitive:
    per group, ``Σ w·2^(−Δt/half_life)`` (w = 1 or ``value_col``) plus
    the undecayed count, anchored at the CALLER-SUPPLIED ``now_us``
    (epoch micros; explicit so reruns are reproducible — never wall
    clock).  Recent activity dominates, old activity fades with a
    half-life instead of a hard window cutoff.

    Map-only partials (one exp() kernel per batch, weights summed per
    group before the exchange) → one narrow groupby sum — decayed sums
    are order-independent so the partial/merge split is exact up to
    float addition order (outputs are round(,4)-quantized by callers,
    the repo's float-sum convention).
    """
    by = list(by)
    scale = float(half_life_s) * 1e6  # micros per half-life

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = (now_us - df[ts_col].astype("int64").to_numpy()).astype(np.float64)
        w = np.exp2(-dt / scale)
        if value_col is not None:
            w = w * df[value_col].to_numpy(dtype=np.float64)
        g = pd.DataFrame(
            {
                **{k: df[k] for k in by},
                "decayed": w,
                "n": np.ones(len(df), dtype=np.int64),
            }
        )
        return g.groupby(by, as_index=False).sum()

    agg = (
        ds.select_columns([*by, ts_col] + ([value_col] if value_col else []))
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .sum(["decayed", "n"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                **{k: batch.column(k) for k in by},
                "decayed": batch.column("sum(decayed)"),
                "n": pa.compute.cast(batch.column("sum(n)"), pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
