"""Sketch operators: distributed HyperLogLog approximate distinct count.

The scale story for COUNT(DISTINCT key) at 10^12 rows: an exact count
shuffles every distinct key; the HLL sketch shuffles at most ``2^p``
(bucket, rho) register rows per block, merged with a tiny groupby-max.
Deterministic (splitmix64 finalizer, no seeds) so runs are reproducible
and resumable.  Standard bias handling: linear counting for small
cardinalities, the 0.7213/(1+1.079/m) alpha otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .relational import grouped_aggregate


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized u64 avalanche."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64).copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        x = np.where(big, x >> np.uint64(s), x)
        bl += big.astype(np.int64) * s
    return bl + (x > 0).astype(np.int64)


def hll_registers(ds: ray.data.Dataset, col: str, *, p: int = 12) -> ray.data.Dataset:
    """Per-block HLL partials → merged registers (bucket, rho), ≤ 2^p rows."""
    m = 1 << p
    tail_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        h = _mix64(batch.column(col).to_numpy().astype(np.int64).view(np.uint64))
        bucket = (h >> np.uint64(tail_bits)).astype(np.int64)
        rest = h & np.uint64((1 << tail_bits) - 1)
        rho = tail_bits - _bit_length_u64(rest) + 1  # clz of tail + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "rho": pa.array(regs[nz], pa.int64())}
        )

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"],
        [("rho", "rho", "max")],
    )


def hll_estimate(registers: pa.Table, *, p: int = 12) -> float:
    """Cardinality estimate from merged registers (small, driver-side)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    regs[registers.column("bucket").to_numpy()] = registers.column("rho").to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting
    return float(raw)


def approx_distinct(ds: ray.data.Dataset, col: str, *, p: int = 12) -> float:
    """End-to-end approximate COUNT(DISTINCT col); ~1.04/sqrt(2^p) error."""
    regs = hll_registers(ds, col, p=p)
    tbl = pa.Table.from_pandas(regs.to_pandas()).replace_schema_metadata(None)
    return hll_estimate(tbl, p=p)


# ---------------------------------------------------------------- count-min


class CountMinSketch:
    """Vectorized Count-Min over string/int keys: ``depth`` hash rows ×
    ``2^width_log2`` uint64 counters.  add/estimate are numpy passes;
    partials merge by elementwise ``+`` (associative), so per-block
    sketches tree-reduce without ever shuffling the keys themselves.
    Estimates only ever OVERcount (min over rows bounds the error by
    ~N/width per row)."""

    def __init__(self, width_log2: int = 14, depth: int = 4, counts: np.ndarray | None = None):
        self.width_log2 = int(width_log2)
        self.depth = int(depth)
        self.w = np.uint64(1 << width_log2)
        self.counts = (
            counts
            if counts is not None
            else np.zeros((depth, 1 << width_log2), dtype=np.uint64)
        )

    def _cols(self, hashed: np.ndarray) -> np.ndarray:
        h = hashed.astype(np.uint64)
        rows = []
        for d in range(self.depth):
            salt = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
            rows.append(_mix64(h ^ salt) % self.w)
        return np.stack(rows)  # (depth, n)

    def add_many(self, hashed: np.ndarray, weights: np.ndarray) -> None:
        cols = self._cols(hashed)
        wts = weights.astype(np.uint64)
        for d in range(self.depth):
            np.add.at(self.counts[d], cols[d].astype(np.int64), wts)

    def estimate(self, hashed: np.ndarray) -> np.ndarray:
        cols = self._cols(hashed)
        est = self.counts[0][cols[0].astype(np.int64)]
        for d in range(1, self.depth):
            est = np.minimum(est, self.counts[d][cols[d].astype(np.int64)])
        return est.astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.width_log2 == other.width_log2 and self.depth == other.depth
        return CountMinSketch(self.width_log2, self.depth, self.counts + other.counts)

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, width_log2: int, depth: int) -> "CountMinSketch":
        arr = np.frombuffer(data, dtype=np.uint64).reshape(depth, 1 << width_log2).copy()
        return cls(width_log2, depth, arr)


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.util.hash_array(keys).astype(np.uint64)


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    *,
    k: int = 10,
    width_log2: int = 14,
    depth: int = 4,
    candidates_per_block: int = 256,
    reduce_fan_in: int = 64,
) -> pa.Table:
    """Approximate top-``k`` most frequent values of ``col``.

    One corpus pass emits, per block, (a) the block's local top
    ``candidates_per_block`` values with exact in-block counts and (b)
    one Count-Min partial over ALL the block's values.  Candidate rows
    take a vocab-bounded grouped-sum (a true heavy hitter is a local
    heavy hitter in the blocks that hold its mass); CMS partials
    tree-reduce in groups of ``reduce_fan_in`` so the driver merges
    ``B/fan_in`` sketches, not ``B``.  Final ranking re-estimates every
    surviving candidate against the merged sketch — estimates never
    undercount, so rank inversions only occur between near-ties.
    Deterministic end to end (seeded hashes, no RNG).
    """
    from .relational import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.column(col).type
        vals = batch.column(col).to_pandas()
        vc = vals.value_counts()
        cms = CountMinSketch(width_log2, depth)
        cms.add_many(
            _hash_keys(vc.index.to_numpy()), vc.to_numpy().astype(np.uint64)
        )
        top = vc.iloc[:candidates_per_block]
        # candidates keep the column's NATIVE type (stringifying int keys
        # would desync the final estimate's hashes from the sketch's);
        # the per-block sketch rides a null-keyed sentinel row
        return pa.table(
            {
                "word": pa.array(list(top.index) + [None], key_type),
                "n": pa.array(list(top.to_numpy().astype(np.int64)) + [0], pa.int64()),
                "cms": pa.array([None] * len(top) + [cms.to_bytes()], pa.binary()),
            }
        )

    # parts feeds both the candidate aggregate and the sketch reduce —
    # pin the (small: ≤candidates+1 rows per block) result so the
    # corpus scan runs exactly once
    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def only_cand(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("cms").is_null()).drop_columns(["cms"])

    def only_cms(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("cms").is_valid()).select(["cms"])

    cand = grouped_aggregate(
        parts.map_batches(only_cand, batch_format="pyarrow"),
        ["word"],
        [("n", "n", "sum")],
    )

    def reduce_block(batch: pa.Table) -> pa.Table:
        merged = CountMinSketch(width_log2, depth)
        for b in batch.column("cms").to_pylist():
            if b is not None:
                merged = merged.merge(CountMinSketch.from_bytes(b, width_log2, depth))
        return pa.table({"cms": pa.array([merged.to_bytes()], pa.binary())})

    sketches = parts.map_batches(only_cms, batch_format="pyarrow")
    n_parts = sketches.count()
    if n_parts > reduce_fan_in:
        sketches = sketches.repartition(max(1, n_parts // reduce_fan_in)).map_batches(
            reduce_block, batch_format="pyarrow"
        )
    merged = CountMinSketch(width_log2, depth)
    for row in sketches.take_all():
        merged = merged.merge(CountMinSketch.from_bytes(row["cms"], width_log2, depth))

    sch = parts.schema()  # materialized: metadata-only
    key_type = sch.types[sch.names.index("word")]
    cdf = cand.to_pandas()
    est = merged.estimate(_hash_keys(cdf["word"].to_numpy()))
    cdf["n"] = est
    top = cdf.sort_values(["n", "word"], ascending=[False, True], kind="mergesort").head(k)
    return pa.table(
        {
            "word": pa.array(list(top["word"]), key_type),
            "n": pa.array(top["n"].to_numpy(), pa.int64()),
        }
    )


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    *,
    p: int = 12,
) -> ray.data.Dataset:
    """Per-group HyperLogLog approximate COUNT(DISTINCT col) — the
    per-domain/per-language cardinality profile a 100-TB corpus audit
    runs where exact ``groupby(g).nunique`` would shuffle every
    (g, key) pair.

    The sketch merge rides the exchange: each block emits its ≤ 2^p
    non-zero (group, bucket, rho) register rows (vectorized
    ``groupby.max``), the ONE groupby merges them with a max aggregate,
    and a final vectorized pass converts each group's register set to
    the standard alpha / linear-counting estimate.  Exchange volume is
    ≤ groups × 2^p narrow rows per block — independent of row count.

    Output: (group_col, estimate) with estimate rounded to 1 decimal
    (float sum-order differences across engines are absorbed by the
    rounding, same contract as ``approx_distinct``'s SQL mirror).
    """
    m = 1 << p
    tail_bits = 64 - p
    alpha_mm = 0.7213 / (1 + 1.079 / m) * m * m

    def partial(batch: pa.Table) -> pa.Table:
        h = _mix64(batch.column(col).to_numpy().astype(np.int64).view(np.uint64))
        bucket = (h >> np.uint64(tail_bits)).astype(np.int64)
        rest = h & np.uint64((1 << tail_bits) - 1)
        rho = tail_bits - _bit_length_u64(rest) + 1
        df = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_pandas().to_numpy(),
                "bucket": bucket,
                "rho": rho,
            }
        )
        out = df.groupby([group_col, "bucket"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "bucket"],
        [("rho", "rho", "max")],
    )

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # zero-column empty reduce partitions (see raylog.py)
            return df
        g = df.groupby(group_col, sort=False)
        nz = g.size().to_numpy(dtype=np.int64)  # buckets present (rho ≥ 1)
        s = g["rho"].apply(
            lambda r: float(np.sum(np.exp2(-r.to_numpy(dtype=np.float64))))
        ).to_numpy(dtype=np.float64)
        zeros = m - nz
        raw = alpha_mm / (s + zeros.astype(np.float64))
        lin = np.where(zeros > 0, m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0)), raw)
        est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
        return pd.DataFrame(
            {group_col: g.size().index.to_numpy(), "estimate": np.round(est, 1)}
        )

    # the merged register table is ≤ groups × 2^p rows; estimate per
    # group needs all of a group's registers together — one map_groups
    return merged.groupby(group_col).map_groups(
        lambda d: estimate(d), batch_format="pandas"
    )


def hll_set_overlap(
    a: ray.data.Dataset, b: ray.data.Dataset, col: str, *, p: int = 12
) -> pa.Table:
    """Sketch-based set arithmetic: HLL estimates of |A|, |B|, |A∪B|
    and the inclusion-exclusion intersection |A|+|B|−|A∪B| — the
    mergeable-summary way to size audience overlap without ever
    shuffling the key sets (each side reduces to ≤2^p register rows;
    union = elementwise register max, the defining HLL property).
    """
    ra = pa.Table.from_pandas(
        hll_registers(a, col, p=p).to_pandas()
    ).replace_schema_metadata(None)
    rb = pa.Table.from_pandas(
        hll_registers(b, col, p=p).to_pandas()
    ).replace_schema_metadata(None)
    m = 1 << p
    regs_a = np.zeros(m, dtype=np.int64)
    regs_a[ra.column("bucket").to_numpy()] = ra.column("rho").to_numpy()
    regs_b = np.zeros(m, dtype=np.int64)
    regs_b[rb.column("bucket").to_numpy()] = rb.column("rho").to_numpy()
    regs_u = np.maximum(regs_a, regs_b)

    def est(regs: np.ndarray) -> float:
        nz = np.flatnonzero(regs)
        t = pa.table(
            {"bucket": pa.array(nz, pa.int64()), "rho": pa.array(regs[nz], pa.int64())}
        )
        return hll_estimate(t, p=p)

    ea, eb, eu = est(regs_a), est(regs_b), est(regs_u)
    ei = ea + eb - eu
    return pa.table(
        {
            "metric": pa.array(
                ["a", "b", "union", "intersection"], pa.string()
            ),
            "estimate": pa.array(
                [round(ea, 1), round(eb, 1), round(eu, 1), round(ei, 1)],
                pa.float64(),
            ),
        }
    )
