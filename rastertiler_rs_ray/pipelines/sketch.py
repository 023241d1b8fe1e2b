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
