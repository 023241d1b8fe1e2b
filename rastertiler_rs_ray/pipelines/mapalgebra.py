"""Local (per-pixel) map algebra over co-registered rasters.

The reference renders ONE band of ONE raster (src/render.rs:34); real
raster pipelines combine bands/rasters per pixel (NDVI, change
detection, masking).  Local algebra needs no halo and no exchange at
all: both operands are windowed-readable, so each task reads the same
chunk window from each raster and combines vectorized — embarrassingly
parallel, the cheapest operator class in the raster family (contrast
``pipelines/focal.py`` where neighborhoods force overlap reads or a
halo exchange).

Semantics (mirrored by the SQL oracle): a pixel is valid iff BOTH
operands are non-nodata; ``ndvi`` computes (a - b) / (a + b) quantized
e4 with floor(x·1e4 + 0.5), ``diff`` computes a - b.  Output is a
per-chunk-block rollup (valid count, sum of quantized values, min,
max) so any scale of raster yields bounded result rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_OUT_SCHEMA = pa.schema(
    [
        ("bx", pa.int64()),
        ("by", pa.int64()),
        ("n", pa.int64()),
        ("val_sum", pa.int64()),
        ("val_min", pa.int64()),
        ("val_max", pa.int64()),
    ]
)


def local_algebra(
    spec_a: dict,
    spec_b: dict,
    c0: int,
    r0: int,
    c1: int,
    r1: int,
    *,
    op: str = "ndvi",
    chunk: int = 256,
    quantum: float = 1e4,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Per-pixel combine of two co-registered rasters over a pixel
    region, rolled up per chunk block.  One stateful actor pool holds
    BOTH raster handles (constructed once per actor from their specs);
    each task reads the same window from each and combines vectorized —
    zero exchanges end to end."""
    from ..raster.synthetic import SyntheticRaster

    if op not in ("ndvi", "diff"):
        raise ValueError(f"unknown op {op!r}")

    ids = [
        {"bx": bx, "by": by}
        for by in range(r0 // chunk, (r1 + chunk - 1) // chunk)
        for bx in range(c0 // chunk, (c1 + chunk - 1) // chunk)
    ]

    class _Combiner:
        def __init__(self):
            self.a = SyntheticRaster.from_spec(spec_a)
            self.b = SyntheticRaster.from_spec(spec_b)

        def __call__(self, t: pa.Table) -> pa.Table:
            out = []
            bxs = t.column("bx").to_numpy(zero_copy_only=False)
            bys = t.column("by").to_numpy(zero_copy_only=False)
            for bx, by in zip(bxs, bys):
                cs = np.arange(
                    max(bx * chunk, c0), min((bx + 1) * chunk, c1), dtype=np.int64
                )
                rs = np.arange(
                    max(by * chunk, r0), min((by + 1) * chunk, r1), dtype=np.int64
                )
                if len(cs) == 0 or len(rs) == 0:
                    continue
                va = self.a.values_at(cs[None, :], rs[:, None]).astype(np.float64)
                vb = self.b.values_at(cs[None, :], rs[:, None]).astype(np.float64)
                valid = (va != float(self.a.nodata)) & (vb != float(self.b.nodata))
                n = int(valid.sum())
                if n == 0:
                    continue
                a, b = va[valid], vb[valid]
                if op == "ndvi":
                    v = np.floor((a - b) / (a + b) * quantum + 0.5).astype(np.int64)
                else:
                    v = (a - b).astype(np.int64)
                out.append(
                    pa.table(
                        {
                            "bx": pa.array([int(bx)], pa.int64()),
                            "by": pa.array([int(by)], pa.int64()),
                            "n": pa.array([n], pa.int64()),
                            "val_sum": pa.array([int(v.sum())], pa.int64()),
                            "val_min": pa.array([int(v.min())], pa.int64()),
                            "val_max": pa.array([int(v.max())], pa.int64()),
                        }
                    )
                )
            return pa.concat_tables(out) if out else _OUT_SCHEMA.empty_table()

    # task stage, not an actor pool — combiner state is two tiny spec
    # dicts (see focal._ids_task_stage); ``concurrency`` is API compat
    from .focal import _ids_task_stage

    return _ids_task_stage(ids, _Combiner())
