"""Generic resumable partitioned-parquet sink with manifest lineage.

Generalizes the render pipeline's checkpoint story (render.py, state/
manifest.py) to ANY Dataset: output is hive-partitioned parquet keyed
by a partition column, each completed partition is recorded in the
manifest AFTER its files land, and a resumed run drops rows of
completed partitions with a map-only broadcast-set filter before any
work happens — a crashed 100 TB job re-pays only its unfinished
partitions, never one giant file (SURVEY §4; reference has no resume
story, it deletes its output db on start, /root/reference/src/mbtiles.rs:53-55).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data

from ..state.manifest import Manifest


def checkpointed_write(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    partition_col: str,
    resume: bool = True,
    meta: dict | None = None,
) -> Manifest:
    """Write ``ds`` hive-partitioned by ``partition_col`` under
    ``out_dir/data/`` with per-partition manifest records.

    On resume, rows whose partition is already complete are filtered
    out map-side (no shuffle, no rewrite); the write job then only
    touches pending partitions.  Partition values must be
    path-safe scalars (str/int).  Returns the manifest.
    """
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    if meta:
        manifest.set_meta(**meta)

    done = {
        p.removeprefix("data/")
        for p in manifest.completed_partitions()
        if p.startswith("data/")
    }
    if resume and done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(batch: pa.Table) -> pa.Table:
            vals = pc.cast(batch.column(partition_col), pa.string())
            return batch.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    elif not resume:
        manifest.data["partitions"] = {
            k: v for k, v in manifest.data["partitions"].items()
            if not k.startswith("data/")
        }
        manifest.save()
        done = set()

    data_dir = os.path.join(out_dir, "data")
    # idempotent overwrite: a partition dir on disk with no manifest
    # record is a crash leftover — drop it so re-write can't duplicate
    if os.path.isdir(data_dir):
        import shutil

        for d in os.listdir(data_dir):
            if d.startswith(f"{partition_col}=") and d.split("=", 1)[1] not in done:
                shutil.rmtree(os.path.join(data_dir, d))

    t0 = time.time()
    ds.write_parquet(data_dir, partition_cols=[partition_col])
    wall = time.time() - t0

    # record each NEWLY written partition (row counts from file metadata)
    if os.path.isdir(data_dir):
        for d in sorted(os.listdir(data_dir)):
            if not d.startswith(f"{partition_col}="):
                continue
            label = d.split("=", 1)[1]
            if label in done:
                continue
            pdir = os.path.join(data_dir, d)
            n = pads.dataset(pdir, format="parquet").count_rows()
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(pdir)
                for f in fs
            )
            manifest.record_complete(
                f"data/{label}", rows=n, wall_s=wall, partition_dir=d,
                bytes=nbytes,
                mb_per_s=round(nbytes / 1e6 / wall, 2) if wall > 0 else None,
            )
    return manifest
