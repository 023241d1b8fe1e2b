"""Generic checkpointed sink: partitioned write, crash recovery, resume."""

import os

import pyarrow.dataset as pads
import ray.data


def _counts(data_dir):
    out = {}
    for d in sorted(os.listdir(data_dir)):
        if "=" in d:
            out[d] = pads.dataset(os.path.join(data_dir, d), format="parquet").count_rows()
    return out


def test_checkpointed_write_and_crash_resume(ray_session, tmp_path):
    import json
    import shutil

    from rastertiler_rs_ray.pipelines.sink import checkpointed_write

    sf = "/root/testdata/sf0.001"
    ev = ray.data.read_parquet(f"{sf}/events.parquet")
    out = str(tmp_path / "ck")
    m = checkpointed_write(ev, out, partition_col="event_type", resume=False,
                          meta={"source": "events"})
    data = os.path.join(out, "data")
    full = _counts(data)
    assert sum(full.values()) == ev.count()
    parts = m.completed_partitions()
    assert all(p.startswith("data/") for p in parts) and len(parts) == len(full)
    for p in parts:
        rec = m.partition(p)
        assert rec["rows"] > 0
        # north-rule lineage + throughput metrics: every completed
        # partition records bytes on disk and MB/s alongside rows/s
        assert rec["bytes"] > 0
        assert rec["mb_per_s"] is None or rec["mb_per_s"] > 0
        assert rec["rows_per_s"] is None or rec["rows_per_s"] > 0
        assert rec["partition_dir"].startswith("event_type=")

    # crash window A: partition files written but no manifest record
    victim = sorted(full)[0]
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        j = json.load(f)
    del j["partitions"]["data/" + victim.split("=", 1)[1]]
    with open(mpath, "w") as f:
        json.dump(j, f)
    # leave a partial (truncated) leftover to prove idempotent overwrite
    leftover = os.listdir(os.path.join(data, victim))
    survivors = [d for d in full if d != victim]
    mtimes = {d: os.path.getmtime(os.path.join(data, d)) for d in survivors}

    ev2 = ray.data.read_parquet(f"{sf}/events.parquet")
    m2 = checkpointed_write(ev2, out, partition_col="event_type", resume=True)
    assert _counts(data) == full  # converged, no duplicated rows
    for d in survivors:  # completed partitions untouched
        assert os.path.getmtime(os.path.join(data, d)) == mtimes[d]
    assert set(m2.completed_partitions()) == set(parts)

    # fully-complete resume is a no-op for every partition
    mtimes_all = {d: os.path.getmtime(os.path.join(data, d)) for d in full}
    checkpointed_write(ray.data.read_parquet(f"{sf}/events.parquet"), out,
                       partition_col="event_type", resume=True)
    for d in full:
        assert os.path.getmtime(os.path.join(data, d)) == mtimes_all[d]
    assert _counts(data) == full
