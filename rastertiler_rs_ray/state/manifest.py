"""Checkpoint manifest with per-partition lineage + throughput metrics.

The reference has no resume story (it deletes the output db on start,
/root/reference/src/mbtiles.rs:53-55). At 100 TB scale a run must be
resumable: every pipeline here writes output in deterministically-named
partition directories and records each completed partition in this
manifest (counts, wall time, rows/s, input lineage) AFTER the
partition's files are fully written — crash between file write and
manifest record safely re-runs the partition (idempotent overwrite).

The manifest file itself is written atomically (tmp + rename).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.data: dict = {"partitions": {}, "meta": {}}
        if os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)
            self.data.setdefault("partitions", {})
            self.data.setdefault("meta", {})

    # -- meta ----------------------------------------------------------
    def set_meta(self, **kwargs) -> None:
        self.data["meta"].update(kwargs)
        self.save()

    def get_meta(self, key: str, default=None):
        return self.data["meta"].get(key, default)

    # -- partitions ----------------------------------------------------
    def is_complete(self, partition: str) -> bool:
        return self.data["partitions"].get(partition, {}).get("status") == "complete"

    def record_complete(self, partition: str, *, rows: int, wall_s: float, **lineage) -> None:
        self.data["partitions"][partition] = {
            "status": "complete",
            "rows": int(rows),
            "wall_s": round(float(wall_s), 3),
            "rows_per_s": round(rows / wall_s, 1) if wall_s > 0 else None,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **lineage,
        }
        self.save()

    def partition(self, name: str) -> dict:
        return self.data["partitions"].get(name, {})

    def completed_partitions(self) -> list[str]:
        return [k for k, v in self.data["partitions"].items() if v.get("status") == "complete"]

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
