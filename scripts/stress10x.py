"""10x-bench-size stress of the text-pipeline scale contracts.

Synthesizes a 50,000-doc corpus (10x the sf0.1 documents table) by
replicating the real table with remapped ids and per-replica salt
appended to the text — replicas are NEAR-dups of their original
(char-shingle Jaccard ~0.95), so the dedup families face 5,000
clusters of size 10 (45k drops), a heavier clustering load than the
bench corpus — then runs the three heaviest curation pipelines end to
end in one Ray session and prints ONE JSON line with wall times and
output row counts.  Completion without worker OOM/restart is the
pass signal (Ray kills and restarts workers that exceed memory; a
clean run means the contracts held).

Usage:  python scripts/stress10x.py   (env: RAY_GRAFT_CPUS, STRESS_MULT)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULT = int(os.environ.get("STRESS_MULT", "10"))
BASE = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/stress_sf"


def build_corpus() -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    base = pq.read_table(f"{BASE}/documents.parquet")
    n = base.num_rows
    reps = []
    for k in range(MULT):
        ids = pa.compute.add(base.column("doc_id"), k * n)
        if k == 0:
            text = base.column("text")
        else:
            salt = pa.array([f" rep{k} salt{i}" for i in ids.to_pylist()])
            text = pa.compute.binary_join_element_wise(
                base.column("text"), salt, ""
            )
        reps.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": text,
                    "lang": base.column("lang"),
                    "source": base.column("source"),
                    "n_chars": pa.compute.utf8_length(text),
                }
            )
        )
    full = pa.concat_tables(reps)
    pq.write_table(full, f"{OUT_DIR}/documents.parquet")
    return full.num_rows


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    n_docs = build_corpus()
    from rastertiler_rs_ray.pipelines import driver_queries as Q

    out: dict = {"metric": "stress10x wall times", "unit": "sec",
                 "n_docs": n_docs, "mult": MULT,
                 "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
                 "queries": {}, "rows": {}}
    for name, fn in [
        ("curated_training_corpus", Q.curated_training_corpus),
        ("minhash_dedup", Q.minhash_dedup_docs),
        ("remove_dup_ngrams", Q.remove_dup_ngrams_docs),
    ]:
        t0 = time.time()
        r = fn(OUT_DIR)
        rows = r.count() if hasattr(r, "count") else len(r)
        out["queries"][name] = round(time.time() - t0, 2)
        out["rows"][name] = int(rows)
    out["value"] = round(sum(out["queries"].values()), 2)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
