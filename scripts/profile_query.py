"""Per-stage profiling for any driver query: run it and print
``Dataset.stats()`` so wall time per operator is visible.

Usage::

    python scripts/profile_query.py <query_name> [sf_dir]

The "measure, don't guess" loop: after an operator change, confirm the
stage you touched dominates (or stopped dominating) before calling it
done.  Small pa.Table/DataFrame results have no stats; the script says
so instead of guessing.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import logging

    import ray
    import ray.data

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E

    qs = E.queries()
    if name not in qs:
        print(f"unknown query {name!r}; available: {', '.join(sorted(qs))}",
              file=sys.stderr)
        return 2
    fn = qs[name]
    t0 = time.time()
    result = fn(sf_dir)
    if isinstance(result, ray.data.Dataset):
        mat = result.materialize()  # profiling runs at small SF; retain stats
        n = mat.count()
        print(f"{name}: {n} rows in {time.time() - t0:.2f}s\n")
        print(mat.stats())
    else:
        n = len(result)
        print(f"{name}: {n} rows in {time.time() - t0:.2f}s")
        print("(driver-side result — no Dataset stats; stages already consumed)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
