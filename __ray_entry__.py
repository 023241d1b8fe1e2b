"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → derived
    geo positions → Raptor-style raster↔vector join at z8 against the
    deterministic synthetic EPSG:3857 raster (tile-key shuffle with the
    per-group warmed-window sampler).  Returns a ray.data.Dataset of
    (doc_id, zoom, x, y, raster_value)."""
    from rastertiler_rs_ray.pipelines.driver_queries import raster_vector_join_z8

    return raster_vector_join_z8("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rastertiler_rs_ray.pipelines.driver_queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same
    column names; aggregate floats rounded to 4 decimals both sides)."""
    from rastertiler_rs_ray.pipelines.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
