"""Cell-encoder stage: interleaved docs → geo position + cell/tile keys.

The stateful analog of the reference's per-worker warmed handles (A4 in
SURVEY.md §2.3): the actor holds the compiled parsing machinery and the
configured cell level; ``__call__`` derives, per document, the position
of its FIRST media span (``geo://{lon},{lat}/{asset}``), forward
Mercator coordinates, and the packed cell id — all vectorized (Arrow
list flattening + pandas C string ops + numpy math; no Python loop over
rows).

Documents without a media span get ``has_geo = false`` and null
cell_id; spatial pipelines filter on ``has_geo``.

The ``spans`` column passes through untouched (list-of-struct survives
Arrow shuffles intact) — preserving the span-sequence invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.cell import cell_from_mercator
from ..geo.mercator import geo_to_mercator


class CellEncoder:
    def __init__(self, level: int = 12):
        self.level = int(level)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        spans = batch.column("spans").combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy()
        kinds = flat.field("kind")
        refs = flat.field("media_ref")

        is_media = pc.equal(kinds, "media").to_numpy(zero_copy_only=False)
        media_parents = parents[is_media]
        media_refs = refs.to_pandas()[is_media]

        # first media span per doc
        uniq_parents, first_idx = np.unique(media_parents, return_index=True)
        first_refs = media_refs.iloc[first_idx]

        # parse "geo://{lon},{lat}/{asset}" with vectorized pandas str ops
        coords = first_refs.str.slice(6).str.partition("/")[0]
        lonlat = coords.str.partition(",")
        lon_g = lonlat[0].astype(np.float64).to_numpy()
        lat_g = lonlat[2].astype(np.float64).to_numpy()

        lon = np.full(n, np.nan)
        lat = np.full(n, np.nan)
        lon[uniq_parents] = lon_g
        lat[uniq_parents] = lat_g
        has_geo = np.zeros(n, dtype=bool)
        has_geo[uniq_parents] = True

        mx, my = geo_to_mercator(lon, lat)
        cid = np.zeros(n, dtype=np.uint64)
        if len(uniq_parents):
            cid[uniq_parents] = cell_from_mercator(self.level, mx[uniq_parents], my[uniq_parents])

        out = batch
        for name, arr in [
            ("lon", pa.array(lon, pa.float64())),
            ("lat", pa.array(lat, pa.float64())),
            ("mx", pa.array(mx, pa.float64())),
            ("my", pa.array(my, pa.float64())),
            ("has_geo", pa.array(has_geo, pa.bool_())),
            # no null mask: nullable uint64 degrades to float64 in pandas
            # (precision loss); has_geo is the validity flag
            ("cell_id", pa.array(cid, pa.uint64())),
        ]:
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out
