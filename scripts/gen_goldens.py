"""Generate frozen golden fixtures: single-process tile renders.

Run once (no Ray needed); outputs tests/goldens/*.json. Goldens pin:
(zoom,x,y) → sha256(png) for the default u8/u32 rasters, per-zoom row
counts, and distinct-hash counts. Distributed runs must match exactly
at any parallelism (SURVEY.md §5 item 2).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from rastertiler_rs_ray.geo.tileid import tile_range
from rastertiler_rs_ray.raster import default_u8_raster, default_u32_raster
from rastertiler_rs_ray.stages.tile_render import TileRenderer


def render_direct(raster, zooms, tilesize, colormap=None):
    """Single-process reference render via the same stage class."""
    worker = TileRenderer(raster.spec(), tilesize=tilesize, colormap=colormap)
    bounds = raster.bounds()
    out = {}
    for z in zooms:
        tr = tile_range(z, bounds)
        ids = list(tr.iter())
        batch = pa.table(
            {
                "zoom": pa.array([t[0] for t in ids], pa.uint8()),
                "x": pa.array([t[1] for t in ids], pa.uint32()),
                "y": pa.array([t[2] for t in ids], pa.uint32()),
            }
        )
        res = worker(batch)
        for i in range(len(res)):
            key = f"{res.column('zoom')[i]}/{res.column('x')[i]}/{res.column('y')[i]}"
            png = res.column("tile_data")[i].as_py()
            out[key] = hashlib.sha256(png).hexdigest()
    return out


def main():
    gold_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(gold_dir, exist_ok=True)

    cases = {
        "render_u8_z0-6_ts256": (default_u8_raster(), range(0, 7), 256, None),
        "render_u8_cm_z4-5_ts256": (
            default_u8_raster(),
            range(4, 6),
            256,
            "42:#ff7f50,7:#0000ff,99:#00ff00",
        ),
        "render_u32_z5-7_ts256": (default_u32_raster(), range(5, 8), 256, None),
        # z9-10 at 256px is beyond native resolution → upsampling +
        # constant-block tiles → content-hash dedup hits
        "render_u8_z9-10_ts256": (default_u8_raster(), range(9, 11), 256, None),
    }
    for name, (raster, zooms, ts, cm) in cases.items():
        tiles = render_direct(raster, list(zooms), ts, cm)
        hashes = list(tiles.values())
        golden = {
            "tiles": tiles,
            "count": len(tiles),
            "distinct_images": len(set(hashes)),
        }
        path = os.path.join(gold_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        print(name, "tiles:", len(tiles), "distinct:", golden["distinct_images"])


if __name__ == "__main__":
    main()
