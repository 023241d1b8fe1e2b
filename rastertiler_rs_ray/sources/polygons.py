"""Deterministic synthetic polygon set for containment joins (test/bench).

Seeded star-convex polygons (5–9 vertices) around a mix of the doc
cluster centers (so containment counts are non-trivial) and uniform
background centers. Small table by design — broadcast, never shuffled.
"""

from __future__ import annotations

import numpy as np

from .docs import CLUSTERS


def generate_polygons(m: int = 20, seed: int = 7) -> list[dict]:
    rng = np.random.default_rng(seed)
    polys = []
    for i in range(m):
        if i < len(CLUSTERS):
            cx, cy = CLUSTERS[i][0], CLUSTERS[i][1]
            scale = rng.uniform(0.5, 2.0)
        else:
            cx = rng.uniform(-160, 160)
            cy = rng.uniform(-70, 70)
            scale = rng.uniform(2.0, 12.0)
        nv = int(rng.integers(5, 10))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        radii = rng.uniform(0.4, 1.0, nv) * scale
        lon = cx + radii * np.cos(angles)
        lat = np.clip(cy + radii * np.sin(angles), -84.9, 84.9)
        polys.append(
            {
                "poly_id": i,
                "lon": lon.tolist(),
                "lat": lat.tolist(),
            }
        )
    return polys
