"""Web Mercator (EPSG:3857) forward/inverse projection, vectorized.

Semantics match the reference's ``geo_to_mercator``
(/root/reference/src/tileid.rs:21-34): longitude clamped to ±180,
latitude clamped to ±85.051129, spherical Mercator with R=6378137.

All functions accept scalars or numpy arrays (float64) and return
float64; they are pure math, safe to call inside ``map_batches``
kernels on whole columns at once.
"""

from __future__ import annotations

import numpy as np

RE: float = 6378137.0
ORIGIN: float = RE * np.pi          # 20037508.342789244
CE: float = 2.0 * ORIGIN            # circumference at the equator

LAT_LIMIT: float = 85.051129        # reference clamp (src/tileid.rs:28)


def geo_to_mercator(lon, lat):
    """lon/lat (degrees) → EPSG:3857 meters. Vectorized.

    Reference: /root/reference/src/tileid.rs:21-34.
    """
    lon = np.clip(np.asarray(lon, dtype=np.float64), -180.0, 180.0)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -LAT_LIMIT, LAT_LIMIT)

    x = lon * (ORIGIN / 180.0)
    y = RE * np.log(np.tan(np.pi * 0.25 + 0.5 * np.deg2rad(lat)))
    return x, y


def mercator_to_geo(x, y):
    """EPSG:3857 meters → lon/lat (degrees). Inverse of geo_to_mercator.

    Uses the same spherical model: lat = atan(sinh(y / RE)).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x * (180.0 / ORIGIN)
    lat = np.rad2deg(np.arctan(np.sinh(y / RE)))
    return lon, lat
