"""WGS84 transverse Mercator (UTM) forward/inverse — Snyder series.

Public-domain math from USGS Professional Paper 1395 (Snyder 1987,
"Map Projections: A Working Manual", eqs. 3-21, 8-9..8-17): the
standard 6th-order-in-e² series, sub-millimetre accurate inside a UTM
zone (±3° of the central meridian) — the accuracy envelope GDAL's own
warp operates in for the reference's warped VRT
(/root/reference/src/dataset.rs:74-110).

Everything is vectorized float64 numpy; no Python loops.

UTM conventions: scale k0 = 0.9996 on the central meridian,
false easting 500 000 m, false northing 0 (north) / 10 000 000 m
(south), central meridian ``zone*6 - 183`` degrees.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)            # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)         # second eccentricity squared
_K0 = 0.9996
_FE = 500_000.0
_FN_SOUTH = 10_000_000.0

# meridional-arc series coefficients (Snyder 3-21)
_M0 = 1.0 - _E2 / 4.0 - 3.0 * _E2**2 / 64.0 - 5.0 * _E2**3 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E2**2 / 32.0 + 45.0 * _E2**3 / 1024.0
_M4 = 15.0 * _E2**2 / 256.0 + 45.0 * _E2**3 / 1024.0
_M6 = 35.0 * _E2**3 / 3072.0

# footpoint-latitude series (Snyder 3-26), e1 = (1-√(1-e²))/(1+√(1-e²))
_E1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
_P2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_P4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_P6 = 151.0 * _E1**3 / 96.0
_P8 = 1097.0 * _E1**4 / 512.0


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """(central meridian degrees, false northing) for a WGS84 UTM EPSG
    code (326xx north / 327xx south); raises for anything else."""
    base = epsg // 100
    zone = epsg % 100
    if base == 326 and 1 <= zone <= 60:
        return zone * 6.0 - 183.0, 0.0
    if base == 327 and 1 <= zone <= 60:
        return zone * 6.0 - 183.0, _FN_SOUTH
    raise NotImplementedError(
        f"EPSG:{epsg} is not a WGS84 UTM zone (32601-32660 / 32701-32760)"
    )


def _meridional_arc(phi: np.ndarray) -> np.ndarray:
    return _A * (
        _M0 * phi
        - _M2 * np.sin(2.0 * phi)
        + _M4 * np.sin(4.0 * phi)
        - _M6 * np.sin(6.0 * phi)
    )


def tmerc_forward(
    lon: np.ndarray, lat: np.ndarray, lon0_deg: float, fn: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → (easting, northing) metres (Snyder 8-9..8-13)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    sin_p, cos_p = np.sin(phi), np.cos(phi)
    tan_p = sin_p / cos_p
    n_rad = _A / np.sqrt(1.0 - _E2 * sin_p * sin_p)
    t = tan_p * tan_p
    c = _EP2 * cos_p * cos_p
    a_ = dlam * cos_p
    m = _meridional_arc(phi)
    a2 = a_ * a_
    a3 = a2 * a_
    a4 = a2 * a2
    a5 = a4 * a_
    a6 = a4 * a2
    x = _K0 * n_rad * (
        a_
        + (1.0 - t + c) * a3 / 6.0
        + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * _EP2) * a5 / 120.0
    )
    y = _K0 * (
        m
        + n_rad * tan_p * (
            a2 / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c * c) * a4 / 24.0
            + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * _EP2) * a6 / 720.0
        )
    )
    return x + _FE, y + fn


def tmerc_inverse(
    easting: np.ndarray, northing: np.ndarray, lon0_deg: float, fn: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) metres → lon/lat degrees (Snyder 8-17..8-25)."""
    x = np.asarray(easting, dtype=np.float64) - _FE
    y = np.asarray(northing, dtype=np.float64) - fn
    mu = (y / _K0) / (_A * _M0)
    phi1 = (
        mu
        + _P2 * np.sin(2.0 * mu)
        + _P4 * np.sin(4.0 * mu)
        + _P6 * np.sin(6.0 * mu)
        + _P8 * np.sin(8.0 * mu)
    )
    sin1, cos1 = np.sin(phi1), np.cos(phi1)
    tan1 = sin1 / cos1
    c1 = _EP2 * cos1 * cos1
    t1 = tan1 * tan1
    w = 1.0 - _E2 * sin1 * sin1
    n1 = _A / np.sqrt(w)
    r1 = _A * (1.0 - _E2) / (w * np.sqrt(w))
    d = x / (n1 * _K0)
    d2 = d * d
    d3 = d2 * d
    d4 = d2 * d2
    d5 = d4 * d
    d6 = d4 * d2
    phi = phi1 - (n1 * tan1 / r1) * (
        d2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * _EP2) * d4 / 24.0
        + (
            61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1
            - 252.0 * _EP2 - 3.0 * c1 * c1
        ) * d6 / 720.0
    )
    lam = (
        d
        - (1.0 + 2.0 * t1 + c1) * d3 / 6.0
        + (
            5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1
            + 8.0 * _EP2 + 24.0 * t1 * t1
        ) * d5 / 120.0
    ) / cos1
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


class UtmProjection:
    """Pickle-friendly forward/inverse pair for one UTM zone — the
    source-CRS adapter ``MercatorWarp`` uses for EPSG:326xx/327xx."""

    def __init__(self, epsg: int):
        self.epsg = int(epsg)
        self.lon0, self.fn = utm_zone_params(self.epsg)

    def forward(self, lon, lat):
        return tmerc_forward(lon, lat, self.lon0, self.fn)

    def inverse(self, x, y):
        return tmerc_inverse(x, y, self.lon0, self.fn)


# ---------------------------------------------------------------- EPSG:3395
# WGS84 World Mercator — ELLIPSOIDAL Mercator (Snyder 1987 eqs. 7-6..
# 7-10), distinct from the spherical web-Mercator 3857 grid the tiles
# live on: northings differ by up to ~35 km mid-latitude, so a 3395
# source needs a real warp, not a passthrough.

_E = float(np.sqrt(_E2))


def world_mercator_forward(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees → EPSG:3395 (easting, northing) metres
    (Snyder 7-6/7-7: x = aλ, y = a·ln[tan(π/4+φ/2)·((1−e·sinφ)/(1+e·sinφ))^{e/2}])."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    esin = _E * np.sin(phi)
    y = _A * np.log(
        np.tan(np.pi / 4.0 + phi / 2.0)
        * ((1.0 - esin) / (1.0 + esin)) ** (_E / 2.0)
    )
    return _A * lam, y


def world_mercator_inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3395 metres → lon/lat degrees (Snyder 7-9/7-10 fixed-point:
    φ = π/2 − 2·atan(t·((1−e·sinφ)/(1+e·sinφ))^{e/2}), t = e^{−y/a}) —
    quadratically convergent; 12 rounds reach float64 round-off
    everywhere inside the Mercator latitude clamp."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    t = np.exp(-y / _A)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(12):
        esin = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - esin) / (1.0 + esin)) ** (_E / 2.0)
        )
    return np.degrees(x / _A), np.degrees(phi)


class WorldMercatorProjection:
    """Pickle-friendly forward/inverse pair for EPSG:3395 — the
    source-CRS adapter ``MercatorWarp`` uses for World Mercator
    GeoTIFFs."""

    epsg = 3395

    def forward(self, lon, lat):
        return world_mercator_forward(lon, lat)

    def inverse(self, x, y):
        return world_mercator_inverse(x, y)
