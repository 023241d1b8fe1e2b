"""Conic projections: Lambert Conformal Conic (2SP) and Albers Equal
Area (2SP), ellipsoidal forms — Snyder 1987 (USGS PP 1395), LCC eqs.
15-1..15-11, Albers eqs. 14-1..14-21 with the 3-16 latitude iteration.

These cover the state-plane / national-grid families the reference
warps through GDAL (``GDALAutoCreateWarpedVRT`` accepts any CRS,
/root/reference/src/dataset.rs:74-110) that aren't UTM: most U.S.
state planes are LCC or TM, continental grids (e.g. Canada LCC,
US National Atlas Albers) are conic.  GeoTIFFs carry these as
user-defined projected CRS with explicit GeoDoubleParams — the
reader surfaces them as a parameter dict and ``open_raster`` builds
one of these adapters for the Mercator warp.

Everything is vectorized float64 numpy; the inverse latitude solvers
are the standard fixed-point forms (conformal for LCC, Snyder 3-16
for Albers), quadratically convergent inside ±89.9°.
"""

from __future__ import annotations

import numpy as np

# WGS84 (matches geo.tmerc; conic fixtures in this repo are WGS84 —
# the datum is a constructor parameter for completeness/tests)
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def _msincos(phi: np.ndarray, e2: float) -> np.ndarray:
    """Snyder 14-15 / 15-1: m = cosφ / sqrt(1 − e² sin²φ)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _tsnyder(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder 15-9: t = tan(π/4 − φ/2) / ((1−e sinφ)/(1+e sinφ))^{e/2}."""
    esin = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - esin) / (1.0 + esin)
    ) ** (e / 2.0)


def _phi_from_t(t: np.ndarray, e: float, rounds: int = 12) -> np.ndarray:
    """Invert Snyder 15-9 by the conformal fixed point (Snyder 7-9)."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(rounds):
        esin = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - esin) / (1.0 + esin)) ** (e / 2.0)
        )
    return phi


def _qsnyder(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder 3-12: q = (1−e²)[sinφ/(1−e²sin²φ) − ln((1−e sinφ)/(1+e sinφ))/(2e)]."""
    e2 = e * e
    s = np.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e)
    )


class LambertConformalConic:
    """Ellipsoidal LCC 2SP (Snyder 15-1..15-11), pickle-friendly.

    Parameters in degrees / metres: standard parallels ``lat1``/``lat2``,
    false-origin latitude/longitude ``lat0``/``lon0``, false easting/
    northing ``fe``/``fn``.
    """

    def __init__(
        self, lat1: float, lat2: float, lat0: float, lon0: float,
        fe: float = 0.0, fn: float = 0.0,
        a: float = _WGS84_A, f: float = _WGS84_F,
    ):
        self.params = (lat1, lat2, lat0, lon0, fe, fn, a, f)
        self.a, self.e2 = float(a), f * (2.0 - f)
        self.e = float(np.sqrt(self.e2))
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        p1, p2, p0 = np.radians([lat1, lat2, lat0]).astype(np.float64)
        m1, m2 = _msincos(p1, self.e2), _msincos(p2, self.e2)
        t1, t2, t0 = (_tsnyder(p, self.e) for p in (p1, p2, p0))
        if abs(lat1 - lat2) < 1e-12:
            self.n = float(np.sin(p1))
        else:
            self.n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
        self.F = float(m1 / (self.n * t1 ** self.n))
        self.rho0 = float(self.a * self.F * t0 ** self.n)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = self.a * self.F * _tsnyder(phi, self.e) ** self.n
        th = self.n * lam
        return (
            self.fe + rho * np.sin(th),
            self.fn + self.rho0 - rho * np.cos(th),
        )

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.fe
        y = np.asarray(y, dtype=np.float64) - self.fn
        sgn = 1.0 if self.n >= 0 else -1.0
        dy = self.rho0 - y
        rho = sgn * np.sqrt(x * x + dy * dy)
        th = np.arctan2(sgn * x, sgn * dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        phi = _phi_from_t(t, self.e)
        lam = th / self.n + np.radians(self.lon0)
        return np.degrees(lam), np.degrees(phi)


class AlbersEqualArea:
    """Ellipsoidal Albers 2SP (Snyder 14-1..14-21), pickle-friendly."""

    def __init__(
        self, lat1: float, lat2: float, lat0: float, lon0: float,
        fe: float = 0.0, fn: float = 0.0,
        a: float = _WGS84_A, f: float = _WGS84_F,
    ):
        self.params = (lat1, lat2, lat0, lon0, fe, fn, a, f)
        self.a, self.e2 = float(a), f * (2.0 - f)
        self.e = float(np.sqrt(self.e2))
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        p1, p2, p0 = np.radians([lat1, lat2, lat0]).astype(np.float64)
        m1, m2 = _msincos(p1, self.e2), _msincos(p2, self.e2)
        q1, q2, q0 = (_qsnyder(p, self.e) for p in (p1, p2, p0))
        if abs(lat1 - lat2) < 1e-12:
            self.n = float(np.sin(p1))
        else:
            self.n = float((m1 * m1 - m2 * m2) / (q2 - q1))
        self.C = float(m1 * m1 + self.n * q1)
        self.rho0 = float(self.a * np.sqrt(self.C - self.n * q0) / self.n)

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = _qsnyder(phi, self.e)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * lam
        return (
            self.fe + rho * np.sin(th),
            self.fn + self.rho0 - rho * np.cos(th),
        )

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.fe
        y = np.asarray(y, dtype=np.float64) - self.fn
        dy = self.rho0 - y
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.sqrt(x * x + dy * dy)
        th = np.arctan2(sgn * x, sgn * dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        lam = th / self.n + np.radians(self.lon0)
        # Snyder 3-16 iteration from φ = asin(q/2)
        e, e2 = self.e, self.e2
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(12):
            s = np.sin(phi)
            om = 1.0 - e2 * s * s
            phi = phi + (om * om / (2.0 * np.cos(phi) * (1.0 - e2))) * (
                q / (1.0 - e2)
                - s / om
                + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e)
            )
        return np.degrees(lam), np.degrees(phi)


#: GeoTIFF ProjCoordTransGeoKey (3075) codes → adapter class
CT_LAMBERT_CONF_CONIC_2SP = 8
CT_ALBERS_EQUAL_AREA = 11


def conic_from_geokeys(ct_code: int, p: dict) -> "LambertConformalConic | AlbersEqualArea":
    """Build a conic adapter from GeoTIFF projection-parameter geokeys
    (already resolved to floats by ``raster.geotiff._geokeys``): std
    parallels 3078/3079, false-origin lat/lon 3085/3084 (or natural
    origin 3081/3080), false easting/northing 3086/3082 / 3087/3083."""
    lat1 = float(p[3078])
    lat2 = float(p.get(3079, p[3078]))
    lat0 = float(p.get(3085, p.get(3081, 0.0)))
    lon0 = float(p.get(3084, p.get(3080, 0.0)))
    fe = float(p.get(3086, p.get(3082, 0.0)))
    fn = float(p.get(3087, p.get(3083, 0.0)))
    if ct_code == CT_LAMBERT_CONF_CONIC_2SP:
        return LambertConformalConic(lat1, lat2, lat0, lon0, fe, fn)
    if ct_code == CT_ALBERS_EQUAL_AREA:
        return AlbersEqualArea(lat1, lat2, lat0, lon0, fe, fn)
    raise NotImplementedError(f"GeoTIFF coordinate transformation code {ct_code}")
