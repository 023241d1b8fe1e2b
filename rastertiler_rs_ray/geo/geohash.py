"""Geohash encoding (public spec: base32 bit-interleaved lat/lon).

Third member of the cell-index family (quadkey `geo/cell.py`, hex
`geo/hexcell.py`): geohash cells DO nest — a prefix is the containing
parent — so prefix-groupbys give hierarchical density rollups without
any parent arithmetic.

Encode is fully vectorized: integer lon/lat cells by floor scaling,
bit interleave (lon first, MSB first) into one uint64 code, then base32
chars per 5-bit group.  The same floor/clamp/interleave arithmetic is
mirrored term-by-term in the SQL oracles (`_sql_geohash_expr` in
driver_queries builds the identical expression programmatically), so
string equality is exact.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32 = np.frombuffer(BASE32.encode(), dtype=np.uint8)


def geohash_cells(lon, lat, precision: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer (lon_cell, lat_cell) at the geohash bit depths for
    ``precision`` chars: nlon = ceil(5p/2) bits, nlat = floor(5p/2)."""
    nbits = 5 * int(precision)
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon_cell = np.floor((lon + 180.0) / 360.0 * float(1 << nlon))
    lat_cell = np.floor((lat + 90.0) / 180.0 * float(1 << nlat))
    lon_cell = np.clip(lon_cell, 0, (1 << nlon) - 1).astype(np.int64)
    lat_cell = np.clip(lat_cell, 0, (1 << nlat) - 1).astype(np.int64)
    return lon_cell, lat_cell


def geohash_code(lon, lat, precision: int) -> np.ndarray:
    """Packed integer geohash: the 5·precision interleaved bits (lon
    first, MSB first) as int64.  precision ≤ 12."""
    nbits = 5 * int(precision)
    if nbits > 62:
        raise ValueError("precision too large for int64 packing")
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_cell, lat_cell = geohash_cells(lon, lat, precision)
    code = np.zeros(lon_cell.shape, dtype=np.int64)
    # bit position i (0 = MSB of the code): even → next lon bit, odd → lat
    for i in range(nbits):
        if i % 2 == 0:
            src = lon_cell >> np.int64(nlon - 1 - i // 2)
        else:
            src = lat_cell >> np.int64(nlat - 1 - i // 2)
        code |= (src & np.int64(1)) << np.int64(nbits - 1 - i)
    return code


def geohash_encode(lon, lat, precision: int) -> np.ndarray:
    """Vectorized geohash strings (object array of ``precision`` chars)."""
    p = int(precision)
    code = geohash_code(lon, lat, p)
    chars = np.empty((len(code), p), dtype=np.uint8)
    for g in range(p):
        idx = (code >> np.int64(5 * (p - 1 - g))) & np.int64(31)
        chars[:, g] = _B32[idx]
    return chars.view(f"S{p}").ravel().astype(str)
