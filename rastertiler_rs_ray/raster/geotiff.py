"""Pure-Python GeoTIFF reader/writer — the real-raster ingestion path.

Parity targets in the reference:

- ``Dataset::open`` (/root/reference/src/dataset.rs:25-35): open a
  GeoTIFF, optionally ignoring reduced-resolution overviews
  (``OVERVIEW_LEVEL=NONE`` ⇔ ``disable_overviews=True`` here).
- ``Dataset::mercator_vrt`` (/root/reference/src/dataset.rs:74-110):
  nearest-neighbour reprojection view to EPSG:3857 with a
  nodata-initialized destination — ``MercatorWarp`` below implements
  the same semantics for EPSG:4326 and WGS84 UTM (EPSG:326xx/327xx)
  sources, the two most common non-Mercator cases; other CRSs raise.
- ``write_raster`` (/root/reference/src/dataset.rs:199-230): debug
  tiled GTiff writer — ``write_geotiff`` below (LZW like the reference,
  or deflate/none).

Format scope (honestly bounded, classic TIFF 6.0 + BigTIFF):

- single-band (SamplesPerPixel=1), unsigned 8/16/32-bit samples
  (u16 reads fine; the render pipeline rejects it exactly like the
  reference, src/render.rs:43-48);
- tiled or stripped layout; Compression none (1), LZW (5, the
  reference's own write format) or Deflate (8 / 32946); horizontal
  differencing predictor (2) supported on read;
- georeferencing via ModelPixelScale + ModelTiepoint (or
  ModelTransformation), GeoKeyDirectory CRS (EPSG:3857 native,
  EPSG:4326 via MercatorWarp), GDAL_NODATA ascii tag;
- overview IFDs (NewSubfileType bit 0) read and selected GDAL-style
  (finest overview whose decimation factor ≤ the requested one) unless
  ``disable_overviews`` — the reference README documents disabling as
  "more precise results at the expense of slower performance"
  (README.md:62), which is exactly the base-grid path.

BigTIFF (magic 43, 64-bit offsets) reads and writes — the norm for
>4 GiB rasters at the 100-TB design point.  Multi-band, float samples
and exotic codecs are out of scope and raise with a clear message.

The decoded-chunk LRU in ``GeoTiffRaster`` is the actor-warmed "block
cache": TileRenderer actors each hold one open raster and reuse
decoded TIFF tiles across the map batch, mirroring the reference
workers' reopened datasets + reused buffers (src/render.rs:166-190).
"""

from __future__ import annotations

import os
import struct
import zlib
from collections import OrderedDict

import numpy as np

from ..geo import Affine, Bounds, geo_to_mercator, mercator_to_geo
from . import lzw
from .kernel import TileReadMixin, nn_decimation_indices

# TIFF tag ids
_T_NEW_SUBFILE_TYPE = 254
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PX = 277
_T_ROWS_PER_STRIP = 278
_T_PLANAR = 284
_T_STRIP_COUNTS = 279
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_HEIGHT = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_TRANSFORMATION = 34264
_T_GEO_KEYS = 34735
_T_GDAL_NODATA = 42113

# TIFF field types → (struct char, size)
_FIELD = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL
    12: ("d", 8),  # DOUBLE
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),  # SLONG8 (BigTIFF)
    18: ("Q", 8),  # IFD8 (BigTIFF)
}

_GK_MODEL_TYPE = 1024       # 1=projected, 2=geographic
_GK_RASTER_TYPE = 1025      # 1=PixelIsArea
_GK_GEOGRAPHIC_CS = 2048    # 4326
_GK_PROJECTED_CS = 3072     # 3857
_GK_COORD_TRANS = 3075      # ProjCoordTransGeoKey (8=LCC2SP, 11=Albers)
_T_GEO_DOUBLES = 34736      # GeoDoubleParamsTag
_GK_USER_DEFINED = 32767


def _read_ifds(data):
    """Parse the IFD chain → (byteorder, [dict tag → value-list]).

    Handles both classic TIFF (magic 42: u32 offsets, 12-byte entries)
    and BigTIFF (magic 43: u64 offsets, 20-byte entries) — BigTIFF is
    the norm for >4 GiB rasters at the 100-TB design point.
    """
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    magic = struct.unpack(bo + "H", data[2:4])[0]
    if magic == 42:
        big = False
        off = struct.unpack(bo + "I", data[4:8])[0]
    elif magic == 43:
        big = True
        offsize, zero = struct.unpack(bo + "HH", data[4:8])
        if offsize != 8 or zero != 0:
            raise ValueError(f"malformed BigTIFF header (offsize {offsize})")
        off = struct.unpack(bo + "Q", data[8:16])[0]
    else:
        raise ValueError(f"not a TIFF file (magic {magic})")
    # entry layout: (count-size char, entry bytes, inline-value budget)
    cnt_ch, entry_sz, inline = ("Q", 20, 8) if big else ("I", 12, 4)
    nsz = 8 if big else 2
    n_ch = "Q" if big else "H"
    ifds = []
    while off:
        n = struct.unpack(bo + n_ch, data[off : off + nsz])[0]
        tags: dict[int, list] = {}
        for i in range(n):
            e = off + nsz + entry_sz * i
            tag, ftype = struct.unpack(bo + "HH", data[e : e + 4])
            count = struct.unpack(bo + cnt_ch, data[e + 4 : e + 4 + (8 if big else 4)])[0]
            if ftype not in _FIELD:
                continue
            ch, sz = _FIELD[ftype]
            total = sz * count
            vpos = e + 4 + (8 if big else 4)
            if total <= inline:
                raw = data[vpos : vpos + total]
            else:
                voff = struct.unpack(bo + ("Q" if big else "I"), data[vpos : vpos + inline])[0]
                raw = data[voff : voff + total]
            if ftype == 2:  # ASCII
                tags[tag] = [raw.split(b"\0")[0].decode("ascii", "replace")]
            elif ftype == 5:  # RATIONAL
                vals = struct.unpack(bo + "I" * (2 * count), raw)
                tags[tag] = [vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(count)]
            else:
                tags[tag] = list(struct.unpack(bo + ch * count, raw))
        ifds.append(tags)
        npos = off + nsz + entry_sz * n
        off = struct.unpack(bo + ("Q" if big else "I"), data[npos : npos + (8 if big else 4)])[0]
    return bo, ifds


def _geokeys(tags: dict) -> dict[int, "int | float"]:
    gk = tags.get(_T_GEO_KEYS)
    if not gk:
        return {}
    doubles = tags.get(_T_GEO_DOUBLES, [])
    out = {}
    n = gk[3]
    for i in range(1, n + 1):
        key_id, loc, count, value = gk[4 * i : 4 * i + 4]
        if loc == 0:  # inline SHORT value
            out[key_id] = value
        elif loc == _T_GEO_DOUBLES and value + count <= len(doubles):
            # projection parameters (std parallels, origins, false e/n)
            out[key_id] = (
                doubles[value] if count == 1
                else list(doubles[value : value + count])
            )
    return out


class _Ifd:
    """One resolution level (main image or overview)."""

    def __init__(self, tags: dict, np_dtype, bo: str):
        self.tags = tags
        self.width = int(tags[_T_WIDTH][0])
        self.height = int(tags[_T_HEIGHT][0])
        self.dtype = np_dtype
        self.bo = bo
        # Multi-band layout: band 1 is selected at decode time
        # (ref src/dataset.rs:112-114 / src/render.rs:34 — GDAL opens
        # multi-band files and the renderer reads band 1 only).
        self.spp = int(tags.get(_T_SAMPLES_PER_PX, [1])[0])
        self.planar = int(tags.get(_T_PLANAR, [1])[0])
        if self.planar not in (1, 2):
            raise NotImplementedError(f"TIFF planar configuration {self.planar}")
        if self.spp > 1 and self.planar == 1 and len(set(tags[_T_BITS])) != 1:
            raise NotImplementedError(
                "chunky multi-band TIFF with per-band bit depths"
            )
        self.compression = int(tags.get(_T_COMPRESSION, [1])[0])
        if self.compression not in (1, 5, 8, 32946):
            raise NotImplementedError(
                f"TIFF compression {self.compression} unsupported "
                "(none/LZW/deflate only)"
            )
        self.predictor = int(tags.get(_T_PREDICTOR, [1])[0])
        if self.predictor not in (1, 2):
            raise NotImplementedError(f"TIFF predictor {self.predictor} unsupported")
        if _T_TILE_OFFSETS in tags:
            self.tiled = True
            self.cw = int(tags[_T_TILE_WIDTH][0])
            self.ch = int(tags[_T_TILE_HEIGHT][0])
            self.offsets = tags[_T_TILE_OFFSETS]
            self.counts = tags[_T_TILE_COUNTS]
        else:
            self.tiled = False
            self.cw = self.width
            self.ch = int(tags.get(_T_ROWS_PER_STRIP, [self.height])[0])
            self.offsets = tags[_T_STRIP_OFFSETS]
            self.counts = tags[_T_STRIP_COUNTS]
        self.nchunks_x = -(-self.width // self.cw)
        self.nchunks_y = -(-self.height // self.ch)


class GeoTiffRaster(TileReadMixin):
    """A single-band EPSG:3857 GeoTIFF with the engine's raster API
    (``dtype``/``nodata``/``bounds()``/``read_tile``/``spec``).

    ``disable_overviews`` forces every read onto the base grid
    (⇔ the reference CLI's ``--disable-overviews``, src/main.rs:82-85).
    """

    def __init__(self, path: str, *, disable_overviews: bool = False, cache_chunks: int = 256):
        self.path = path
        self.disable_overviews = bool(disable_overviews)
        # mmap, not read(): every TileRenderer actor opens its own
        # GeoTiffRaster, so a full read() would duplicate the file in
        # each actor's heap — the mapping shares one page-cached copy
        # and chunk decodes slice only the bytes they touch.
        import mmap

        self._file = open(path, "rb")
        try:
            self._data = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):  # zero-length or mmap-less fs
            self._data = self._file.read()
        bo, ifds = _read_ifds(self._data)
        if not ifds:
            raise ValueError(f"{path}: no IFDs")
        main = ifds[0]
        # Multi-band files open fine — band 1 is selected at chunk
        # decode (parity with ref src/dataset.rs:112-114: GDAL opens the
        # dataset, src/render.rs:34 reads band 1).
        self.samples_per_px = int(main.get(_T_SAMPLES_PER_PX, [1])[0])
        bits = int(main[_T_BITS][0])
        fmt = int(main.get(_T_SAMPLE_FORMAT, [1])[0])
        if fmt != 1:
            raise NotImplementedError(f"{path}: only unsigned integer samples (format {fmt})")
        try:
            np_dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]
        except KeyError:
            raise NotImplementedError(f"{path}: {bits}-bit samples unsupported")
        self.dtype = np.dtype(np_dtype).name
        self._np_dtype = np_dtype

        self._main = _Ifd(main, np_dtype, bo)
        self.width, self.height = self._main.width, self._main.height
        # overview chain: reduced-resolution IFDs (NewSubfileType bit 0)
        self._overviews = [
            _Ifd(t, np_dtype, bo)
            for t in ifds[1:]
            if int(t.get(_T_NEW_SUBFILE_TYPE, [0])[0]) & 1
        ]

        nd = main.get(_T_GDAL_NODATA)
        self.nodata = int(float(nd[0])) if nd else 0

        self.transform = self._parse_transform(main)
        gk = _geokeys(main)
        self.geokeys = gk
        self.crs_epsg = int(
            gk.get(_GK_PROJECTED_CS) or gk.get(_GK_GEOGRAPHIC_CS) or 0
        )

        self._cache: OrderedDict[tuple, np.ndarray] = OrderedDict()
        self._cache_cap = int(cache_chunks)

    @staticmethod
    def _parse_transform(tags: dict) -> Affine:
        if _T_TRANSFORMATION in tags:
            m = tags[_T_TRANSFORMATION]  # 4×4 row-major
            return Affine(m[0], m[1], m[3], m[4], m[5], m[7])
        if _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
            sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
            i, j, _k, x, y, _z = tags[_T_TIEPOINT][:6]
            return Affine(sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
        raise ValueError("GeoTIFF lacks ModelPixelScale+Tiepoint / ModelTransformation")

    def bounds(self) -> Bounds:
        t = self.transform
        return Bounds(
            xmin=t.c, ymin=t.f + t.e * self.height, xmax=t.c + t.a * self.width, ymax=t.f
        )

    # -- chunk decode ---------------------------------------------------
    def _chunk(self, ifd: _Ifd, cy: int, cx: int) -> np.ndarray:
        key = (id(ifd), cy, cx)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        # planar=2 stores each band's chunk planes consecutively
        # (TIFF 6.0: NumberOfStrips = SamplesPerPixel × StripsPerImage,
        # plane-major) — band 1 occupies the FIRST nchunks entries, so
        # the index needs no adjustment; planar=1 interleaves samples
        # within each chunk and band 1 is every spp-th sample.
        idx = cy * ifd.nchunks_x + cx
        off, cnt = int(ifd.offsets[idx]), int(ifd.counts[idx])
        raw = self._data[off : off + cnt]
        nsamp = ifd.spp if ifd.planar == 1 else 1
        if ifd.compression in (8, 32946):
            raw = zlib.decompress(raw)
        elif ifd.compression == 5:
            itemsz = np.dtype(ifd.dtype).itemsize
            raw = lzw.decode(bytes(raw), max_size=ifd.cw * ifd.ch * itemsz * nsamp)
        # strips may be short on the last row band; tiles are full-size
        rows = ifd.ch if ifd.tiled else min(ifd.ch, ifd.height - cy * ifd.ch)
        arr = np.frombuffer(raw, dtype=ifd.dtype, count=rows * ifd.cw * nsamp).reshape(
            rows, ifd.cw, nsamp
        )
        if ifd.bo == ">":
            arr = arr.byteswap().view(arr.dtype)
        if ifd.predictor == 2:
            # horizontal differencing is PER COMPONENT (adjacent pixels'
            # same-channel samples) — cumsum along the pixel axis of the
            # (rows, cols, samples) cube handles both layouts.
            arr = np.cumsum(
                arr.astype(np.uint64), axis=1, dtype=np.uint64
            ).astype(ifd.dtype)
        arr = np.ascontiguousarray(arr[:, :, 0])
        self._cache[key] = arr
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)
        return arr

    def _gather(self, ifd: _Ifd, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """Gather pixel values at (rows, cols) index grids on ``ifd``'s grid."""
        cols, rows = np.broadcast_arrays(cols, rows)
        cols = np.clip(cols, 0, ifd.width - 1).astype(np.int64)
        rows = np.clip(rows, 0, ifd.height - 1).astype(np.int64)
        out = np.empty(cols.shape, dtype=ifd.dtype)
        cx = cols // ifd.cw
        cy = rows // ifd.ch
        for key in np.unique(cy.astype(np.int64) * ifd.nchunks_x + cx.astype(np.int64)):
            tcy, tcx = int(key) // ifd.nchunks_x, int(key) % ifd.nchunks_x
            m = (cx == tcx) & (cy == tcy)
            chunk = self._chunk(ifd, tcy, tcx)
            rr = np.minimum(rows[m] - tcy * ifd.ch, chunk.shape[0] - 1)
            cc = np.minimum(cols[m] - tcx * ifd.cw, chunk.shape[1] - 1)
            out[m] = chunk[rr, cc]
        return out

    def values_at(self, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
        return self._gather(self._main, np.asarray(cols), np.asarray(rows))

    # -- overview-aware decimated read ---------------------------------
    def read_decimated(
        self, x_off: int, y_off: int, read_w: int, read_h: int, out_w: int, out_h: int
    ) -> np.ndarray:
        decim = min(read_w / out_w, read_h / out_h)
        ifd = self._main
        factor = 1.0
        if not self.disable_overviews and decim >= 2.0:
            for ov in self._overviews:
                f = self.width / ov.width
                if f <= decim and f > factor:
                    ifd, factor = ov, f
        if ifd is self._main:
            # gather only unique source pixels, expand by narrow-dtype
            # fancy-index (same DRAM-traffic fix as TileReadMixin: an
            # oversampled tile repeats each source pixel out/read times)
            jj = nn_decimation_indices(out_w, read_w)
            ii = nn_decimation_indices(out_h, read_h)
            uj, jinv = np.unique(jj, return_inverse=True)
            ui, iinv = np.unique(ii, return_inverse=True)
            vals = self._gather(ifd, (x_off + uj)[None, :], (y_off + ui)[:, None])
            return vals[iinv][:, jinv]
        # map the request onto the overview grid, NN there (GDAL-style:
        # coarser grid, cheaper read, slightly less precise — exactly the
        # tradeoff --disable-overviews turns off)
        ox = x_off / factor
        oy = y_off / factor
        ow = read_w / factor
        oh = read_h / factor
        jj = np.minimum(
            (ox + (np.arange(out_w, dtype=np.float64) + 0.5) * ow / out_w).astype(np.int64),
            ifd.width - 1,
        )
        ii = np.minimum(
            (oy + (np.arange(out_h, dtype=np.float64) + 0.5) * oh / out_h).astype(np.int64),
            ifd.height - 1,
        )
        return self._gather(ifd, jj[None, :], ii[:, None])

    def spec(self) -> dict:
        return {
            "kind": "geotiff",
            "path": self.path,
            "dtype": self.dtype,
            "nodata": self.nodata,
            "disable_overviews": self.disable_overviews,
        }

    @staticmethod
    def from_spec(spec: dict) -> "GeoTiffRaster":
        return GeoTiffRaster(
            spec["path"], disable_overviews=spec.get("disable_overviews", False)
        )


_MAX_LAT = 85.051129  # reference's Mercator clamp (src/tileid.rs:23-27)


class MercatorWarp(TileReadMixin):
    """Lazy nearest-neighbour reprojection view onto EPSG:3857.

    Semantics parity with the reference's warped VRT
    (src/dataset.rs:74-110, ``GDALAutoCreateWarpedVRT`` — which accepts
    ANY source CRS): nearest-neighbour only, destination initialized to
    nodata (pixels mapping outside the source stay nodata).  The output
    grid spans the source's Mercator bounds at a resolution preserving
    the source pixel count along x (a simplified
    GDALSuggestedWarpOutput).

    Supported source CRSs: EPSG:4326 (source grid in degrees), the
    WGS84 UTM zones EPSG:326xx/327xx (transverse-Mercator metres via
    ``geo.tmerc``) and EPSG:3395 World Mercator (ellipsoidal Mercator
    metres) — the most common real-world cases after native 3857;
    anything else raises.
    """

    def __init__(self, src: GeoTiffRaster):
        from ..geo.tmerc import UtmProjection, WorldMercatorProjection

        if src.crs_epsg == 4326:
            self._proj = None  # source grid is already degrees
        elif src.crs_epsg == 3395:
            # ellipsoidal World Mercator: same axes as 3857 but real
            # warp — mid-latitude northings differ by tens of km
            self._proj = WorldMercatorProjection()
        elif (
            src.crs_epsg == _GK_USER_DEFINED
            and _GK_COORD_TRANS in getattr(src, "geokeys", {})
        ):
            # user-defined projected CRS with explicit parameters
            # (LCC 2SP / Albers — the state-plane/national-grid tier)
            from ..geo.conic import conic_from_geokeys

            self._proj = conic_from_geokeys(
                int(src.geokeys[_GK_COORD_TRANS]), src.geokeys
            )
        else:
            self._proj = UtmProjection(src.crs_epsg)  # raises if not UTM
        self.src = src
        sb = src.bounds()  # source-CRS units
        if self._proj is None:
            lat_lo = max(sb.ymin, -_MAX_LAT)
            lat_hi = min(sb.ymax, _MAX_LAT)
            lon_lo = max(sb.xmin, -180.0)
            lon_hi = min(sb.xmax, 180.0)
        else:
            # projected source: the geographic bbox of a projected
            # rectangle is NOT its corners' bbox (meridian convergence
            # bows the edges) — densify the boundary and take extremes
            k = 65
            ex = np.linspace(sb.xmin, sb.xmax, k)
            ny = np.linspace(sb.ymin, sb.ymax, k)
            bx = np.concatenate([ex, ex, np.full(k, sb.xmin), np.full(k, sb.xmax)])
            by = np.concatenate([np.full(k, sb.ymin), np.full(k, sb.ymax), ny, ny])
            blon, blat = self._proj.inverse(bx, by)
            lon_lo, lon_hi = float(blon.min()), float(blon.max())
            lat_lo = max(float(blat.min()), -_MAX_LAT)
            lat_hi = min(float(blat.max()), _MAX_LAT)
        mx0, my0 = geo_to_mercator(np.float64(lon_lo), np.float64(lat_lo))
        mx1, my1 = geo_to_mercator(np.float64(lon_hi), np.float64(lat_hi))
        res = (float(mx1) - float(mx0)) / src.width
        self.width = src.width
        self.height = max(int(round((float(my1) - float(my0)) / res)), 1)
        self.transform = Affine(res, 0.0, float(mx0), 0.0, -res, float(my1))
        self.dtype = src.dtype
        self.nodata = src.nodata

    def bounds(self) -> Bounds:
        t = self.transform
        return Bounds(
            xmin=t.c, ymin=t.f + t.e * self.height, xmax=t.c + t.a * self.width, ymax=t.f
        )

    def values_at(self, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
        cols, rows = np.broadcast_arrays(np.asarray(cols), np.asarray(rows))
        t = self.transform
        mx = t.c + (cols.astype(np.float64) + 0.5) * t.a
        my = t.f + (rows.astype(np.float64) + 0.5) * t.e
        lon, lat = mercator_to_geo(mx, my)
        if self._proj is None:
            ux, uy = lon, lat  # source grid is degrees
        else:
            ux, uy = self._proj.forward(lon, lat)
        st = self.src.transform
        inv = st.invert()
        fx, fy = inv.multiply(ux, uy)
        sx = np.floor(fx).astype(np.int64)
        sy = np.floor(fy).astype(np.int64)
        inside = (sx >= 0) & (sx < self.src.width) & (sy >= 0) & (sy < self.src.height)
        out = np.full(cols.shape, self.nodata, dtype=self.src._np_dtype)
        if inside.any():
            out[inside] = self.src.values_at(sx[inside], sy[inside])
        return out

    def spec(self) -> dict:
        s = self.src.spec()
        s["kind"] = "warped_geotiff"
        return s

    @staticmethod
    def from_spec(spec: dict) -> "MercatorWarp":
        return MercatorWarp(
            GeoTiffRaster(
                spec["path"], disable_overviews=spec.get("disable_overviews", False)
            )
        )


def open_raster(path: str, *, disable_overviews: bool = False):
    """``Dataset::open`` + ``mercator_vrt`` equivalent: open a GeoTIFF
    and return a Mercator-grid raster (warping EPSG:4326 on the fly;
    ref src/dataset.rs:25-35 + 74-110)."""
    r = GeoTiffRaster(path, disable_overviews=disable_overviews)
    if r.crs_epsg == 3857:
        return r
    from ..geo.conic import CT_ALBERS_EQUAL_AREA, CT_LAMBERT_CONF_CONIC_2SP

    conic_ok = r.crs_epsg == _GK_USER_DEFINED and r.geokeys.get(
        _GK_COORD_TRANS
    ) in (CT_LAMBERT_CONF_CONIC_2SP, CT_ALBERS_EQUAL_AREA)
    if r.crs_epsg in (4326, 3395) or r.crs_epsg // 100 in (326, 327) or conic_ok:
        return MercatorWarp(r)
    raise NotImplementedError(
        f"{path}: CRS EPSG:{r.crs_epsg} unsupported "
        "(3857 native; 4326, 3395, WGS84 UTM zones and parameterized "
        "LCC-2SP/Albers warped)"
    )


# ---------------------------------------------------------------- writer


def _nn_downsample(arr: np.ndarray, factor: int) -> np.ndarray:
    """gdaladdo -r nearest equivalent: center-of-target NN decimation."""
    h = max(arr.shape[0] // factor, 1)
    w = max(arr.shape[1] // factor, 1)
    ii = nn_decimation_indices(h, arr.shape[0])
    jj = nn_decimation_indices(w, arr.shape[1])
    return arr[ii[:, None], jj[None, :]]


def write_geotiff(
    path: str,
    array: np.ndarray,
    transform: Affine,
    *,
    nodata: int | None = None,
    crs_epsg: int = 3857,
    tile_size: int = 256,
    compression: str = "deflate",
    overview_factors: tuple[int, ...] = (),
    bigtiff: bool | None = None,
    projection: dict | None = None,
    _sparse_offset: int = 0,
) -> None:
    """Write a single-band tiled GeoTIFF (little-endian), streaming tile
    data straight to the file (no whole-body buffer — >4 GiB outputs
    never sit in memory twice).

    The debug-writer parity point (ref src/dataset.rs:199-230 writes
    tiled LZW 256² blocks — ``compression="lzw"`` matches it; deflate
    and none also supported), plus optional NN overview IFDs
    (``overview_factors`` e.g. (2, 4, 8)).

    ``bigtiff``: True forces the BigTIFF (magic 43, 64-bit offsets)
    layout, False forces classic (raises if the body outgrows u32
    offsets), None (default) picks BigTIFF automatically when the
    uncompressed payload could exceed 4 GiB.

    ``_sparse_offset`` (tests only): seek this many bytes past the
    header before the first tile, leaving a filesystem hole — lets a
    test place real tile data beyond the 4 GiB boundary (genuine 64-bit
    offsets) without paying 4 GiB of I/O.
    """
    if array.ndim == 3:
        # chunky (PlanarConfiguration=1) multi-band: samples interleave
        # within each tile; the READ path selects band 1 (parity with
        # ref src/render.rs:34) — the writer exists to author multi-band
        # fixtures.  Overview generation stays single-band-only.
        if overview_factors:
            raise ValueError("overviews unsupported for multi-band writes")
    elif array.ndim != 2:
        raise ValueError("write_geotiff expects a 2-D or 3-D (h,w,bands) array")
    if array.dtype not in (np.uint8, np.uint16, np.uint32):
        raise ValueError(f"unsupported dtype {array.dtype}")
    comp_code = {"none": 1, "deflate": 8, "lzw": 5}[compression]

    levels = [(array, 0)] + [(_nn_downsample(array, f), 1) for f in overview_factors]

    ts = tile_size
    n_bands = array.shape[2] if array.ndim == 3 else 1
    if bigtiff is None:
        # worst case: padded tiles, incompressible data
        worst = _sparse_offset + sum(
            (-(-a.shape[0] // ts)) * (-(-a.shape[1] // ts)) * ts * ts
            * a.dtype.itemsize * n_bands
            for a, _ in levels
        )
        bigtiff = worst >= (1 << 32) - (1 << 20)
    header_len = 16 if bigtiff else 8

    with open(path, "wb") as f:
        if bigtiff:
            f.write(b"II" + struct.pack("<HHHQ", 43, 8, 0, 0))  # IFD0 patched later
        else:
            f.write(b"II" + struct.pack("<HI", 42, 0))
        assert f.tell() == header_len
        if _sparse_offset:
            f.seek(header_len + _sparse_offset)

        # ---- stream tile payloads, recording offsets/counts per level
        level_chunks = []
        for arr, _sub in levels:
            a3 = arr if arr.ndim == 3 else arr[:, :, None]
            h, w = a3.shape[:2]
            offs, cnts = [], []
            for ty in range(-(-h // ts)):
                for tx in range(-(-w // ts)):
                    tile = np.full((ts, ts, a3.shape[2]), 0, dtype=arr.dtype)
                    ys, xs = ty * ts, tx * ts
                    sub = a3[ys : ys + ts, xs : xs + ts]
                    tile[: sub.shape[0], : sub.shape[1]] = sub
                    raw = tile.tobytes()
                    if comp_code == 8:
                        raw = zlib.compress(raw, 6)
                    elif comp_code == 5:
                        raw = lzw.encode(raw)
                    offs.append(f.tell())
                    cnts.append(len(raw))
                    f.write(raw)
            level_chunks.append((offs, cnts))
        if not bigtiff and f.tell() >= (1 << 32):
            raise ValueError(
                "classic TIFF offsets overflow 4 GiB — pass bigtiff=True"
            )

        # ---- geo payloads (main IFD only)
        geo_doubles: list[float] = []
        if projection is not None:
            # user-defined projected CRS with explicit parameters
            # (WGS84 datum): kind 'lcc2sp' or 'albers2sp' plus
            # lat1/lat2/lat0/lon0/fe/fn — written as GeoDoubleParams
            ct = {"lcc2sp": 8, "albers2sp": 11}[projection["kind"]]
            dbl_keys = [
                (3078, float(projection["lat1"])),
                (3079, float(projection.get("lat2", projection["lat1"]))),
                (3084, float(projection.get("lon0", 0.0))),
                (3085, float(projection.get("lat0", 0.0))),
                (3086, float(projection.get("fe", 0.0))),
                (3087, float(projection.get("fn", 0.0))),
            ]
            nkeys = 5 + len(dbl_keys)
            geokeys = [1, 1, 0, nkeys,
                       _GK_MODEL_TYPE, 0, 1, 1,
                       _GK_RASTER_TYPE, 0, 1, 1,
                       _GK_GEOGRAPHIC_CS, 0, 1, 4326,
                       _GK_PROJECTED_CS, 0, 1, _GK_USER_DEFINED,
                       _GK_COORD_TRANS, 0, 1, ct]
            for key_id, val in dbl_keys:
                geokeys += [key_id, _T_GEO_DOUBLES, 1, len(geo_doubles)]
                geo_doubles.append(val)
        else:
            gk_model = 1 if crs_epsg != 4326 else 2
            geokeys = [
                1, 1, 0, 3, _GK_MODEL_TYPE, 0, 1, gk_model, _GK_RASTER_TYPE, 0, 1, 1
            ]
            geokeys += [
                _GK_PROJECTED_CS if crs_epsg != 4326 else _GK_GEOGRAPHIC_CS,
                0, 1, crs_epsg,
            ]
        pixel_scale = [transform.a, -transform.e, 0.0]
        tiepoint = [0.0, 0.0, 0.0, transform.c, transform.f, 0.0]
        nodata_ascii = (str(int(nodata)) + "\0").encode() if nodata is not None else None
        bits = array.dtype.itemsize * 8
        off_type = 16 if bigtiff else 4  # LONG8 vs LONG for offset arrays

        def build_ifd(level_i: int):
            arr, sub = levels[level_i]
            offs, cnts = level_chunks[level_i]
            h, w = arr.shape[:2]
            entries = []  # (tag, type, count, payload bytes)

            def add(tag, ftype, values):
                ch, _sz = _FIELD[ftype]
                if ftype == 2:
                    payload = values  # bytes
                    count = len(payload)
                else:
                    count = len(values)
                    payload = struct.pack("<" + ch * count, *values)
                entries.append((tag, ftype, count, payload))

            if sub:
                add(_T_NEW_SUBFILE_TYPE, 4, [1])
            add(_T_WIDTH, 4, [w])
            add(_T_HEIGHT, 4, [h])
            add(_T_BITS, 3, [bits] * n_bands)
            add(_T_COMPRESSION, 3, [comp_code])
            add(_T_PHOTOMETRIC, 3, [2 if n_bands >= 3 else 1])
            add(_T_SAMPLES_PER_PX, 3, [n_bands])
            if n_bands > 1:
                add(_T_PLANAR, 3, [1])
            add(_T_TILE_WIDTH, 3, [tile_size])
            add(_T_TILE_HEIGHT, 3, [tile_size])
            add(_T_TILE_OFFSETS, off_type, offs)
            add(_T_TILE_COUNTS, 4, cnts)
            add(_T_SAMPLE_FORMAT, 3, [1] * n_bands)
            if level_i == 0:
                add(_T_PIXEL_SCALE, 12, pixel_scale)
                add(_T_TIEPOINT, 12, tiepoint)
                add(_T_GEO_KEYS, 3, geokeys)
                if geo_doubles:
                    add(_T_GEO_DOUBLES, 12, geo_doubles)
                if nodata_ascii:
                    add(_T_GDAL_NODATA, 2, nodata_ascii)
            entries.sort(key=lambda e: e[0])
            return entries

        # ---- IFD chain (classic: u16 count, 12-byte entries, u32 next;
        #      BigTIFF: u64 count, 20-byte entries, u64 next)
        nsz, entry_sz, inline = (8, 20, 8) if bigtiff else (2, 12, 4)
        n_fmt, p_fmt = ("<Q", "<Q") if bigtiff else ("<H", "<I")
        cnt_fmt = "<Q" if bigtiff else "<I"
        prev_next_pos = 8 if bigtiff else 4  # header's IFD0 pointer
        for li in range(len(levels)):
            entries = build_ifd(li)
            ifd_off = f.tell()
            f.seek(prev_next_pos)
            f.write(struct.pack(p_fmt, ifd_off))
            f.seek(ifd_off)
            n = len(entries)
            ifd = bytearray(struct.pack(n_fmt, n))
            extra_off = ifd_off + nsz + entry_sz * n + (8 if bigtiff else 4)
            extra = bytearray()
            for tag, ftype, count, payload in entries:
                ifd += struct.pack("<HH", tag, ftype) + struct.pack(cnt_fmt, count)
                if len(payload) <= inline:
                    ifd += payload.ljust(inline, b"\0")
                else:
                    ifd += struct.pack(p_fmt, extra_off + len(extra))
                    extra += payload
            prev_next_pos = ifd_off + nsz + entry_sz * n
            ifd += struct.pack(p_fmt, 0)  # next-IFD pointer (patched by next level)
            f.write(ifd + extra)


def write_raster_debug(
    path: str, raster, *, tile_size: int = 256, overview_factors: tuple[int, ...] = ()
) -> None:
    """S3 parity helper: dump a whole in-engine raster to GeoTIFF
    (ref ``write_raster`` src/dataset.rs:199-230)."""
    full = raster.values_at(
        np.arange(raster.width)[None, :], np.arange(raster.height)[:, None]
    )
    write_geotiff(
        path,
        full,
        raster.transform,
        nodata=raster.nodata,
        tile_size=tile_size,
        overview_factors=overview_factors,
    )
