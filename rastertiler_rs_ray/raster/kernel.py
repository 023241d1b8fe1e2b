"""The shared tile-read kernel (M17) as a mixin.

``read_tile`` reproduces the reference's core kernel
(/root/reference/src/dataset.rs:121-196) arithmetic exactly: window
from tile mercator bounds, per-tile transform scaled to tilesize,
edge paddings via rounded bound differences, clamped read window,
``(+0.5).floor()`` read sizes, nearest-neighbour decimation, all-nodata
skip, and partial-tile placement with nodata backfill (the
allocate-and-place equivalent of src/array.rs:42-64's in-place shift).

Any raster source (synthetic, GeoTIFF, warped view) gains the kernel by
providing: ``dtype``, ``nodata``, ``width``, ``height``, ``transform``
(rasterio-order EPSG:3857 affine), ``bounds()``, and
``values_at(cols, rows)`` over global pixel index grids
(broadcastable).  Sources with reduced-resolution overviews may
override ``read_decimated`` to select one (see raster/geotiff.py).
"""

from __future__ import annotations

import numpy as np

from ..geo import Bounds
from ..geo.tileid import tile_mercator_bounds
from ..geo.window import window_from_bounds, window_transform


def _round_half_away(v: float) -> float:
    """Rust f64::round semantics: half away from zero."""
    return np.sign(v) * np.floor(abs(v) + 0.5)


def nn_decimation_indices(out_n: int, read_n: int) -> np.ndarray:
    """Center-of-target NN mapping: src = floor((i + 0.5) * read / out),
    clamped — the standard GDAL NN RasterIO rule (golden-pinned)."""
    return np.minimum(
        ((np.arange(out_n, dtype=np.float64) + 0.5) * read_n / out_n).astype(np.int64),
        read_n - 1,
    )


class TileReadMixin:
    """Adds ``read_tile`` / ``read_decimated`` over ``values_at``."""

    def read_decimated(
        self, x_off: int, y_off: int, read_w: int, read_h: int, out_w: int, out_h: int
    ) -> np.ndarray:
        """NN-resampled read of (read_w, read_h) source px into (out_h, out_w).

        Evaluates the pixel function only at the UNIQUE source pixels the
        NN mapping selects, then expands by a narrow-dtype gather.  For
        oversampled tiles (zoom above native resolution) the NN index
        arrays repeat each source pixel out/read times — evaluating
        ``values_at`` on the full out_h×out_w grid hashed 65,536 uint64
        coords (~4 MB of DRAM traffic) per 256px tile where the window
        held ~16 unique pixels, which saturated the memory bus and
        anti-scaled the 32-worker render.  Bit-identical output: the
        pixel function is pure in the global coordinate.
        """
        jj = nn_decimation_indices(out_w, read_w)
        ii = nn_decimation_indices(out_h, read_h)
        uj, jinv = np.unique(jj, return_inverse=True)
        ui, iinv = np.unique(ii, return_inverse=True)
        vals = self.values_at((x_off + uj)[None, :], (y_off + ui)[:, None])
        return vals[iinv][:, jinv]

    def read_decimated_bilinear(
        self, x_off: int, y_off: int, read_w: int, read_h: int, out_w: int, out_h: int
    ) -> np.ndarray:
        """Bilinear-resampled read — the beyond-reference resampling
        path (the reference is NN-only, src/dataset.rs:168's
        ResampleAlg::NearestNeighbour).  Destination pixel centers map
        to source coords s = (i + 0.5)·read/out − 0.5; the four
        surrounding source pixels blend by the fractional offsets
        (edges clamp, GDAL-style).  Nodata contract (ours, pinned by
        tests, simpler than GDAL's weight renormalization): if ANY of
        the four contributors is nodata the output pixel is nodata.
        The blend rounds half-away back to the integer dtype.  Like the
        NN path, the pixel function is evaluated once per UNIQUE source
        pixel and expanded by gathers."""
        sx = (np.arange(out_w, dtype=np.float64) + 0.5) * read_w / out_w - 0.5
        sy = (np.arange(out_h, dtype=np.float64) + 0.5) * read_h / out_h - 0.5
        x0 = np.clip(np.floor(sx), 0, read_w - 1).astype(np.int64)
        y0 = np.clip(np.floor(sy), 0, read_h - 1).astype(np.int64)
        x1 = np.minimum(x0 + 1, read_w - 1)
        y1 = np.minimum(y0 + 1, read_h - 1)
        fx = np.clip(sx - x0, 0.0, 1.0)
        fy = np.clip(sy - y0, 0.0, 1.0)
        ucols, cinv = np.unique(np.concatenate([x0, x1]), return_inverse=True)
        urows, rinv = np.unique(np.concatenate([y0, y1]), return_inverse=True)
        grid = self.values_at(
            (x_off + ucols)[None, :], (y_off + urows)[:, None]
        ).astype(np.float64)
        j0, j1 = cinv[:out_w], cinv[out_w:]
        i0, i1 = rinv[:out_h], rinv[out_h:]
        v00 = grid[np.ix_(i0, j0)]
        v01 = grid[np.ix_(i0, j1)]
        v10 = grid[np.ix_(i1, j0)]
        v11 = grid[np.ix_(i1, j1)]
        nd = float(self.nodata)
        anynd = (v00 == nd) | (v01 == nd) | (v10 == nd) | (v11 == nd)
        top = v00 * (1.0 - fx)[None, :] + v01 * fx[None, :]
        bot = v10 * (1.0 - fx)[None, :] + v11 * fx[None, :]
        blend = top * (1.0 - fy)[:, None] + bot * fy[:, None]
        out = (np.sign(blend) * np.floor(np.abs(blend) + 0.5)).astype(
            self.values_at(np.array([[0]]), np.array([[0]])).dtype
        )
        return np.where(anynd, out.dtype.type(self.nodata), out)

    def read_tile(
        self,
        zoom: int,
        x: int,
        y: int,
        tilesize: int,
        *,
        resampling: str = "nearest",
    ) -> np.ndarray | None:
        """Render one tile buffer, or None if empty. Ref src/dataset.rs:121-196.

        ``resampling``: "nearest" (reference parity, default) or
        "bilinear" (beyond-reference extension; identical window /
        padding / skip arithmetic, only the decimation kernel differs).
        """
        size = float(tilesize)
        vrt_w, vrt_h = float(self.width), float(self.height)
        vrt_transform = self.transform
        vrt_bounds = self.bounds()

        bxmin, bymin, bxmax, bymax = (
            float(v[0])
            for v in tile_mercator_bounds(np.array([zoom]), np.array([x]), np.array([y]))
        )
        tile_bounds = Bounds(bxmin, bymin, bxmax, bymax)
        window = window_from_bounds(vrt_transform, tile_bounds)
        tile_transform = window_transform(window, vrt_transform).scale(
            window.width / size, window.height / size
        )
        xres, yres = tile_transform.resolution()

        left = max(_round_half_away((vrt_bounds.xmin - tile_bounds.xmin) / xres), 0.0)
        right = max(_round_half_away((tile_bounds.xmax - vrt_bounds.xmax) / xres), 0.0)
        bottom = max(_round_half_away((vrt_bounds.ymin - tile_bounds.ymin) / yres), 0.0)
        top = max(_round_half_away((tile_bounds.ymax - vrt_bounds.ymax) / yres), 0.0)

        width = int(_round_half_away(size - left - right))
        height = int(_round_half_away(size - top - bottom))

        x_offset = _round_half_away(min(max(window.x_offset, 0.0), vrt_w))
        y_offset = _round_half_away(min(max(window.y_offset, 0.0), vrt_h))
        x_stop = max(min(window.x_offset + window.width, vrt_w), 0.0)
        y_stop = max(min(window.y_offset + window.height, vrt_h), 0.0)

        read_width = int(np.floor((x_stop - x_offset) + 0.5))
        read_height = int(np.floor((y_stop - y_offset) + 0.5))

        if read_width == 0 or read_height == 0 or width <= 0 or height <= 0:
            return None

        if resampling == "nearest":
            reader = self.read_decimated
        elif resampling == "bilinear":
            reader = self.read_decimated_bilinear
        else:
            raise ValueError(f"unknown resampling {resampling!r}")
        data = reader(
            int(x_offset), int(y_offset), read_width, read_height, width, height
        )

        if np.all(data == data.dtype.type(self.nodata)):
            return None

        tilesize = int(tilesize)
        if left > 0 or top > 0 or width < tilesize or height < tilesize:
            # partial tile: allocate-and-place (equiv of src/array.rs:42-64 shift)
            out = np.full((tilesize, tilesize), self.nodata, dtype=data.dtype)
            ox, oy = int(left), int(top)
            out[oy : oy + height, ox : ox + width] = data
            return out
        return data
