"""Deterministic synthetic raster source + the tile-read kernel.

Replaces the reference's GeoTIFF + GDAL warped-VRT source. The raster
is *functionally defined*: every pixel value is a pure function of its
global (col, row) coordinate and the seed, so any window read is
reproducible on any worker with zero I/O and zero shared state — the
actor "warms" only the tiny spec. The raster is authored directly in
EPSG:3857 (the reference's own test constants assume Mercator), so the
reference's warp step (src/dataset.rs:74-110) is the identity here;
its semantics are preserved: nearest-neighbour only, nodata-initialized
destination.

The tile-read kernel (window math, NN decimation, paddings,
all-nodata skip) lives in raster/kernel.py ``TileReadMixin`` and is
shared with the GeoTIFF source; golden tile hashes pin its exact
center-of-target NN mapping.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..geo import Affine, Bounds, CE, ORIGIN
from .kernel import TileReadMixin


def _mix(gx: np.ndarray, gy: np.ndarray, seed: int) -> np.ndarray:
    """Cheap deterministic per-pixel hash over global pixel coords (uint64)."""
    gx = gx.astype(np.uint64)
    gy = gy.astype(np.uint64)
    h = gx * np.uint64(0x9E3779B97F4A7C15) ^ gy * np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= np.uint64((seed * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF)
    h ^= h >> np.uint64(32)
    h *= np.uint64(0xD6E8FEB86659FD93)
    h ^= h >> np.uint64(29)
    return h


@dataclass(frozen=True)
class SyntheticRaster(TileReadMixin):
    """A functionally-defined single-band EPSG:3857 raster.

    dtype ∈ {"uint8", "uint32"}; ``transform`` is rasterio-order
    (a, b, c, d, e, f) with b = d = 0 and e = -a (square pixels,
    north-up), like the reference's warped VRT output.
    """

    dtype: str
    nodata: int
    width: int
    height: int
    transform: Affine
    seed: int = 42
    block: int = 512  # structural block size for nodata/constant regions

    def bounds(self) -> Bounds:
        """Raster bounds from geotransform + size. Ref src/dataset.rs:37-48."""
        t = self.transform
        return Bounds(
            xmin=t.c,
            ymin=t.f + t.e * self.height,
            xmax=t.c + t.a * self.width,
            ymax=t.f,
        )

    # -- pixel function ------------------------------------------------
    def values_at(self, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """Evaluate pixel values at global (col, row) grids (broadcastable).

        Structure (per `block`-sized blocks): ~1/5 of blocks are all
        nodata (exercises the all-nodata skip), ~1/7 are constant
        (exercises content-hash dedup), the rest are per-pixel hash
        noise. For uint32, half the blocks use a small 12-value palette
        (indexed PNG path) and half dense 24-bit values (RGB fallback).
        """
        cols = np.asarray(cols)
        rows = np.asarray(rows)
        h = _mix(cols, rows, self.seed)
        bx = cols // self.block
        by = rows // self.block
        bh = _mix(bx, by, self.seed + 1)
        nodata_block = (bh % np.uint64(5)) == np.uint64(0)
        const_block = (bh % np.uint64(7)) == np.uint64(1)

        if self.dtype == "uint8":
            vals = (np.uint64(1) + h % np.uint64(255)).astype(np.uint8)
            vals = np.where(const_block, np.uint8(42), vals)
            out = np.where(nodata_block, np.uint8(self.nodata), vals)
            return np.broadcast_to(out, np.broadcast_shapes(cols.shape, rows.shape)).copy()

        if self.dtype == "uint32":
            palette_block = (bh % np.uint64(2)) == np.uint64(0)
            small = ((h % np.uint64(12)) * np.uint64(0x102030) + np.uint64(0x010101)).astype(np.uint32)
            dense = (np.uint64(1) + h % np.uint64(0xFFFFFE)).astype(np.uint32)
            vals = np.where(palette_block, small, dense)
            vals = np.where(const_block, np.uint32(0x00FF7F50), vals)
            out = np.where(nodata_block, np.uint32(self.nodata), vals)
            return np.broadcast_to(out, np.broadcast_shapes(cols.shape, rows.shape)).copy()

        raise ValueError(f"unsupported dtype {self.dtype}")

    def spec(self) -> dict:
        """JSON-serializable spec (what actors receive as constructor args)."""
        t = self.transform
        return {
            "dtype": self.dtype,
            "nodata": self.nodata,
            "width": self.width,
            "height": self.height,
            "transform": [t.a, t.b, t.c, t.d, t.e, t.f],
            "seed": self.seed,
            "block": self.block,
        }

    @staticmethod
    def from_spec(spec: dict) -> "SyntheticRaster":
        return SyntheticRaster(
            dtype=spec["dtype"],
            nodata=spec["nodata"],
            width=spec["width"],
            height=spec["height"],
            transform=Affine(*spec["transform"]),
            seed=spec.get("seed", 42),
            block=spec.get("block", 512),
        )


# Default test rasters: native resolution = CE / 2^17 px (≈ "zoom 9" for
# 256px tiles / "zoom 8" for 512px tiles), origin intentionally NOT
# aligned to the tile grid so edge/partial tiles are exercised.
_RES = CE / (1 << 17)


def default_u8_raster(seed: int = 42) -> SyntheticRaster:
    return SyntheticRaster(
        dtype="uint8",
        nodata=0,
        width=4096,
        height=3072,
        transform=Affine(_RES, 0.0, -ORIGIN / 3.0, 0.0, -_RES, ORIGIN / 5.0),
        seed=seed,
    )


def world_u8_raster(seed: int = 42, *, px_per_side: int = 4096) -> SyntheticRaster:
    """Full-Web-Mercator-extent raster (corner-to-corner): every tile of
    every zoom intersects, so renders produce complete pyramids and the
    edge-clamping math runs at the projection boundary itself."""
    res = CE / px_per_side
    return SyntheticRaster(
        dtype="uint8",
        nodata=0,
        width=px_per_side,
        height=px_per_side,
        transform=Affine(res, 0.0, -ORIGIN, 0.0, -res, ORIGIN),
        seed=seed,
    )


def default_u32_raster(seed: int = 42) -> SyntheticRaster:
    return SyntheticRaster(
        dtype="uint32",
        nodata=0,
        width=4096,
        height=3072,
        transform=Affine(_RES, 0.0, -ORIGIN / 3.0, 0.0, -_RES, ORIGIN / 5.0),
        seed=seed,
    )


class PatchedRaster(TileReadMixin):
    """A raster with a rectangular pixel region overridden by another
    source — the "changed data" model for incremental re-rendering
    (the reference has no incremental path at all: MBTiles::new deletes
    the whole output, src/mbtiles.rs:53-55; this engine re-renders only
    the dirty tile cover and left-wins-merges it over the base
    tileset).

    Both operands come from factory specs so actor pools can reopen the
    composite from one JSON spec; shape/georeferencing are the base's
    (the patch is sampled at the same global pixel grid).
    """

    def __init__(self, base_spec: dict, patch_spec: dict, region: tuple):
        from .factory import raster_from_spec

        self.base = raster_from_spec(base_spec)
        self.patch = raster_from_spec(patch_spec)
        self._base_spec = dict(base_spec)
        self._patch_spec = dict(patch_spec)
        self.region = tuple(int(v) for v in region)  # (c0, r0, c1, r1)
        self.dtype = self.base.dtype
        self.nodata = self.base.nodata
        self.width = self.base.width
        self.height = self.base.height
        self.transform = self.base.transform

    def bounds(self) -> Bounds:
        return self.base.bounds()

    def values_at(self, cols: np.ndarray, rows: np.ndarray) -> np.ndarray:
        c0, r0, c1, r1 = self.region
        cols = np.asarray(cols)
        rows = np.asarray(rows)
        vb = self.base.values_at(cols, rows)
        vp = self.patch.values_at(cols, rows)
        in_r = (cols >= c0) & (cols < c1) & (rows >= r0) & (rows < r1)
        return np.where(np.broadcast_to(in_r, vb.shape), vp, vb)

    def dirty_bounds(self) -> Bounds:
        """Mercator bbox of the patched pixel region — the planning
        bounds for the incremental re-render's tile cover."""
        c0, r0, c1, r1 = self.region
        t = self.transform
        xs = [t.c + t.a * c0, t.c + t.a * c1]
        ys = [t.f + t.e * r0, t.f + t.e * r1]
        return Bounds(min(xs), min(ys), max(xs), max(ys))

    def spec(self) -> dict:
        return {
            "kind": "patched",
            "base": self._base_spec,
            "patch": self._patch_spec,
            "region": list(self.region),
        }

    @staticmethod
    def from_spec(spec: dict) -> "PatchedRaster":
        return PatchedRaster(spec["base"], spec["patch"], tuple(spec["region"]))
