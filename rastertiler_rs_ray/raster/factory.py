"""Raster spec dispatch: every raster source serializes to a tiny JSON
spec (what actor pools receive as constructor kwargs) and reopens from
it — the Ray translation of each reference worker reopening its own
dataset handle (src/render.rs:166-168)."""

from __future__ import annotations


def raster_from_spec(spec: dict):
    kind = spec.get("kind", "synthetic")
    if kind == "synthetic":
        from .synthetic import SyntheticRaster

        return SyntheticRaster.from_spec(spec)
    if kind == "geotiff":
        from .geotiff import GeoTiffRaster

        return GeoTiffRaster.from_spec(spec)
    if kind == "warped_geotiff":
        from .geotiff import MercatorWarp

        return MercatorWarp.from_spec(spec)
    if kind == "patched":
        from .synthetic import PatchedRaster

        return PatchedRaster.from_spec(spec)
    raise ValueError(f"unknown raster spec kind: {kind!r}")
