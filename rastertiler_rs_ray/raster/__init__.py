from .factory import raster_from_spec
from .geotiff import GeoTiffRaster, MercatorWarp, open_raster, write_geotiff
from .synthetic import SyntheticRaster, default_u8_raster, default_u32_raster

__all__ = [
    "SyntheticRaster", "default_u8_raster", "default_u32_raster",
    "GeoTiffRaster", "MercatorWarp", "open_raster", "write_geotiff",
    "raster_from_spec",
]
