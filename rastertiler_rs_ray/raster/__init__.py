from .synthetic import SyntheticRaster, default_u8_raster, default_u32_raster

__all__ = ["SyntheticRaster", "default_u8_raster", "default_u32_raster"]
