from .color import rgb8_from_hex, rgb8_from_u32, Colormap, parse_colormap
from .writer import encode_png_chunks, decode_png
from .encoders import GrayscaleEncoder, ColormapEncoder, RGBEncoder

__all__ = [
    "rgb8_from_hex", "rgb8_from_u32", "Colormap", "parse_colormap",
    "encode_png_chunks", "decode_png",
    "GrayscaleEncoder", "ColormapEncoder", "RGBEncoder",
]
