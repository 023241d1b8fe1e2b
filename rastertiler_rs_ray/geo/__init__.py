from .mercator import RE, ORIGIN, CE, geo_to_mercator, mercator_to_geo
from .affine import Affine
from .bounds import Bounds
from .window import Window, window_from_bounds, window_transform
from .tileid import (
    tile_geo_bounds,
    tile_mercator_bounds,
    TileRange,
    tile_range,
    point_to_tile,
)
from .cell import (
    cell_id,
    cell_level,
    cell_xy,
    cell_parent,
    cell_children,
    cell_neighbors,
    cell_from_mercator,
    cell_from_lonlat,
)

__all__ = [
    "RE", "ORIGIN", "CE", "geo_to_mercator", "mercator_to_geo",
    "Affine", "Bounds", "Window", "window_from_bounds", "window_transform",
    "tile_geo_bounds", "tile_mercator_bounds", "TileRange", "tile_range",
    "point_to_tile",
    "cell_id", "cell_level", "cell_xy", "cell_parent", "cell_children",
    "cell_neighbors", "cell_from_mercator", "cell_from_lonlat",
]
