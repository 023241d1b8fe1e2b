from .tile_render import TileRenderer, tms_flip_batch

__all__ = ["TileRenderer", "tms_flip_batch"]
