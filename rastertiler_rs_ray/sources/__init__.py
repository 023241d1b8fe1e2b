from .tiles import tile_ids_dataset, pyramid_tile_count
from .tables import read_table, LanceStyleTable

__all__ = ["tile_ids_dataset", "pyramid_tile_count", "read_table", "LanceStyleTable"]
