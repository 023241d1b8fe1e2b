from .hashing import content_hash64, hash_binary_column
from .packing import pack_bits_rows

__all__ = ["content_hash64", "hash_binary_column", "pack_bits_rows"]
