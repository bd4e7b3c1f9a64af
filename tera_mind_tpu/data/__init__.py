from .coo import COO
from .noise import lcg, tile_init_noise
from .tilestore import TileStore

__all__ = ["COO", "lcg", "tile_init_noise", "TileStore"]
