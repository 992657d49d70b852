"""Multi-device layer: mesh tiling with halo exchange, vmap batching."""

from .halo import exchange_halo, global_interior_mask
from .tiled import make_mesh, tiled_transform

__all__ = ["exchange_halo", "global_interior_mask", "make_mesh", "tiled_transform"]
