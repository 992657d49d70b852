"""Multi-device layer: mesh tiling with halo exchange, vmap batching."""
