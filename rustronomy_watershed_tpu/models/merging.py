"""Merging (void-filling) watershed: touching lakes unify each water level.

Counterpart of the reference ``MergingWatershed``
(/root/reference/src/lib.rs:1297-1562): after each level's flood fixed point,
all 4-adjacent differing regions merge transitively (find_merge +
make_colour_map + recolour, src/lib.rs:1446-1466), here as a scatter-min +
pointer-jumping union on device with the pinned min-label rule (SURVEY.md Q9).
"""

from __future__ import annotations

from .base import _WatershedBase


class MergingWatershed(_WatershedBase):
    _merging = True
