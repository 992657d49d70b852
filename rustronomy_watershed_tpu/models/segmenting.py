"""Segmenting watershed: lakes never merge; walls form where they meet.

Counterpart of the reference ``SegmentingWatershed``
(/root/reference/src/lib.rs:1609-1849): identical level loop minus the merge
phase (src/lib.rs:1750-1756).  Plateau partition between competing lakes
follows 4-connected BFS ring order with the pinned min-label tie-break.
"""

from __future__ import annotations

from .base import _WatershedBase


class SegmentingWatershed(_WatershedBase):
    _merging = False
