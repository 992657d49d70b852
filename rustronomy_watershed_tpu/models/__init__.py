"""Transform drivers (the framework's 'model' family): segmenting & merging."""

from .base import HookCtx, WatershedUtils
from .merging import MergingWatershed
from .segmenting import SegmentingWatershed

__all__ = ["HookCtx", "WatershedUtils", "MergingWatershed", "SegmentingWatershed"]
