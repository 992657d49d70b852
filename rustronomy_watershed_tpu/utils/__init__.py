"""Observability utilities: plotting, progress bars, performance reports."""

from . import plotting
from .perf import PerfReport
from .progress import ProgressBar

__all__ = ["plotting", "PerfReport", "ProgressBar"]
