"""Parity harness: an independent host-side oracle of the reference semantics
(with the pinned deterministic tie-break) for validating the device kernels."""

from .oracle import oracle_transform, oracle_find_local_minima

__all__ = ["oracle_transform", "oracle_find_local_minima"]
