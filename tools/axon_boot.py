"""Robust TPU-session bootstrap for benchmark/driver scripts.

The ambient ``sitecustomize`` registers the tunnelled TPU backend with an
infinite claim timeout; if an earlier process left a zombie claim (e.g. a
killed run), every later default-path process blocks forever at its first
result fetch.  Registering a fresh session with a *finite* ``claim_timeout_s``
preempts the stale claim and restores service.

Usage (from a ``python -S`` interpreter so the ambient sitecustomize does not
register first — re-registration with different options is forbidden):

    from tools.axon_boot import boot
    boot()          # no-op when the axon plugin is absent (plain CPU/TPU envs)
"""

from __future__ import annotations

import os
import sys
import uuid

_SITE = "/opt/venv/lib/python3.12/site-packages"
_AXON_SITE = "/root/.axon_site"
_SO = "/opt/axon/libaxon_pjrt.so"


def boot(claim_timeout_s: int = 30) -> bool:
    """Register a finite-claim axon session.  Returns True when registered."""
    for p in (_SITE, _AXON_SITE):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)
    if not (os.path.exists(_SO) and os.path.isdir(_AXON_SITE)):
        return False
    os.environ.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    os.environ.setdefault("AXON_LOOPBACK_RELAY", "1")
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    try:
        from axon.register import register

        register(
            None,
            f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            so_path=_SO,
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
            claim_timeout_s=claim_timeout_s,
        )
        return True
    except Exception as e:  # plain environments: fall through to default jax
        print(f"[axon_boot] register skipped: {type(e).__name__}: {e}", file=sys.stderr)
        return False
