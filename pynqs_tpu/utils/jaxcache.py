"""Persistent XLA compilation cache (utils/jaxcache.py).

Cold compiles through the axon tunnel cost minutes per program
(CLAUDE.md); the persistent cache makes training-script restarts and
repeated measurements near-free.  Call before building any jitted fn.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None):
    import jax

    # PYNQS_PLATFORM=cpu lets any production script run a CPU smoke
    # test: the JAX_PLATFORMS env var is NOT honored here because the
    # environment's sitecustomize pins the axon platform at interpreter
    # start (CLAUDE.md) — only an explicit config update overrides it,
    # and it must land before the backend initializes (i.e. before the
    # first traced computation), which "call this first" guarantees.
    plat = os.environ.get("PYNQS_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    path = path or os.path.expanduser("~/.cache/pynqs_tpu_xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort
