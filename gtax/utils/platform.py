"""Honor an explicit JAX_PLATFORMS=cpu request.

The axon TPU site package re-pins JAX_PLATFORMS to the tunnelled device at
its own import time, which silently overrides `JAX_PLATFORMS=cpu python -m
gtax.cli...` — the CLI would run on (and possibly disturb) the single-tenant
TPU the user explicitly opted out of. Calling this before any device use
makes the env var win again. No-op when JAX_PLATFORMS is unset or names an
accelerator.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialised; nothing safe to do


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for the serving/train entry points.

    The unstacked serving layout's first compile is ~4 min through the
    remote-compile tunnel (docs/PERF.md); caching the serialized executable
    makes every later process start warm. Directory from GTAX_COMPILE_CACHE
    (default ~/.cache/gtax_xla); GTAX_COMPILE_CACHE=0 disables. Safe no-op
    if the backend rejects serialization."""
    path = os.environ.get("GTAX_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/gtax_xla"))
    if path in ("0", ""):
        return
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program that took noticeable compile time, not just
        # the >1 s default — tiny debug configs benefit too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
