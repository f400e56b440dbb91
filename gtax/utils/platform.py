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
