"""Environment plumbing.

``apply_env_platform()``: some deployments register a platform plugin from
``sitecustomize`` that force-overrides ``jax.config.jax_platforms`` at
interpreter start, which silently ignores a user's ``JAX_PLATFORMS=cpu``.
Re-apply the env var to the config before any backend is initialized so CLI
runs land on the platform the caller asked for."""

from __future__ import annotations

import os


def apply_env_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
