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


def is_remote_tpu_tunnel() -> bool:
    """Whether the TPU is reached through the axon remote-execution
    plugin (which registers its devices under the canonical 'tpu'
    backend name, so ``jax.default_backend()`` cannot tell). The plugin
    rejects donated-buffer executions (opaque INVALID_ARGUMENT at
    dispatch — measured round 4), so callers gate donation on this."""
    try:
        from jax._src import xla_bridge as xb

        return "axon" in xb._backend_factories
    except Exception:  # pragma: no cover
        return False


def collect_env() -> dict:
    """Environment fingerprint logged at train start (the reference logs
    mmcv's collect_env dump, tools/train.py:146-151; this is the TPU-world
    equivalent: versions, backend, device inventory, XLA flags, git sha)."""
    import platform
    import subprocess
    import sys

    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
        "hostname": platform.node(),
    }
    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                "numpy", "PIL"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except Exception:
            info[mod] = "absent"
    try:
        import jax

        info["backend"] = jax.default_backend()
        info["device_count"] = jax.device_count()
        info["process_count"] = jax.process_count()
        devs = jax.devices()
        info["device_kind"] = devs[0].device_kind if devs else "?"
    except Exception as e:  # pragma: no cover
        info["backend"] = f"error: {e}"
    info["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
        if sha.returncode == 0:
            info["git"] = sha.stdout.strip()
    except Exception:
        pass
    return info
