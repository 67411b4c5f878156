"""Platform selection helper.

Some environments force-register a TPU PJRT plugin from sitecustomize, which
wins over the JAX_PLATFORMS env var. Calling this at CLI entry re-asserts the
user's explicit JAX_PLATFORMS choice via jax.config (effective as long as no
backend has been initialized yet)."""
from __future__ import annotations

import os

import jax


def apply_env_platform():
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and want.lower() not in ("", "axon"):
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; keep whatever is live
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: fresh processes reuse compiled
    executables instead of paying the (remote-)compile again."""
    path = path or os.environ.get(
        "KVAE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/kvae_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
