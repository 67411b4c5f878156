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
