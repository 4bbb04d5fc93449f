"""Platform selection helper.

The deployment host pins ``JAX_PLATFORMS`` (e.g. to a TPU tunnel plugin) in
a way that wins over a user-set environment variable. ``PNP_PLATFORM=cpu``
provides a reliable override: it is applied through ``jax.config`` after
import, which takes precedence. Used by every CLI tool.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_override"]


def apply_platform_override():
    plat = os.environ.get("PNP_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
