"""Platform selection + persistent-compile-cache helper.

The deployment host pins ``JAX_PLATFORMS`` (e.g. to a TPU tunnel plugin) in
a way that wins over a user-set environment variable. ``PNP_PLATFORM=cpu``
provides a reliable override: it is applied through ``jax.config`` after
import, which takes precedence. Used by every CLI tool.

The persistent compilation cache kills the multi-minute recompiles of the
720p executables through the remote-compile tunnel (the b=2 serving
binary measured ~45 min cold): cached executables reload in seconds on
any later process. ``PNP_COMPILE_CACHE`` overrides the location,
``PNP_COMPILE_CACHE=0`` disables.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_override"]

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def apply_platform_override():
    import jax

    plat = os.environ.get("PNP_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache = os.environ.get("PNP_COMPILE_CACHE", _DEFAULT_CACHE)
    if cache and cache != "0":
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            # cache even medium compiles; the tunnel makes every compile slow
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:  # pragma: no cover - config name drift
            print(f"[platform] compile cache disabled: {e}")
