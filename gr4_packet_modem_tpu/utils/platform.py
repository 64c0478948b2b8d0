"""Process-level JAX platform & compilation-cache setup.

Addresses two environment realities (see CLAUDE.md):

- the axon sitecustomize overrides ``JAX_PLATFORMS``, so backend selection
  must be a config update after importing jax (``PM_PLATFORM`` env);
- first compiles are remote and slow (10-40 s for a receiver step); the
  persistent compilation cache makes every later process start instant, so
  every entry point should enable it (``JAX_CACHE_DIR`` env overrides the
  location, empty string disables).

Call ``setup()`` once, before building any model — every app/benchmark/script
entry point does.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = "/tmp/pm_jax_cache"


def setup(platform: str | None = None, cache_dir: str | None = None) -> None:
    import jax

    platform = platform or os.environ.get("PM_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_CACHE_DIR", _DEFAULT_CACHE)
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
