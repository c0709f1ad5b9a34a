"""Process-level JAX runtime configuration shared by the CLI tools.

First XLA compiles of a 7B-scale model through the device tunnel take
minutes; the persistent compilation cache cuts repeat runs to seconds.
bench.py and the experiment scripts already enable it — the user-facing
tools (main/perplexity/embedding/server) route through here so every
surface benefits from the same cache.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = "/tmp/jax_compile_cache"


def honor_platform_env() -> None:
    """Apply JAX_PLATFORMS via jax.config before first jax use.

    The env var alone does not stop out-of-tree device plugins from
    initializing — a cold/unreachable device tunnel then stalls the first
    dispatch by minutes even for a CPU-only run. Setting the config value
    programmatically (before any backend is touched) does suppress plugin
    init, so CLI runs with JAX_PLATFORMS=cpu start instantly.
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Directory: ``cache_dir`` arg > ``GGLLM_COMPILE_CACHE`` env (empty string
    disables) > /tmp/jax_compile_cache. Returns the directory in use, or
    None when disabled.
    """
    honor_platform_env()
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("GGLLM_COMPILE_CACHE", _DEFAULT_CACHE_DIR)
    if not cache_dir:
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist compiles that are worth the disk/serialization round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return cache_dir
