"""Persistent XLA compilation cache.

First compile of the production SLAM graphs is minutes (remote compile on
tunneled TPUs); the persistent cache turns every later process start into
seconds (measured 115 s -> 1.2 s for a single jit through the tunnel).
Enabled by every CLI entry point; opt out with BATRACK_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    env = os.environ.get("BATRACK_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none", "false"):
        return None
    if env.lower() in ("1", "on", "true", "yes"):
        env = ""  # conventional enable spellings mean the default dir
    cache_dir = cache_dir or env or os.path.expanduser(
        "~/.cache/batrack_tpu_xla"
    )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir
