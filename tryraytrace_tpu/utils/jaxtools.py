"""JAX runtime setup helpers."""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    """Turn on JAX's persistent compilation cache.

    The render step is one large jitted program; on the axon TPU
    backend a cold compile can take minutes, so caching across
    processes matters for CLI/bench usability.  Opt out with
    TPURT_NO_JAX_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR.
    """
    global _DONE
    if _DONE or os.environ.get("TPURT_NO_JAX_CACHE"):
        return
    _DONE = True
    import jax

    default = os.path.join(os.path.expanduser("~"), ".cache", "tpurt",
                           "jax_cache")
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail setup over it
