"""JAX runtime setup helpers."""

from __future__ import annotations

import os

_DONE = False


def host_fingerprint() -> str:
    """Short stable id for (this machine's CPU features, jaxlib).

    The sandbox's host machine changes between sessions, and XLA:CPU
    AOT blobs compiled for another CPU's feature set load with
    machine-feature-mismatch warnings and have segfaulted on
    subsequent cache writes.  Keying the cache directory by this
    fingerprint makes stale cross-machine blobs unreachable instead
    of relying on XLA to reject them.
    """
    import hashlib
    import platform

    blob = platform.machine()
    try:
        # Flags AND model name: XLA:CPU bakes model-dependent codegen
        # preferences (+prefer-no-gather/-scatter on gather-slow Intel
        # parts) into the AOT target features, so two hosts with
        # identical flag lines but different models still produce
        # incompatible blobs (seen live: machine-feature-mismatch E
        # logs on load).
        # Also the NUMERIC family/model/stepping: this sandbox's VMs
        # report a generic "Intel(R) Xeon(R) Processor" model name and
        # near-identical flag lines across different microarchitectures,
        # but LLVM detects the real microarch and bakes codegen
        # preferences (+prefer-no-gather/-scatter) into AOT blobs --
        # seen live: cross-machine mismatch E-logs with matching
        # name+flags fingerprints.  family/model/stepping distinguish
        # the microarch even under the generic name.
        want_prefix = ("flags", "Features", "model name", "cpu family",
                       "model\t", "model:", "stepping")
        seen: set = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                for p in want_prefix:
                    if p not in seen and line.startswith(p):
                        blob += line
                        seen.add(p)
                if len(seen) == len(want_prefix):
                    break
    except OSError:
        blob += platform.processor() or ""
    try:
        import jaxlib

        blob += jaxlib.__version__
    except Exception:
        pass
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def enable_compilation_cache() -> None:
    """Turn on JAX's persistent compilation cache.

    The render step is one large jitted program; on the axon TPU
    backend a cold compile can take minutes (and on a small-CPU host
    an XLA:CPU compile of the default engine takes ~20 min), so
    caching across processes matters for CLI/bench/test usability.
    The directory is keyed by host_fingerprint() so a cache written
    by a different machine is never loaded.  Opt out with
    TPURT_NO_JAX_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR.
    """
    global _DONE
    if _DONE or os.environ.get("TPURT_NO_JAX_CACHE"):
        return
    _DONE = True
    import jax

    default = os.path.join(os.path.expanduser("~"), ".cache", "tpurt",
                           "jax_cache", host_fingerprint())
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail setup over it
