"""Test env: run JAX on CPU with 8 virtual devices so sharding logic
(parallel/) is exercised without TPU hardware (SURVEY.md section 4).

Note: this sandbox pins JAX_PLATFORMS=axon through a sitecustomize
hook, so the env var alone is not enough -- jax.config is the
authoritative override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The sandbox's host machine can change between sessions, and a stale
# cross-machine persistent cache used to segfault on cache writes --
# so tests ran cache-free.  The cache directory is now keyed by a host
# CPU fingerprint (utils/jaxtools.host_fingerprint), which makes other
# machines' AOT blobs unreachable; with that fixed, tests use the
# persistent cache: on a small host one engine compile takes ~20 min
# on XLA:CPU, and suite re-runs would otherwise take hours.
from tryraytrace_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()


# Fast tier (`pytest -m fast`): host-only logic plus one tiny engine
# golden pass -- no big XLA:CPU engine-variant compiles, so it stays
# green-verifiable in minutes even on a 1-core host (the full suite's
# compiles take 30-60 min there; CLAUDE.md).  Membership is by file:
# everything in these modules is cheap.
FAST_FILES = {
    "test_vec_math.py", "test_camera.py", "test_bvh.py", "test_sah.py",
    "test_sbvh.py", "test_objloader.py", "test_io.py",
    "test_quad_pack.py", "test_native.py", "test_auto_cadence.py",
    "test_auto_leaf.py", "test_rng.py", "test_traverse.py",
    "test_leaf_isect.py", "test_golden.py", "test_walk_inv.py",
}

# Host-only tier (`pytest -m hostonly`): the fast tier minus the
# engine/walk compiles, so it survives a COLD compile cache on a
# 1-core host (~150 s measured; the three excluded files are the
# multi-minute cold-cache tail).  This is the always-green loop;
# `-m fast` adds the tiny-compile goldens once the cache is warm.
HOSTONLY_EXCLUDE = {
    "test_golden.py", "test_traverse.py", "test_leaf_isect.py",
}
# Individual engine-compiling tests inside otherwise host-only files
# (a full persistent-engine compile is 5-15 min on a cold cache on a
# 1-core host -- measured live in round 4 when these hung the tier).
HOSTONLY_EXCLUDE_ITEMS = {
    "test_sbvh_render_bit_identical_to_sah",
    "test_renderer_resolves_auto_and_images_match",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in FAST_FILES:
            item.add_marker(pytest.mark.fast)
            if (base not in HOSTONLY_EXCLUDE
                    and item.name.split("[")[0]
                    not in HOSTONLY_EXCLUDE_ITEMS):
                item.add_marker(pytest.mark.hostonly)


# XLA:CPU segfaults (inside backend_compile_and_load) once a single
# process has accumulated a few hundred compiled executables -- the
# staged spill ladder multiplied loop bodies per config and pushed the
# full suite over the edge (observed: deterministic crash ~62% through
# the suite, same tests pass in isolation).  Dropping the executable
# caches periodically keeps the process under the cliff; re-compiles
# on CPU cost seconds.
_TESTS_SINCE_CLEAR = 0


def pytest_runtest_teardown(item, nextitem):
    global _TESTS_SINCE_CLEAR
    _TESTS_SINCE_CLEAR += 1
    if _TESTS_SINCE_CLEAR >= 20:
        _TESTS_SINCE_CLEAR = 0
        jax.clear_caches()
