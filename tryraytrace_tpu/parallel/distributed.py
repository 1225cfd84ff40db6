"""Multi-host (DCN) rendering: ``jax.distributed`` plumbing.

The reference is strictly single-GPU, single-process (SURVEY.md §5:
no MPI/NCCL/sockets anywhere in the tree); this module is the
TPU-native scaling story past one host.  The design is the same
(dp, sp) mesh as parallel/mesh.py -- the mesh simply spans every
process's devices, XLA routes the one per-frame ``psum`` over ICI
within a host and DCN across hosts, and tracing itself stays
collective-free (scene replicated, pixels tile-sharded).

Usage (same command on every host):

    tpurt render --coordinator host0:1234 --num-processes 2 \
        --process-id $RANK ...

Verified by tests/test_distributed.py: two CPU processes over the
Gloo backend produce bit-identical images to a single process.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int,
                     cpu_devices_per_process: int | None = None) -> None:
    """Join the multi-process JAX runtime.

    Must run before any other JAX API touches the backend.
    ``cpu_devices_per_process`` forces the CPU platform with that many
    virtual devices per process -- the CI/smoke-test path (this
    sandbox has one TPU chip; the multi-host program is validated on
    CPU meshes, like the single-process sharding tests).
    """
    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)


_BARRIERS = 0


def barrier(timeout_s: float = 600.0) -> None:
    """Align all processes via the coordination service (NOT an XLA
    collective).  Collective *context* setup has a short (~30 s)
    cross-process handshake timeout; independent per-process compiles
    can skew arrival at the first collective well past it.  This
    barrier rides the coordinator's own RPC channel, which tolerates
    arbitrary skew, so a collective issued right after it sees
    millisecond skew."""
    from jax._src import distributed as jdist

    client = getattr(jdist.global_state, "client", None)
    if client is None:
        return
    global _BARRIERS
    _BARRIERS += 1
    client.wait_at_barrier(f"tpurt_barrier_{_BARRIERS}",
                           timeout_in_ms=int(timeout_s * 1000))


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def gather_accum_host(accum) -> np.ndarray:
    """Full [N, 3] accumulator on EVERY process (allgather over DCN).

    A plain ``np.asarray`` works only on fully-addressable arrays; a
    dp-sharded accumulator on a multi-host mesh is not, so the shards
    are allgathered first.  Single-process arrays pass through.
    """
    import jax

    if not is_distributed():
        return np.asarray(accum)
    from jax.experimental import multihost_utils

    barrier()  # bound the collective-context handshake skew
    return np.asarray(multihost_utils.process_allgather(accum, tiled=True))
