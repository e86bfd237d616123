"""Multi-host / multi-slice initialization.

The reference had no distributed backend at all (SURVEY.md C21) — its only
inter-device traffic was DataParallel's intra-process scatter/gather.  Here
the single code path scales from 1 chip to a multi-host pod slice:

- within a slice, collectives ride ICI and are compiler-inserted from the
  sharding annotations (no user-visible backend);
- across hosts/slices, call :func:`initialize_distributed` once per process
  (standard ``jax.distributed`` bootstrap; DCN handles cross-slice traffic),
  then build the mesh over ``jax.devices()`` as usual — every host feeds its
  local shard of the global batch via
  ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap jax.distributed from args or the standard env variables.

    No-op when running single-process (the common single-host case).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier(name: str = "uegan_barrier", timeout_ms: int = 600_000) -> None:
    """Align processes via the coordination service before a first collective.

    XLA's Gloo CPU-collective context init has a hard ~30 s key-value
    deadline: if one process reaches the job's FIRST collective >30 s before
    its peers (startup/compile skew — routine on a time-sliced single-core
    host, and possible on real fleets with cold compile caches), Gloo init
    fails with DEADLINE_EXCEEDED and takes the job down.  This barrier rides
    the coordination service (plain gRPC to the coordinator, no device
    collective, generous configurable timeout), so call it after per-process
    setup and right before the first cross-process computation.  No-op
    single-process."""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:
        return  # single-process
    client.wait_at_barrier(name, timeout_ms)


def local_batch_to_global(batch, mesh, spec):
    """Assemble a per-host batch shard into a global sharded array."""
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), batch)
