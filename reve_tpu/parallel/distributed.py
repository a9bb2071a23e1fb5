"""Multi-host bootstrap: jax.distributed + lease-queue worker identity.

Completes the multi-host story from SURVEY.md §2.4: per-host processes join
a jax.distributed cluster (for device visibility / collectives if ever
needed) and derive a stable worker id for the file-lease segment queue
(reve_tpu.pipeline.leases) over a shared workspace.  No collectives run on
the segment hot path — coordination is entirely through the lease files,
matching the reference's file-based state idiom.

Usage on each host:

    from reve_tpu.parallel import distributed
    ident = distributed.initialize()          # env-driven (JAX_COORDINATOR..)
    # ... build engine on local devices, then:
    leases.run_sharded(state, ws, engine, ident.worker_id, ...)
"""

from __future__ import annotations

import dataclasses
import os
import socket
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Identity:
    worker_id: str
    process_index: int
    process_count: int


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Identity:
    """Join (or skip, when single-process) the jax.distributed cluster.

    All parameters fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); with
    none set this is a no-op single-process identity, so the same code path
    runs on a laptop and on a pod.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    index = jax.process_index()
    count = jax.process_count()
    worker_id = f"{socket.gethostname()}-p{index}"
    return Identity(worker_id=worker_id, process_index=index,
                    process_count=count)
