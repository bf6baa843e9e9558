"""Multi-host (multi-process) runtime initialization and global meshes.

New TPU-native subsystem with no reference counterpart (SURVEY.md §2.10,
§5.8): the Rust reference is strictly single-process. On a TPU pod slice,
each host owns a subset of chips; `jax.distributed.initialize` wires the
hosts into one runtime so `jax.devices()` returns the GLOBAL device list and
jit/shard_map programs place collectives on ICI (intra-slice) transparently.

Launch model (one process per host):

    SEZKP_COORDINATOR=host0:9955 SEZKP_NUM_PROCESSES=4 SEZKP_PROCESS_ID=$i \
        python -m sezkp_tpu prove --backend stark ...

or programmatically::

    from sezkp_tpu.parallel.distributed import ensure_initialized, global_mesh
    ensure_initialized()                # no-op single-host without env vars
    mesh = global_mesh()                # 1-D mesh over ALL chips (all hosts)

Design notes:
- The proof transcript is sequential by construction, so every host runs the
  same host-side schedule; device work is sharded via NamedSharding/shard_map
  and XLA inserts the ICI collectives (SURVEY.md §5.8). Outputs (roots,
  paths) are replicated — every host assembles identical proof bytes, and
  only process 0 writes artifacts (see `is_coordinator`).
- Host-level data ingest shards by byte-range (parallel/ingest.py); on a
  real deployment each host reads its own shard from shared storage and the
  32-byte digests ride DCN to host 0.
- On cloud TPU pods, `jax.distributed.initialize()` with NO arguments
  auto-discovers the topology from the metadata server; the env vars here
  are for explicit/on-prem launches.
"""

from __future__ import annotations

import os
from typing import Optional

ENV_COORDINATOR = "SEZKP_COORDINATOR"
ENV_NUM_PROCESSES = "SEZKP_NUM_PROCESSES"
ENV_PROCESS_ID = "SEZKP_PROCESS_ID"

_initialized = False


def ensure_initialized(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime if configured; else no-op.

    Resolution order: explicit args > SEZKP_* env vars. Returns True when a
    multi-process runtime is (already) active. Safe to call repeatedly and
    from single-host runs (returns False without touching the runtime)."""
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    num_str = os.environ.get(ENV_NUM_PROCESSES)
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get(ENV_PROCESS_ID)
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )
    if coordinator is None and num_processes is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_coordinator() -> bool:
    """True on the process that should write artifacts (process 0)."""
    import jax

    return jax.process_index() == 0


def global_mesh(n_devices: Optional[int] = None):
    """1-D mesh over the global device list (all hosts' chips).

    Under `jax.distributed`, jax.devices() is the pod-wide list ordered so
    that each host's local chips are contiguous — a 1-D mesh therefore keeps
    shard_map neighbour exchanges on ICI within a host/slice and only
    boundary traffic on DCN."""
    from .mesh import make_mesh

    return make_mesh(n_devices)


def process_shard_bounds(n_items: int) -> tuple[int, int]:
    """[start, end) of this process's contiguous shard of n_items."""
    import jax

    p = jax.process_count()
    i = jax.process_index()
    return n_items * i // p, n_items * (i + 1) // p
