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

# Coordination-service timeouts (seconds). jax defaults are 300/100/300,
# sized for fleets where every process compiles at comparable speed. On an
# oversubscribed host (N worker processes sharing few cores, cold XLA
# caches) peer skew through a multi-minute shard_map compile can exceed the
# 300 s shutdown barrier — the fast process exits, waits at the barrier,
# and dies with DEADLINE_EXCEEDED while the slow one is still compiling.
# We default much higher: correctness must not depend on compile-speed
# symmetry. Overridable per-deployment via env.
ENV_INIT_TIMEOUT = "SEZKP_DIST_INIT_TIMEOUT_S"
ENV_HEARTBEAT_TIMEOUT = "SEZKP_DIST_HEARTBEAT_TIMEOUT_S"
ENV_SHUTDOWN_TIMEOUT = "SEZKP_DIST_SHUTDOWN_TIMEOUT_S"
DEFAULT_INIT_TIMEOUT_S = 900
DEFAULT_HEARTBEAT_TIMEOUT_S = 600
DEFAULT_SHUTDOWN_TIMEOUT_S = 1800

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

    # Share one persistent compile cache across all worker processes: they
    # compile identical shard_map programs, so after the first populate run
    # every peer loads from disk — which also collapses the compile-skew
    # window the timeouts above guard against.
    from ..utils.config import enable_compile_cache

    enable_compile_cache()

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=int(
            os.environ.get(ENV_INIT_TIMEOUT, DEFAULT_INIT_TIMEOUT_S)
        ),
        heartbeat_timeout_seconds=int(
            os.environ.get(ENV_HEARTBEAT_TIMEOUT, DEFAULT_HEARTBEAT_TIMEOUT_S)
        ),
        shutdown_timeout_seconds=int(
            os.environ.get(ENV_SHUTDOWN_TIMEOUT, DEFAULT_SHUTDOWN_TIMEOUT_S)
        ),
    )
    _initialized = True
    return True


_barrier_seq = 0


def barrier(tag: str, timeout_s: Optional[int] = None) -> None:
    """Coordination-service barrier across all processes (no-op single-host).

    Unlike the CPU gloo collective rendezvous (hard-coded 30 s GetKeyValue
    timeout inside XLA), this barrier's timeout is ours to choose. Barrier
    ids must be unique per use; every process calls in the same program
    order, so a global sequence number keeps ids aligned."""
    global _barrier_seq
    from jax._src import distributed as _jd

    client = _jd.global_state.client
    if client is None:
        return
    if timeout_s is None:
        timeout_s = int(
            os.environ.get(ENV_SHUTDOWN_TIMEOUT, DEFAULT_SHUTDOWN_TIMEOUT_S)
        )
    _barrier_seq += 1
    client.wait_at_barrier(f"sezkp/{tag}/{_barrier_seq}", timeout_s * 1000)


def sync_execute(jitted, *args, tag: str = "prog"):
    """Launch a (potentially expensive-to-compile) SPMD program safely
    across processes: AOT-compile first, barrier, then execute.

    Why: XLA:CPU's gloo collectives create their communicator contexts at
    FIRST EXECUTION of a program's first collective, with a hard-coded
    ~30 s key-value rendezvous timeout. A jit call fuses compile+execute,
    so if peer processes' compiles skew by >30 s (cold caches on an
    oversubscribed host), the fast process times out inside gloo context
    init and the job dies (round-3 slow-tier failure signature:
    `Gloo context initialization failed: DEADLINE_EXCEEDED: GetKeyValue()
    timed out`). Splitting compile from execute and aligning processes on
    a coordination-service barrier (whose timeout we control) bounds the
    execution-point skew to barrier propagation — milliseconds — no matter
    how asymmetric the compiles were. Single-process: plain call."""
    import jax

    if jax.process_count() <= 1:
        return jitted(*args)
    compiled = jitted.lower(*args).compile()
    barrier(tag)
    return compiled(*args)


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
