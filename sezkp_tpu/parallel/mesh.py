"""Device-mesh helpers for multi-chip scale-out.

There is no distributed layer in the Rust reference (SURVEY.md section 2.10);
this subsystem is new TPU-native design: a 1-D mesh over chips, with the
trace/evaluation domain sharded across it ("sequence parallelism" for proofs)
and XLA collectives (all_to_all / all_gather / psum) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "d"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def make_global(mesh: Mesh, spec: P, arr) -> jax.Array:
    """Host array (fully replicated on every process) -> global jax.Array
    with NamedSharding(mesh, spec).

    In a single-process mesh this is just a sharded device_put. In a
    multi-process mesh (jax.distributed), plain `jnp.asarray` produces a
    process-local array that jit over a global mesh rejects; this builds
    the global array from each process's replicated copy instead — the
    callback hands every device exactly its shard."""
    arr = np.asarray(arr)
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])


def replicated_pull(mesh: Mesh, fn, *args):
    """Run `fn(*args)` as a jitted global program whose outputs are fully
    replicated, then fetch to host. Safe in multi-process meshes where
    plain eager indexing of a sharded global array (or device_get of a
    non-addressable one) fails. `args` may mix global jax.Arrays and host
    numpy arrays (e.g. gather indices, identical on every process)."""
    out_tree = jax.eval_shape(fn, *args)
    reps = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), out_tree)
    return jax.device_get(jax.jit(fn, out_shardings=reps)(*args))
