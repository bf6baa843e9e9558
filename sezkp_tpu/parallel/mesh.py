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
