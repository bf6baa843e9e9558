"""Distributed Merkle commitments: sharded leaf hashing + collective reduce.

New TPU-native subsystem (no reference counterpart, SURVEY.md section 2.10):
leaves are sharded across the mesh, each device hashes and reduces its local
perfect subtree with the batched BLAKE3 kernel, and the per-device subtree
roots are all-gathered; the O(D) gathered roots reduce to the global root in
the exact left-balanced order, so the result is bit-identical to the
sequential commitment. The transcript absorb schedule stays sequential and
deterministic (host-0 ordering) as required for Fiat-Shamir parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..crypto import blake3 as b3
from ..ops import blake3_jax as BJ
from .mesh import AXIS


def build_sharded_leaf_commit(mesh: Mesh, n: int, prefix: bytes = b""):
    """Compile: u64 field values [n] (sharded) -> per-device subtree root CVs.

    n must be divisible by mesh size with a power-of-two local count, so each
    local shard is a perfect subtree of the global left-balanced tree.
    Returns f(lo, hi) -> uint32 [D, 8] subtree-root CVs (replicated).
    """
    d = mesh.devices.size
    assert n % d == 0, "n must divide the mesh"
    loc = n // d
    assert loc & (loc - 1) == 0, "local leaf count must be a power of two"

    def local(lo, hi):
        cv = BJ.hash_leaves_u64(lo.reshape(-1), hi.reshape(-1), prefix=prefix)
        root = BJ.merkle_root_pow2(cv)  # [1, 8]
        # all-gather subtree roots in device order (rides ICI)
        return jax.lax.all_gather(root[0], AXIS)  # [D, 8]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(f)


def gathered_roots_to_root(roots_u32: np.ndarray) -> bytes:
    """Reduce [D, 8]-word subtree roots (D a power of two) to the global root
    on host, preserving the left-balanced pairing order."""
    cur = [
        np.ascontiguousarray(roots_u32[i].astype("<u4")).view(np.uint8).tobytes()
        for i in range(roots_u32.shape[0])
    ]
    while len(cur) > 1:
        cur = [b3.hash_bytes(cur[i] + cur[i + 1]) for i in range(0, len(cur), 2)]
    return cur[0]


def sharded_merkle_root_u64(values: np.ndarray, mesh: Mesh, prefix: bytes = b"") -> bytes:
    """End-to-end: hash + commit u64 leaf values across the mesh; returns the
    32-byte root, bit-identical to the sequential path."""
    v = np.asarray(values, dtype=np.uint64)
    lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    f = build_sharded_leaf_commit(mesh, v.shape[0], prefix)
    roots = np.asarray(f(lo, hi))
    return gathered_roots_to_root(roots)
