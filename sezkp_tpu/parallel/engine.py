"""Sharded v1 column-commitment engine: full prove_v1 over a device mesh.

New TPU-native subsystem (SURVEY.md section 2.10; the Rust reference is
single-threaded per proof — openings.rs builds each column commitment
sequentially on the CPU). Here the 9*tau+3 trace columns are sharded across
the mesh's column axis: every device hashes and chunk-commits its local
subset of columns with the batched BLAKE3 kernel (one shard_map program, all
collectives on ICI), and the host assembles the outer trees / transcript in
canonical label order so the proof bytes are identical to the single-chip
prover (cross-tested in tests/test_parallel.py).

Openings recompute the target chunk on host (O(chunk) work per query), the
same schedule as StreamingColumnEngine — paths are bit-identical.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import blake3_jax as BJ
from ..ops import goldilocks as G
from ..stark.v1 import params
from ..stark.v1.columns import all_labels
from ..stark.v1.merkle import MerkleTree, hash_field_leaves_labeled
from ..stark.v1.openings import _label_prefix
from ..stark.v1.proof import ColumnRoot, Opening
from .mesh import AXIS


def _sharded_group_commit(mesh: Mesh, plen: int, chunk_log2: int):
    """Compile: [Cpad, n] column values (sharded over C) -> chunk roots.

    Cpad must divide the mesh. Returns f(lo, hi, prefs) -> uint32
    [Cpad, n_chunks, 8], sharded over the leading axis.
    """

    def one_column(lo, hi, pref):
        cv = BJ.hash_leaves_u64_words(lo, hi, pref, plen)
        width = 1 << chunk_log2
        while width > 1:
            cv = BJ.parent_level(cv)
            width >>= 1
        return cv

    def local(lo, hi, prefs):
        out = jax.vmap(one_column)(lo, hi, prefs)
        # replicate the chunk roots so every process's host pull is local
        return jax.lax.all_gather(out, AXIS, axis=0, tiled=True)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(f)


@lru_cache(maxsize=8)
def _sharded_rowwise_commit(mesh: Mesh, nb: int, groups, chunk_log2: int):
    """Compile: raw movement logs (row-sharded) -> per-group chunk roots.

    Every device derives its own [C, n/D] column slab in-kernel
    (derive_cols_core), hashes its chunks for every column, and the chunk
    roots are all_gather-replicated — no [C, n] materialization on host or
    device (VERDICT round-2 item 3a applied to the commitment phase too).
    `groups` is a tuple of (plen, col_indices) in label-prefix groups.
    Returns f(*raw_args, prefs) -> tuple of [C_g, n_chunks, 8] u32."""
    from ..stark.v1.columns_device import derive_cols_core

    def local(imv, tmv, wfl, wsy, bo, isf, isl, winl, inof, outof,
              anchor, carry_shard, prefs):
        di = jax.lax.axis_index(AXIS)
        lo, hi = derive_cols_core(
            imv, tmv, wfl, wsy, bo, isf, isl, winl, inof, outof,
            anchor, carry_shard[:, di],
        )
        outs = []
        for plen, idxs in groups:
            gl = jnp.stack([lo[i] for i in idxs])
            gh = jnp.stack([hi[i] for i in idxs])
            gp = jnp.stack([prefs[i] for i in idxs])

            def one(lc, hc, p, plen=plen):
                cv = BJ.hash_leaves_u64_words(lc, hc, p, plen)
                width = 1 << chunk_log2
                while width > 1:
                    cv = BJ.parent_level(cv)
                    width >>= 1
                return cv

            r = jax.vmap(one)(gl, gh, gp)  # [Cg, nloc>>c, 8]
            outs.append(jax.lax.all_gather(r, AXIS, axis=1, tiled=True))
        return tuple(outs)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(AXIS),
            P(None, AXIS), P(None, AXIS), P(None, AXIS),
            P(AXIS), P(AXIS), P(AXIS),
            P(), P(), P(),
            P(), P(),
            P(),  # prefs [C, 16]
        ),
        out_specs=tuple(P() for _ in groups),
        check_vma=False,
    )
    return jax.jit(f)


class ShardedColumnEngine:
    """Drop-in for :class:`...stark.v1.openings.ColumnEngine` that computes
    every column's chunked commitment across a `jax.sharding.Mesh`."""

    def __init__(self, tc, mesh: Mesh, chunk_log2: int = params.COL_CHUNK_LOG2,
                 blocks=None):
        assert tc.n % (1 << chunk_log2) == 0, (
            "trace length must be a multiple of the column chunk"
        )
        self.tc = tc
        self.mesh = mesh
        self.chunk_log2 = chunk_log2
        self.blocks = blocks
        self.labels = all_labels(tc.tau)
        self.n_rows = tc.n
        self._croots: Dict[str, np.ndarray] = {}
        self._outer: Dict[str, MerkleTree] = {}

    def build_roots(self) -> List[ColumnRoot]:
        if not self._outer:
            self._build()
        return [ColumnRoot(lb, self._outer[lb].root()) for lb in self.labels]

    def _build(self) -> None:
        d = self.mesh.devices.size
        n = self.tc.n
        n_chunks = n >> self.chunk_log2
        # Row-wise needs d | n (else per-device row counts diverge inside
        # shard_map with an opaque error) AND whole chunks per device.
        if (
            self.blocks is not None
            and n % d == 0
            and (n // d) % (1 << self.chunk_log2) == 0
        ):
            self._build_rowwise()
            return
        groups: Dict[int, List[str]] = {}
        for lb in self.labels:
            groups.setdefault(len(_label_prefix(lb)), []).append(lb)
        for plen, lbs in groups.items():
            c = len(lbs)
            c_pad = -(-c // d) * d
            v = np.empty((c_pad, n), dtype=np.uint64)
            prefs = np.zeros((c_pad, 16), dtype=np.uint32)
            for i, lb in enumerate(lbs):
                v[i] = self.tc.column_by_label(lb)
                prefs[i] = BJ._prefix_words(_label_prefix(lb))
            v[c:] = v[:1]  # padding columns (results dropped)
            prefs[c:] = prefs[:1]
            from .prove_sharded import _gin

            lo = _gin(self.mesh, P(AXIS, None), (v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            hi = _gin(self.mesh, P(AXIS, None), (v >> np.uint64(32)).astype(np.uint32))
            f = _sharded_group_commit(self.mesh, plen, self.chunk_log2)
            from .distributed import sync_execute

            roots = np.asarray(
                jax.device_get(sync_execute(
                    f, lo, hi, _gin(self.mesh, P(AXIS, None), prefs),
                    tag="group_commit",
                ))
            )
            for i, lb in enumerate(lbs):
                croots = (
                    np.ascontiguousarray(roots[i].astype("<u4"))
                    .view(np.uint8)
                    .reshape(n_chunks, 32)
                )
                self._croots[lb] = croots
                self._outer[lb] = MerkleTree.from_leaves(croots)

    def _build_rowwise(self) -> None:
        """Row-sharded commit: derive + hash every column's local rows
        in-kernel from the raw logs; no host [C, n] materialization."""
        from .prove_sharded import raw_shard_args

        n = self.tc.n
        n_chunks = n >> self.chunk_log2
        d = self.mesh.devices.size
        order = {lb: i for i, lb in enumerate(self.labels)}
        gmap: Dict[int, List[str]] = {}
        for lb in self.labels:
            gmap.setdefault(len(_label_prefix(lb)), []).append(lb)
        groups = tuple(
            (plen, tuple(order[lb] for lb in lbs))
            for plen, lbs in sorted(gmap.items())
        )
        prefs = np.zeros((len(self.labels), 16), dtype=np.uint32)
        for lb, i in order.items():
            prefs[i] = BJ._prefix_words(_label_prefix(lb))
        f = _sharded_rowwise_commit(
            self.mesh, len(self.blocks), groups, self.chunk_log2
        )
        from .prove_sharded import _gin

        from .distributed import sync_execute

        args = raw_shard_args(self.mesh, d, self.blocks)
        outs = jax.device_get(sync_execute(
            f, *args, _gin(self.mesh, P(), prefs), tag="rowwise_commit"
        ))
        for (plen, idxs), roots in zip(groups, outs):
            roots = np.asarray(roots)  # [Cg, n_chunks, 8]
            for i, ci in enumerate(idxs):
                lb = self.labels[ci]
                croots = (
                    np.ascontiguousarray(roots[i].astype("<u4"))
                    .view(np.uint8)
                    .reshape(n_chunks, 32)
                )
                self._croots[lb] = croots
                self._outer[lb] = MerkleTree.from_leaves(croots)

    def open_batch(self, requests) -> List[Opening]:
        return [self.open(lb, r) for lb, r in requests]

    def open(self, label: str, row_idx: int) -> Opening:
        if not self._outer:
            self._build()
        chunk = 1 << self.chunk_log2
        ci = row_idx // chunk
        ii = row_idx - ci * chunk
        vals = self.tc.column_by_label(label)[ci * chunk : (ci + 1) * chunk]
        leaves = hash_field_leaves_labeled(G.to_le_bytes(vals), label)
        inner = MerkleTree.from_leaves(leaves)
        return Opening(
            value_le=G.to_le_bytes(vals[ii]).tobytes(),
            index=row_idx,
            chunk_index=ci,
            index_in_chunk=ii,
            chunk_root=inner.root(),
            path_in_chunk=inner.open(ii),
            path_to_chunk=self._outer[label].open(ci),
        )


class ShardedProverEngine(ShardedColumnEngine):
    """Column engine + the full sharded hot path (composition, DEEP coset
    LDE, FRI folds/trees) over the mesh. prove_v1 detects `deep_lde_fri`
    and routes the post-commitment pipeline through it."""

    def deep_lde_fri(self, alphas, mask_coeffs, blow_log2: int, shift: int,
                     z: int):
        from .prove_sharded import ShardedPipeline

        return ShardedPipeline(
            self.mesh, self.tc, blocks=self.blocks
        ).deep_lde_fri(alphas, mask_coeffs, blow_log2, shift, z)


def prove_v1_sharded(blocks, manifest_root: bytes, mesh: Mesh,
                     commitments_only: bool = False):
    """Full v1 proof with the hot path computed across the mesh: column
    commitments, AIR composition, the DEEP coset LDE (four-step NTTs with
    one all_to_all each), and all FRI folds + layer Merkle trees run as
    SPMD programs over `mesh`.

    Byte-identical to the single-chip `prove_v1` (same transcript schedule,
    same roots/paths/proof bytes; cross-tested in tests/test_parallel.py).
    `commitments_only=True` restores the round-1 behavior (only column
    commitments sharded) for comparison."""
    from ..stark.v1.columns import TraceColumns
    from ..stark.v1.prover import prove_v1

    tc = TraceColumns.build(blocks)
    cls = ShardedColumnEngine if commitments_only else ShardedProverEngine
    eng = cls(tc, mesh, blocks=blocks)
    return prove_v1(blocks, manifest_root, engine=eng, tc=tc)
